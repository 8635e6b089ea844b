"""ECAPA-TDNN speaker embedder (flax), for speaker-similarity (SIM) scoring.

The reference vendors a torch ECAPA-TDNN head over WavLM-large features
(`src/f5_tts/eval/ecapa_tdnn.py:1-330`, used by `utils_eval.py:379-418`). This is the
same architecture natively in JAX: TDNN entry conv -> 3 SE-Res2Net blocks with
dilations (2,3,4) -> multi-layer feature aggregation -> attentive statistics pooling
-> embedding projection. It runs over log-mel features (use `ops.MelSpectrogram` or
WavLM features when available); weights are pluggable — for parity scoring import a
trained checkpoint, or pass any `embed_fn` to `eval.scorers.eval_sim_dir`.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class TDNNBlock(nn.Module):
    channels: int
    kernel_size: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):  # [b, t, c]
        pad = (self.kernel_size - 1) * self.dilation // 2
        x = nn.Conv(self.channels, kernel_size=(self.kernel_size,),
                    kernel_dilation=(self.dilation,), padding=pad, name="conv")(x)
        x = nn.relu(x)
        return nn.BatchNorm(use_running_average=True, name="bn")(x)


class Res2NetBlock(nn.Module):
    channels: int
    scale: int = 8
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x):  # [b, t, c]
        width = self.channels // self.scale
        chunks = jnp.split(x, self.scale, axis=-1)
        outs = [chunks[0]]
        y = None
        for i in range(1, self.scale):
            inp = chunks[i] if y is None else chunks[i] + y
            y = TDNNBlock(width, self.kernel_size, self.dilation, name=f"tdnn_{i}")(inp)
            outs.append(y)
        return jnp.concatenate(outs, axis=-1)


class SEBlock(nn.Module):
    channels: int
    bottleneck: int = 128

    @nn.compact
    def __call__(self, x):  # [b, t, c]
        s = jnp.mean(x, axis=1, keepdims=True)
        s = nn.relu(nn.Dense(self.bottleneck, name="fc1")(s))
        s = nn.sigmoid(nn.Dense(self.channels, name="fc2")(s))
        return x * s


class SERes2NetBlock(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: int = 1
    scale: int = 8

    @nn.compact
    def __call__(self, x):
        residual = x
        x = TDNNBlock(self.channels, 1, name="tdnn1")(x)
        x = Res2NetBlock(self.channels, self.scale, self.kernel_size, self.dilation,
                         name="res2net")(x)
        x = TDNNBlock(self.channels, 1, name="tdnn2")(x)
        x = SEBlock(self.channels, name="se")(x)
        return x + residual


class AttentiveStatisticsPooling(nn.Module):
    channels: int
    attention_channels: int = 128

    @nn.compact
    def __call__(self, x):  # [b, t, c] -> [b, 2c]
        t = x.shape[1]
        mean = jnp.mean(x, axis=1, keepdims=True)
        std = jnp.std(x, axis=1, keepdims=True)
        ctx = jnp.concatenate(
            [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)], axis=-1
        )
        attn = jnp.tanh(nn.Conv(self.attention_channels, (1,), name="tdnn")(ctx))
        attn = nn.Conv(self.channels, (1,), name="conv")(attn)
        attn = jax.nn.softmax(attn, axis=1)
        mean = jnp.sum(attn * x, axis=1)
        var = jnp.sum(attn * jnp.square(x), axis=1) - jnp.square(mean)
        std = jnp.sqrt(jnp.clip(var, 1e-9, None))
        return jnp.concatenate([mean, std], axis=-1)


class ECAPA_TDNN(nn.Module):
    """Feature frames ``[b, t, feat_dim]`` -> speaker embedding ``[b, lin_neurons]``."""

    channels: int = 512
    emb_dim: int = 192  # lin_neurons

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        c = self.channels
        x = TDNNBlock(c, 5, name="layer1")(feats)
        x1 = SERes2NetBlock(c, 3, dilation=2, name="layer2")(x)
        x2 = SERes2NetBlock(c, 3, dilation=3, name="layer3")(x1)
        x3 = SERes2NetBlock(c, 3, dilation=4, name="layer4")(x2)
        # multi-layer feature aggregation
        x = jnp.concatenate([x1, x2, x3], axis=-1)
        x = nn.relu(nn.Conv(c * 3, (1,), name="mfa")(x))
        x = AttentiveStatisticsPooling(c * 3, name="asp")(x)
        x = nn.BatchNorm(use_running_average=True, name="asp_bn")(x[:, None, :])[:, 0]
        return nn.Dense(self.emb_dim, name="fc")(x)


def make_mel_embed_fn(params: Any | None = None, sample_rate: int = 16000):
    """Build an ``embed_fn(wav_path) -> np.ndarray`` over log-mel features.

    With ``params=None`` the embedder is randomly initialized — fine for pipeline
    smoke tests; pass trained params for meaningful SIM scores.
    """
    import numpy as np

    from eraxvif5tts_tpu.audio.io import read_wav
    from eraxvif5tts_tpu.audio.resample import resample
    from eraxvif5tts_tpu.ops.stft import MelSpectrogram

    mel_fn = MelSpectrogram(n_fft=512, hop_length=160, win_length=400,
                            n_mel_channels=80, target_sample_rate=sample_rate)
    model = ECAPA_TDNN()
    state = {"params": params} if params is not None else None

    mel_jit = jax.jit(mel_fn.__call__)
    apply_jit = jax.jit(lambda variables, feats: model.apply(variables, feats))

    def embed_fn(wav_path: str):
        nonlocal state
        wav, sr = read_wav(wav_path)
        wav = wav.mean(axis=0)
        if sr != sample_rate:
            wav = resample(wav, sr, sample_rate)
        feats = mel_jit(jnp.asarray(wav[None])).swapaxes(1, 2)  # [1, t, 80]
        if state is None:
            variables = jax.jit(model.init)(jax.random.key(0), feats)
            state = {"params": variables["params"],
                     "batch_stats": variables.get("batch_stats", {})}
        variables = {"params": state["params"]}
        if state.get("batch_stats"):
            variables["batch_stats"] = state["batch_stats"]
        emb = apply_jit(variables, feats)
        return np.asarray(emb[0])

    return embed_fn
