"""ECAPA-TDNN speaker embedder for speaker-similarity (SIM) scoring — the exact
architecture of the reference's vendored UniSpeech model
(`src/f5_tts/eval/ecapa_tdnn.py:1-330`, used by `utils_eval.py:379-418` as
``ECAPA_TDNN_SMALL(feat_dim=1024, emb_dim=256, feat_type='wavlm_large')``), as pure
jittable functions over an imported parameter tree:

feats [b, t, feat_dim] -> instance-norm -> Conv1dReluBn(k5) -> 3x SE-Res2Block
(k3, dilations 2/3/4, scale 8) -> concat -> 1x1 conv+relu (1536) -> attentive
statistics pooling -> BatchNorm -> Linear(emb_dim).

``ecapa_params_from_torch`` maps the reference/UniSpeech checkpoint
(``state_dict['model']``) onto this tree, so SIM numbers are comparable with the
reference harness. The WavLM-large feature extractor itself is an external torch
model (zero-egress environments can score over log-fbank features instead — the
conv stack accepts any ``feat_dim``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5


def _conv1d(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
            dilation: int = 1) -> jnp.ndarray:
    """x [b, t, c_in], kernel [k, c_in, c_out], SAME padding."""
    k = kernel.shape[0]
    pad = dilation * (k - 1) // 2
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=((pad, pad),),
        rhs_dilation=(dilation,), dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return out + bias


def _bn(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """Eval-mode BatchNorm1d with imported running stats; channel-last."""
    inv = jax.lax.rsqrt(p["var"] + BN_EPS)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def _conv_relu_bn(x, p, dilation: int = 1):
    return _bn(jax.nn.relu(_conv1d(x, p["conv_kernel"], p["conv_bias"], dilation)),
               p["bn"])


def _res2_conv(x, p, scale: int, dilation: int):
    """Res2Conv1dReluBn (`ecapa_tdnn.py:16-52`): scale-1 convs over cumulative
    chunks; the LAST chunk passes through untouched and is appended last."""
    width = x.shape[-1] // scale
    chunks = jnp.split(x, scale, axis=-1)
    outs = []
    sp = None
    for i in range(scale - 1):
        sp = chunks[i] if i == 0 else sp + chunks[i]
        sp = _conv1d(sp, p["convs"][i]["kernel"], p["convs"][i]["bias"], dilation)
        sp = _bn(jax.nn.relu(sp), p["bns"][i])
        outs.append(sp)
    outs.append(chunks[scale - 1])
    del width
    return jnp.concatenate(outs, axis=-1)


def _se_connect(x, p):
    s = jnp.mean(x, axis=1)  # [b, c]
    s = jax.nn.relu(s @ p["linear1_kernel"] + p["linear1_bias"])
    s = jax.nn.sigmoid(s @ p["linear2_kernel"] + p["linear2_bias"])
    return x * s[:, None, :]


def _se_res2_block(x, p, scale: int, dilation: int):
    residual = x
    if "shortcut" in p:
        residual = _conv1d(x, p["shortcut"]["kernel"], p["shortcut"]["bias"])
    x = _conv_relu_bn(x, p["conv1"])
    x = _res2_conv(x, p["res2"], scale, dilation)
    x = _conv_relu_bn(x, p["conv2"])
    x = _se_connect(x, p["se"])
    return x + residual


def _attentive_stats_pool(x, p):
    """(`ecapa_tdnn.py:133-160`, global_context_att=False)."""
    alpha = jnp.tanh(_conv1d(x, p["linear1_kernel"], p["linear1_bias"]))
    alpha = jax.nn.softmax(_conv1d(alpha, p["linear2_kernel"], p["linear2_bias"]),
                           axis=1)
    mean = jnp.sum(alpha * x, axis=1)
    residuals = jnp.sum(alpha * jnp.square(x), axis=1) - jnp.square(mean)
    std = jnp.sqrt(jnp.clip(residuals, 1e-9, None))
    return jnp.concatenate([mean, std], axis=-1)


def _instance_norm(x):
    """InstanceNorm1d(affine=False): per-(sample, channel) normalization over
    time (`ecapa_tdnn.py:214`)."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + BN_EPS)


SCALE = 8
DILATIONS = (2, 3, 4)


def ecapa_embed(params: dict, feats: jnp.ndarray) -> jnp.ndarray:
    """Feature frames ``[b, t, feat_dim]`` -> speaker embedding ``[b, emb_dim]``."""
    x = _instance_norm(feats)
    out1 = _conv_relu_bn(x, params["layer1"])
    out2 = _se_res2_block(out1, params["layer2"], SCALE, DILATIONS[0])
    out3 = _se_res2_block(out2, params["layer3"], SCALE, DILATIONS[1])
    out4 = _se_res2_block(out3, params["layer4"], SCALE, DILATIONS[2])
    x = jnp.concatenate([out2, out3, out4], axis=-1)
    x = jax.nn.relu(_conv1d(x, params["conv_kernel"], params["conv_bias"]))
    x = _attentive_stats_pool(x, params["pooling"])
    x = _bn(x, params["bn"])
    return x @ params["linear_kernel"] + params["linear_bias"]


# ---------------------------------------------------------------------------
# torch importer (reference/UniSpeech checkpoint layout)


def _ck(w):  # torch conv [out, in, k] -> [k, in, out]
    return np.ascontiguousarray(np.asarray(w).transpose(2, 1, 0))


def _bn_p(sd, prefix):
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }


def _conv_relu_bn_p(sd, prefix):
    return {
        "conv_kernel": _ck(sd[f"{prefix}.conv.weight"]),
        "conv_bias": np.asarray(sd[f"{prefix}.conv.bias"]),
        "bn": _bn_p(sd, f"{prefix}.bn"),
    }


def ecapa_params_from_torch(sd: dict[str, Any]) -> dict:
    """Reference/UniSpeech ECAPA-TDNN state dict -> parameter tree for
    ``ecapa_embed``. Accepts the raw module state dict (``model.load_state_dict(
    state_dict['model'])`` layout, reference `utils_eval.py:384-385`); WavLM
    extractor weights (``feature_extract.*``) are ignored."""
    sd = {k: v for k, v in sd.items() if not k.startswith("feature_extract.")}
    params: dict[str, Any] = {
        "layer1": _conv_relu_bn_p(sd, "layer1"),
        "conv_kernel": _ck(sd["conv.weight"]),
        "conv_bias": np.asarray(sd["conv.bias"]),
        "pooling": {
            "linear1_kernel": _ck(sd["pooling.linear1.weight"]),
            "linear1_bias": np.asarray(sd["pooling.linear1.bias"]),
            "linear2_kernel": _ck(sd["pooling.linear2.weight"]),
            "linear2_bias": np.asarray(sd["pooling.linear2.bias"]),
        },
        "bn": _bn_p(sd, "bn"),
        "linear_kernel": np.ascontiguousarray(np.asarray(sd["linear.weight"]).T),
        "linear_bias": np.asarray(sd["linear.bias"]),
    }
    if "feature_weight" in sd:
        params["feature_weight"] = np.asarray(sd["feature_weight"])
    for name in ("layer2", "layer3", "layer4"):
        block = {
            "conv1": _conv_relu_bn_p(sd, f"{name}.Conv1dReluBn1"),
            "conv2": _conv_relu_bn_p(sd, f"{name}.Conv1dReluBn2"),
            "se": {
                "linear1_kernel": np.ascontiguousarray(
                    np.asarray(sd[f"{name}.SE_Connect.linear1.weight"]).T),
                "linear1_bias": np.asarray(sd[f"{name}.SE_Connect.linear1.bias"]),
                "linear2_kernel": np.ascontiguousarray(
                    np.asarray(sd[f"{name}.SE_Connect.linear2.weight"]).T),
                "linear2_bias": np.asarray(sd[f"{name}.SE_Connect.linear2.bias"]),
            },
            "res2": {
                "convs": [
                    {"kernel": _ck(sd[f"{name}.Res2Conv1dReluBn.convs.{i}.weight"]),
                     "bias": np.asarray(sd[f"{name}.Res2Conv1dReluBn.convs.{i}.bias"])}
                    for i in range(SCALE - 1)
                ],
                "bns": [
                    _bn_p(sd, f"{name}.Res2Conv1dReluBn.bns.{i}")
                    for i in range(SCALE - 1)
                ],
            },
        }
        if f"{name}.shortcut.weight" in sd:
            block["shortcut"] = {"kernel": _ck(sd[f"{name}.shortcut.weight"]),
                                 "bias": np.asarray(sd[f"{name}.shortcut.bias"])}
        params[name] = block
    return params


def load_ecapa_checkpoint(ckpt_path: str) -> dict:
    """Load the UniSpeech WavLM-ECAPA checkpoint file (reference
    `utils_eval.py:384-385`: ``torch.load(...)['model']``)."""
    import torch

    import jax

    raw = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    sd = raw.get("model", raw) if isinstance(raw, dict) else raw
    # device_put once: numpy leaves would re-upload per jitted scoring call
    return jax.device_put(ecapa_params_from_torch(
        {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    ))


def init_random_params(rng: np.random.Generator, feat_dim: int = 1024,
                       channels: int = 512, emb_dim: int = 256) -> dict:
    """Random params in the torch layout run through the importer — for offline
    pipeline tests (shapes identical to the real checkpoint)."""
    sd: dict[str, np.ndarray] = {}

    def conv(prefix, cin, cout, k):
        sd[f"{prefix}.weight"] = rng.standard_normal((cout, cin, k)).astype(np.float32) * 0.05
        sd[f"{prefix}.bias"] = np.zeros(cout, np.float32)

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = np.ones(c, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_var"] = np.ones(c, np.float32)

    def crb(prefix, cin, cout, k):
        conv(f"{prefix}.conv", cin, cout, k)
        bn(f"{prefix}.bn", cout)

    crb("layer1", feat_dim, channels, 5)
    width = channels // SCALE
    for name in ("layer2", "layer3", "layer4"):
        crb(f"{name}.Conv1dReluBn1", channels, channels, 1)
        crb(f"{name}.Conv1dReluBn2", channels, channels, 1)
        for i in range(SCALE - 1):
            conv(f"{name}.Res2Conv1dReluBn.convs.{i}", width, width, 3)
            bn(f"{name}.Res2Conv1dReluBn.bns.{i}", width)
        sd[f"{name}.SE_Connect.linear1.weight"] = (
            rng.standard_normal((128, channels)).astype(np.float32) * 0.05)
        sd[f"{name}.SE_Connect.linear1.bias"] = np.zeros(128, np.float32)
        sd[f"{name}.SE_Connect.linear2.weight"] = (
            rng.standard_normal((channels, 128)).astype(np.float32) * 0.05)
        sd[f"{name}.SE_Connect.linear2.bias"] = np.zeros(channels, np.float32)
    cat = channels * 3
    pooled = 1536 if channels == 512 else cat  # reference hardcodes 1536 at 512ch
    conv("conv", cat, pooled, 1)
    conv("pooling.linear1", pooled, 128, 1)
    conv("pooling.linear2", 128, pooled, 1)
    bn("bn", pooled * 2)
    sd["linear.weight"] = rng.standard_normal((emb_dim, pooled * 2)).astype(np.float32) * 0.05
    sd["linear.bias"] = np.zeros(emb_dim, np.float32)
    return ecapa_params_from_torch(sd)


def make_mel_embed_fn(params: Optional[dict] = None, ckpt_path: Optional[str] = None,
                      sample_rate: int = 16000, n_mels: int = 80) -> Callable:
    """Build an ``embed_fn(wav_path) -> np.ndarray`` over log-mel (fbank) features.

    The reference scores over WavLM-large hidden states (feat_dim 1024) — that
    extractor is an external torch model; this offline path runs the identical
    ECAPA head over log-fbank features. Pass ``ckpt_path`` (UniSpeech layout) or a
    ``params`` tree; with neither, weights are random (pipeline smoke tests only).
    """
    from eraxvif5tts_tpu.audio.io import read_wav
    from eraxvif5tts_tpu.audio.resample import resample
    from eraxvif5tts_tpu.ops.stft import MelSpectrogram

    if ckpt_path is not None:
        params = load_ecapa_checkpoint(ckpt_path)
    if params is None:
        params = init_random_params(np.random.default_rng(0), feat_dim=n_mels)

    mel_fn = MelSpectrogram(n_fft=512, hop_length=160, win_length=400,
                            n_mel_channels=n_mels, target_sample_rate=sample_rate)
    mel_jit = jax.jit(mel_fn.__call__)
    embed_jit = jax.jit(ecapa_embed)

    def embed_fn(wav_path: str):
        wav, sr = read_wav(wav_path)
        wav = wav.mean(axis=0)
        if sr != sample_rate:
            wav = resample(wav, sr, sample_rate)
        feats = mel_jit(jnp.asarray(wav[None])).swapaxes(1, 2)  # [1, t, n_mels]
        return np.asarray(embed_jit(params, feats)[0])

    return embed_fn
