"""Phoneme duration predictor.

Parity with reference `src/f5_tts/model/duration_predictor.py:4-68`: phoneme-id
embedding -> 2x (conv1d k3 -> ReLU -> GroupNorm(1) -> dropout) -> conv1d k1 -> one
log-duration per token, masked. Instantiated as ``(vocab, 512, filter 512, kernel 3,
dropout 0.5)`` (reference `finetune_cli.py:351`). Total frames at inference =
``exp(logw).round().sum()`` (reference `src/infer/f5tts_wrapper.py:469-525`).

The checkpoint embeds its own ``phoneme_map`` (reference `trainer.py:1367-1377`).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def predictor_vocab_size(text_vocab_size: int) -> int:
    """One shared sizing rule for the predictor's embedding table (round 2
    shipped `vocab_size+1` in the finetune CLI vs `teacher_vocab+2` in the
    distill CLI — resuming across the two silently truncated): pad row 0 +
    ids 1..n + one spare row."""
    return text_vocab_size + 2


class DurationPredictor(nn.Module):
    vocab_size: int
    d_model: int = 512
    d_filter: int = 512
    kernel_size: int = 3
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self,
        phoneme_ids: jnp.ndarray,  # [b, nt] int; 0 = pad
        mask: Optional[jnp.ndarray] = None,  # [b, nt] True = valid
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x = nn.Embed(self.vocab_size, self.d_model, name="embed")(phoneme_ids)
        if mask is not None:
            x = jnp.where(mask[..., None], x, 0.0)
        for i, features in enumerate((self.d_filter, self.d_filter)):
            x = nn.Conv(features, kernel_size=(self.kernel_size,),
                        padding=self.kernel_size // 2, name=f"conv_{i}")(x)
            x = nn.relu(x)
            # GroupNorm with a single group == LayerNorm over channels with affine
            x = nn.GroupNorm(num_groups=1, name=f"norm_{i}")(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        logw = nn.Conv(1, kernel_size=(1,), name="proj")(x)[..., 0]  # [b, nt]
        if mask is not None:
            logw = jnp.where(mask, logw, 0.0)
        return logw


def duration_params_from_torch(sd: dict[str, np.ndarray]) -> tuple[dict, dict]:
    """Torch duration-predictor checkpoint -> (flax params, phoneme_map).

    Torch layout: ``embedding.weight``, ``conv_layers.{0,1}.{0,2}.*`` (conv, norm),
    ``proj.weight/bias`` — accepts a few historical layouts.
    """
    phoneme_map = sd.pop("phoneme_map", {}) if isinstance(sd.get("phoneme_map"), dict) else {}
    if "model_state_dict" in sd:
        sd = sd["model_state_dict"]

    def conv_t(w):  # torch [out, in, k] -> flax [k, in, out]
        return np.ascontiguousarray(np.asarray(w).transpose(2, 1, 0))

    params: dict = {}
    # Embedding table: the reference embeds `id + 1` into a (vocab+1)-row table
    # (`duration_predictor.py:9,29`); this build looks ids up directly, so the
    # torch row 0 (never addressed — phoneme ids are >= 0) is dropped on import.
    if "text_embed.weight" in sd:
        params["embed"] = {"embedding": np.asarray(sd["text_embed.weight"])[1:]}
    else:
        for k in ("embedding.weight", "embed.weight"):  # legacy unshifted layouts
            if k in sd:
                params["embed"] = {"embedding": np.asarray(sd[k])}
                break
    # conv stacks: reference names are conv_1/conv_2 + norm_1/norm_2
    # (`duration_predictor.py:18-22`); aliases for other historical layouts
    for i in range(2):
        for torch_name in (f"conv_{i+1}", f"conv_layers.{i}.0", f"convs.{i}.conv"):
            wk, bk = f"{torch_name}.weight", f"{torch_name}.bias"
            if wk in sd:
                params[f"conv_{i}"] = {"kernel": conv_t(sd[wk]), "bias": np.asarray(sd[bk])}
                break
        for torch_name in (f"norm_{i+1}", f"conv_layers.{i}.2", f"norms.{i}"):
            wk, bk = f"{torch_name}.weight", f"{torch_name}.bias"
            if wk in sd:
                params[f"norm_{i}"] = {"scale": np.asarray(sd[wk]), "bias": np.asarray(sd[bk])}
                break
    for torch_name in ("proj", "linear", "out_proj"):
        wk = f"{torch_name}.weight"
        if wk in sd:
            w = np.asarray(sd[wk])
            if w.ndim == 3:
                params["proj"] = {"kernel": conv_t(w), "bias": np.asarray(sd[f"{torch_name}.bias"])}
            else:  # linear [1, d]
                params["proj"] = {
                    "kernel": w.T[:, None, :] if w.ndim == 2 else w,
                    "bias": np.asarray(sd[f"{torch_name}.bias"]),
                }
            break
    return params, phoneme_map


def duration_params_to_torch(params: dict) -> dict[str, np.ndarray]:
    """Flax duration-predictor params -> the reference torch key layout
    (``embedding.weight``, ``conv_layers.{i}.{0,2}.*``, ``proj.*``) so a predictor
    trained here round-trips through ``load_duration_predictor`` and the reference
    wrappers (`src/infer/f5tts_wrapper.py:469-525`)."""

    def conv_t(w):  # flax [k, in, out] -> torch [out, in, k]
        return np.ascontiguousarray(np.asarray(w).transpose(2, 1, 0))

    emb = np.asarray(params["embed"]["embedding"])
    # prepend the torch filler row 0 (see duration_params_from_torch)
    sd: dict[str, np.ndarray] = {
        "text_embed.weight": np.concatenate([np.zeros((1, emb.shape[1]), emb.dtype), emb]),
    }
    for i in range(2):
        sd[f"conv_{i+1}.weight"] = conv_t(params[f"conv_{i}"]["kernel"])
        sd[f"conv_{i+1}.bias"] = np.asarray(params[f"conv_{i}"]["bias"])
        sd[f"norm_{i+1}.weight"] = np.asarray(params[f"norm_{i}"]["scale"])
        sd[f"norm_{i+1}.bias"] = np.asarray(params[f"norm_{i}"]["bias"])
    sd["proj.weight"] = conv_t(params["proj"]["kernel"])
    sd["proj.bias"] = np.asarray(params["proj"]["bias"])
    return sd


def save_duration_predictor(path: str, params: dict, phoneme_map: dict[str, int],
                            update: int = 0, duration_loss_weight: float = 0.1) -> str:
    """Write the reference-format predictor checkpoint with embedded phoneme_map
    (reference `trainer.py:1367-1377`)."""
    import torch

    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in
          duration_params_to_torch(params).items()}
    torch.save({
        "duration_predictor": sd,
        "update": update,
        "duration_loss_weight": duration_loss_weight,
        "phoneme_map": dict(phoneme_map),
    }, path)
    return path


def load_duration_predictor(ckpt_path: str):
    """Load a duration-predictor checkpoint with embedded phoneme_map."""
    import torch

    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    phoneme_map = raw.get("phoneme_map", {}) if isinstance(raw, dict) else {}
    sd = raw
    if isinstance(raw, dict):
        # reference layout (`trainer.py:1367-1377`) nests under 'duration_predictor'
        sd = raw.get("duration_predictor", raw.get("model_state_dict", raw))
    sd_np = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    params, _ = duration_params_from_torch(sd_np)
    vocab, d_model = params["embed"]["embedding"].shape
    k, _, d_filter = params["conv_0"]["kernel"].shape
    model = DurationPredictor(vocab_size=vocab, d_model=d_model, d_filter=d_filter,
                              kernel_size=k)
    return model, params, phoneme_map


def predict_duration_frames(model: DurationPredictor, params: dict,
                            phoneme_map: dict[str, int], text: str) -> int:
    """Text -> total predicted mel frames (`src/infer/f5tts_wrapper.py:469-525`)."""
    try:
        from eraxvif5tts_tpu.text.phoneme import text_to_phoneme_indices

        ids = text_to_phoneme_indices(text, phoneme_map)
    except Exception:
        return 0
    if not ids:
        return 0
    arr = jnp.asarray(np.asarray(ids, np.int32)[None])
    mask = arr > 0
    logw = jax.jit(model.apply)({"params": params}, arr, mask)
    frames = jnp.sum(jnp.round(jnp.exp(logw)) * mask)
    return int(frames)
