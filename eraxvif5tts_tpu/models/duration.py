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
    key_map = {
        "embedding.weight": ("embed", "embedding", None),
        "embed.weight": ("embed", "embedding", None),
    }
    for k, v in sd.items():
        v = np.asarray(v)
        if k in key_map:
            mod, name, _ = key_map[k]
            params.setdefault(mod, {})[name] = v
        elif ".0.weight" in k or k.startswith("conv"):
            pass  # handled below
    # conv stacks: try the canonical names
    for i in range(2):
        for torch_name in (f"conv_layers.{i}.0", f"convs.{i}.conv", f"conv{i+1}"):
            wk, bk = f"{torch_name}.weight", f"{torch_name}.bias"
            if wk in sd:
                params[f"conv_{i}"] = {"kernel": conv_t(sd[wk]), "bias": np.asarray(sd[bk])}
                break
        for torch_name in (f"conv_layers.{i}.2", f"norms.{i}", f"norm{i+1}"):
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


def load_duration_predictor(ckpt_path: str):
    """Load a duration-predictor checkpoint with embedded phoneme_map."""
    import torch

    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    phoneme_map = raw.get("phoneme_map", {}) if isinstance(raw, dict) else {}
    sd = raw.get("model_state_dict", raw) if isinstance(raw, dict) else raw
    sd_np = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    params, _ = duration_params_from_torch(sd_np)
    vocab = params["embed"]["embedding"].shape[0]
    model = DurationPredictor(vocab_size=vocab)
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
