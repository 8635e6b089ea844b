"""Reference-checkpoint <-> JAX pytree conversion.

The reference stores DiT weights under the flat key schema
``transformer.transformer_blocks.N.*`` (documented by the pruner's regexes,
reference `src/model_pruning/excellent_definitive-f5tts-pruner.py:240-250`), with EMA
checkpoints prefixed ``ema_model.`` plus ``initted``/``step`` metadata
(`src/f5_tts/infer/utils_infer.py:184-226`). This module imports those checkpoints
(.pt or .safetensors) into flax param trees — and exports back, so checkpoints stay
interchangeable with the reference ecosystem.

Weight layout transforms:
- torch ``nn.Linear``  [out, in]          -> flax Dense kernel [in, out]
- torch ``nn.Conv1d``  [out, in/groups, k] -> flax/lax kernel  [k, in/groups, out]
- torch ``nn.Embedding`` / norms / GRN     -> unchanged (LayerNorm weight -> scale)
"""

from __future__ import annotations

import re
from typing import Callable

import numpy as np

# ---------------------------------------------------------------------------
# State-dict IO


def load_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a ``.pt`` / ``.safetensors`` checkpoint into a flat numpy dict."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    # training checkpoints nest the EMA / model dicts (`trainer.py:524-530`)
    if isinstance(raw, dict) and not any(hasattr(v, "numpy") for v in raw.values()):
        for key in ("ema_model_state_dict", "model_state_dict", "state_dict"):
            if key in raw:
                raw = raw[key]
                break
    out = {}
    for k, v in raw.items():
        out[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
    return out


_META_KEYS = {"initted", "step"}
_BUFFER_PATTERNS = (
    re.compile(r"(^|\.)mel_spec\."),
    re.compile(r"(^|\.)rotary_embed\.inv_freq$"),
    re.compile(r"(^|\.)freqs_cis$"),
)


def normalize_reference_state_dict(
    sd: dict[str, np.ndarray], use_ema: bool = True
) -> dict[str, np.ndarray]:
    """Strip EMA/model prefixes, metadata counters, and non-param buffers.

    Mirrors `utils_infer.py:203-217` (EMA key surgery + mel-buffer back-compat
    deletion) and the pruner's prefix cleaning (`...pruner.py:122-163`).
    """
    has_ema = any(k.startswith("ema_model.") for k in sd)
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k in _META_KEYS:
            continue
        if has_ema:
            if use_ema:
                if not k.startswith("ema_model."):
                    continue
                k = k[len("ema_model."):]
            else:
                if k.startswith("ema_model."):
                    continue
        if k.startswith("model."):
            k = k[len("model."):]
        if any(p.search(k) for p in _BUFFER_PATTERNS):
            continue
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# Transforms


def _t_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _t_conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 1, 0))


def _t_id(w: np.ndarray) -> np.ndarray:
    return w


# Each entry: (torch key suffix, flax path tuple, forward transform, inverse transform)
Rule = tuple[str, tuple[str, ...], Callable, Callable]


def _convnext_rules(torch_prefix: str, flax_prefix: tuple[str, ...], v2: bool) -> list[Rule]:
    fp = flax_prefix
    rules: list[Rule] = [
        (f"{torch_prefix}.dwconv.weight", fp + ("dwconv_kernel",), _t_conv, _t_conv),
        (f"{torch_prefix}.dwconv.bias", fp + ("dwconv_bias",), _t_id, _t_id),
        (f"{torch_prefix}.norm.weight", fp + ("norm", "scale"), _t_id, _t_id),
        (f"{torch_prefix}.norm.bias", fp + ("norm", "bias"), _t_id, _t_id),
        (f"{torch_prefix}.pwconv1.weight", fp + ("pwconv1", "kernel"), _t_linear, _t_linear),
        (f"{torch_prefix}.pwconv1.bias", fp + ("pwconv1", "bias"), _t_id, _t_id),
        (f"{torch_prefix}.pwconv2.weight", fp + ("pwconv2", "kernel"), _t_linear, _t_linear),
        (f"{torch_prefix}.pwconv2.bias", fp + ("pwconv2", "bias"), _t_id, _t_id),
    ]
    if v2:
        rules += [
            (f"{torch_prefix}.grn.gamma", fp + ("grn", "gamma"), _t_id, _t_id),
            (f"{torch_prefix}.grn.beta", fp + ("grn", "beta"), _t_id, _t_id),
        ]
    else:
        rules += [(f"{torch_prefix}.gamma", fp + ("gamma",), _t_id, _t_id)]
    return rules


def dit_rules(depth: int, conv_layers: int, qk_norm: bool = False,
              long_skip: bool = False) -> list[Rule]:
    """Key map for the DiT backbone (torch side WITHOUT the ``transformer.`` prefix)."""
    rules: list[Rule] = [
        ("time_embed.time_mlp.0.weight", ("time_embed", "mlp_in", "kernel"), _t_linear, _t_linear),
        ("time_embed.time_mlp.0.bias", ("time_embed", "mlp_in", "bias"), _t_id, _t_id),
        ("time_embed.time_mlp.2.weight", ("time_embed", "mlp_out", "kernel"), _t_linear, _t_linear),
        ("time_embed.time_mlp.2.bias", ("time_embed", "mlp_out", "bias"), _t_id, _t_id),
        ("text_embed.text_embed.weight", ("text_embed", "embed", "embedding"), _t_id, _t_id),
        ("input_embed.proj.weight", ("input_embed", "proj", "kernel"), _t_linear, _t_linear),
        ("input_embed.proj.bias", ("input_embed", "proj", "bias"), _t_id, _t_id),
        ("input_embed.conv_pos_embed.conv1d.0.weight",
         ("input_embed", "conv_pos_embed", "conv1", "kernel"), _t_conv, _t_conv),
        ("input_embed.conv_pos_embed.conv1d.0.bias",
         ("input_embed", "conv_pos_embed", "conv1", "bias"), _t_id, _t_id),
        ("input_embed.conv_pos_embed.conv1d.2.weight",
         ("input_embed", "conv_pos_embed", "conv2", "kernel"), _t_conv, _t_conv),
        ("input_embed.conv_pos_embed.conv1d.2.bias",
         ("input_embed", "conv_pos_embed", "conv2", "bias"), _t_id, _t_id),
        ("norm_out.linear.weight", ("norm_out", "linear", "kernel"), _t_linear, _t_linear),
        ("norm_out.linear.bias", ("norm_out", "linear", "bias"), _t_id, _t_id),
        ("proj_out.weight", ("proj_out", "kernel"), _t_linear, _t_linear),
        ("proj_out.bias", ("proj_out", "bias"), _t_id, _t_id),
    ]
    for i in range(conv_layers):
        rules += _convnext_rules(
            f"text_embed.text_blocks.{i}", ("text_embed", f"conv_{i}"), v2=True
        )
    for i in range(depth):
        tb = f"transformer_blocks.{i}"
        blk = f"block_{i}"
        rules += [
            (f"{tb}.attn_norm.linear.weight", (blk, "attn_norm", "linear", "kernel"), _t_linear, _t_linear),
            (f"{tb}.attn_norm.linear.bias", (blk, "attn_norm", "linear", "bias"), _t_id, _t_id),
            (f"{tb}.attn.to_q.weight", (blk, "attn", "to_q", "kernel"), _t_linear, _t_linear),
            (f"{tb}.attn.to_q.bias", (blk, "attn", "to_q", "bias"), _t_id, _t_id),
            (f"{tb}.attn.to_k.weight", (blk, "attn", "to_k", "kernel"), _t_linear, _t_linear),
            (f"{tb}.attn.to_k.bias", (blk, "attn", "to_k", "bias"), _t_id, _t_id),
            (f"{tb}.attn.to_v.weight", (blk, "attn", "to_v", "kernel"), _t_linear, _t_linear),
            (f"{tb}.attn.to_v.bias", (blk, "attn", "to_v", "bias"), _t_id, _t_id),
            (f"{tb}.attn.to_out.0.weight", (blk, "attn", "to_out", "kernel"), _t_linear, _t_linear),
            (f"{tb}.attn.to_out.0.bias", (blk, "attn", "to_out", "bias"), _t_id, _t_id),
            (f"{tb}.ff.ff.0.0.weight", (blk, "ff", "project_in", "kernel"), _t_linear, _t_linear),
            (f"{tb}.ff.ff.0.0.bias", (blk, "ff", "project_in", "bias"), _t_id, _t_id),
            (f"{tb}.ff.ff.2.weight", (blk, "ff", "project_out", "kernel"), _t_linear, _t_linear),
            (f"{tb}.ff.ff.2.bias", (blk, "ff", "project_out", "bias"), _t_id, _t_id),
        ]
        if qk_norm:
            rules += [
                (f"{tb}.attn.q_norm.weight", (blk, "attn", "q_norm", "weight"), _t_id, _t_id),
                (f"{tb}.attn.k_norm.weight", (blk, "attn", "k_norm", "weight"), _t_id, _t_id),
            ]
    if long_skip:
        rules.append(
            ("long_skip_connection.weight", ("long_skip", "kernel"), _t_linear, _t_linear)
        )
    return rules


def unett_rules(depth: int, conv_layers: int, qk_norm: bool = False,
                skip_connect_type: str = "concat") -> list[Rule]:
    """Key map for the UNetT backbone (reference `backbones/unett.py:106-250`;
    torch layers are ``layers.{i}.{0..4}`` = [skip_proj, attn_norm, attn, ff_norm, ff])."""
    rules: list[Rule] = [
        ("time_embed.time_mlp.0.weight", ("time_embed", "mlp_in", "kernel"), _t_linear, _t_linear),
        ("time_embed.time_mlp.0.bias", ("time_embed", "mlp_in", "bias"), _t_id, _t_id),
        ("time_embed.time_mlp.2.weight", ("time_embed", "mlp_out", "kernel"), _t_linear, _t_linear),
        ("time_embed.time_mlp.2.bias", ("time_embed", "mlp_out", "bias"), _t_id, _t_id),
        ("text_embed.text_embed.weight", ("text_embed", "embed", "embedding"), _t_id, _t_id),
        ("input_embed.proj.weight", ("input_embed", "proj", "kernel"), _t_linear, _t_linear),
        ("input_embed.proj.bias", ("input_embed", "proj", "bias"), _t_id, _t_id),
        ("input_embed.conv_pos_embed.conv1d.0.weight",
         ("input_embed", "conv_pos_embed", "conv1", "kernel"), _t_conv, _t_conv),
        ("input_embed.conv_pos_embed.conv1d.0.bias",
         ("input_embed", "conv_pos_embed", "conv1", "bias"), _t_id, _t_id),
        ("input_embed.conv_pos_embed.conv1d.2.weight",
         ("input_embed", "conv_pos_embed", "conv2", "kernel"), _t_conv, _t_conv),
        ("input_embed.conv_pos_embed.conv1d.2.bias",
         ("input_embed", "conv_pos_embed", "conv2", "bias"), _t_id, _t_id),
        ("norm_out.g", ("norm_out", "g"), _t_id, _t_id),
        ("proj_out.weight", ("proj_out", "kernel"), _t_linear, _t_linear),
        ("proj_out.bias", ("proj_out", "bias"), _t_id, _t_id),
    ]
    for i in range(conv_layers):
        rules += _convnext_rules(
            f"text_embed.text_blocks.{i}", ("text_embed", f"conv_{i}"), v2=True
        )
    half = depth // 2
    for i in range(depth):
        tb = f"layers.{i}"
        if skip_connect_type == "concat" and i >= half:
            rules.append((f"{tb}.0.weight", (f"skip_proj_{i}", "kernel"), _t_linear, _t_linear))
        rules += [
            (f"{tb}.1.g", (f"attn_norm_{i}", "g"), _t_id, _t_id),
            (f"{tb}.2.to_q.weight", (f"attn_{i}", "to_q", "kernel"), _t_linear, _t_linear),
            (f"{tb}.2.to_q.bias", (f"attn_{i}", "to_q", "bias"), _t_id, _t_id),
            (f"{tb}.2.to_k.weight", (f"attn_{i}", "to_k", "kernel"), _t_linear, _t_linear),
            (f"{tb}.2.to_k.bias", (f"attn_{i}", "to_k", "bias"), _t_id, _t_id),
            (f"{tb}.2.to_v.weight", (f"attn_{i}", "to_v", "kernel"), _t_linear, _t_linear),
            (f"{tb}.2.to_v.bias", (f"attn_{i}", "to_v", "bias"), _t_id, _t_id),
            (f"{tb}.2.to_out.0.weight", (f"attn_{i}", "to_out", "kernel"), _t_linear, _t_linear),
            (f"{tb}.2.to_out.0.bias", (f"attn_{i}", "to_out", "bias"), _t_id, _t_id),
            (f"{tb}.3.g", (f"ff_norm_{i}", "g"), _t_id, _t_id),
            (f"{tb}.4.ff.0.0.weight", (f"ff_{i}", "project_in", "kernel"), _t_linear, _t_linear),
            (f"{tb}.4.ff.0.0.bias", (f"ff_{i}", "project_in", "bias"), _t_id, _t_id),
            (f"{tb}.4.ff.2.weight", (f"ff_{i}", "project_out", "kernel"), _t_linear, _t_linear),
            (f"{tb}.4.ff.2.bias", (f"ff_{i}", "project_out", "bias"), _t_id, _t_id),
        ]
        if qk_norm:
            rules += [
                (f"{tb}.2.q_norm.weight", (f"attn_{i}", "q_norm", "weight"), _t_id, _t_id),
                (f"{tb}.2.k_norm.weight", (f"attn_{i}", "k_norm", "weight"), _t_id, _t_id),
            ]
    return rules


def mmdit_rules(depth: int, qk_norm: bool = False) -> list[Rule]:
    """Key map for the MMDiT backbone (reference `backbones/mmdit.py:85-189`)."""
    rules: list[Rule] = [
        ("time_embed.time_mlp.0.weight", ("time_embed", "mlp_in", "kernel"), _t_linear, _t_linear),
        ("time_embed.time_mlp.0.bias", ("time_embed", "mlp_in", "bias"), _t_id, _t_id),
        ("time_embed.time_mlp.2.weight", ("time_embed", "mlp_out", "kernel"), _t_linear, _t_linear),
        ("time_embed.time_mlp.2.bias", ("time_embed", "mlp_out", "bias"), _t_id, _t_id),
        ("text_embed.text_embed.weight", ("text_embed", "embed", "embedding"), _t_id, _t_id),
        ("audio_embed.linear.weight", ("audio_embed", "linear", "kernel"), _t_linear, _t_linear),
        ("audio_embed.linear.bias", ("audio_embed", "linear", "bias"), _t_id, _t_id),
        ("audio_embed.conv_pos_embed.conv1d.0.weight",
         ("audio_embed", "conv_pos_embed", "conv1", "kernel"), _t_conv, _t_conv),
        ("audio_embed.conv_pos_embed.conv1d.0.bias",
         ("audio_embed", "conv_pos_embed", "conv1", "bias"), _t_id, _t_id),
        ("audio_embed.conv_pos_embed.conv1d.2.weight",
         ("audio_embed", "conv_pos_embed", "conv2", "kernel"), _t_conv, _t_conv),
        ("audio_embed.conv_pos_embed.conv1d.2.bias",
         ("audio_embed", "conv_pos_embed", "conv2", "bias"), _t_id, _t_id),
        ("norm_out.linear.weight", ("norm_out", "linear", "kernel"), _t_linear, _t_linear),
        ("norm_out.linear.bias", ("norm_out", "linear", "bias"), _t_id, _t_id),
        ("proj_out.weight", ("proj_out", "kernel"), _t_linear, _t_linear),
        ("proj_out.bias", ("proj_out", "bias"), _t_id, _t_id),
    ]
    for i in range(depth):
        tb = f"transformer_blocks.{i}"
        blk = f"block_{i}"
        last = i == depth - 1
        rules += [
            (f"{tb}.attn_norm_c.linear.weight", (blk, "attn_norm_c", "linear", "kernel"), _t_linear, _t_linear),
            (f"{tb}.attn_norm_c.linear.bias", (blk, "attn_norm_c", "linear", "bias"), _t_id, _t_id),
            (f"{tb}.attn_norm_x.linear.weight", (blk, "attn_norm_x", "linear", "kernel"), _t_linear, _t_linear),
            (f"{tb}.attn_norm_x.linear.bias", (blk, "attn_norm_x", "linear", "bias"), _t_id, _t_id),
        ]
        for proj in ("to_q", "to_k", "to_v", "to_q_c", "to_k_c", "to_v_c"):
            rules += [
                (f"{tb}.attn.{proj}.weight", (blk, "attn", proj, "kernel"), _t_linear, _t_linear),
                (f"{tb}.attn.{proj}.bias", (blk, "attn", proj, "bias"), _t_id, _t_id),
            ]
        rules += [
            (f"{tb}.attn.to_out.0.weight", (blk, "attn", "to_out", "kernel"), _t_linear, _t_linear),
            (f"{tb}.attn.to_out.0.bias", (blk, "attn", "to_out", "bias"), _t_id, _t_id),
        ]
        if not last:
            rules += [
                (f"{tb}.attn.to_out_c.weight", (blk, "attn", "to_out_c", "kernel"), _t_linear, _t_linear),
                (f"{tb}.attn.to_out_c.bias", (blk, "attn", "to_out_c", "bias"), _t_id, _t_id),
                (f"{tb}.ff_c.ff.0.0.weight", (blk, "ff_c", "project_in", "kernel"), _t_linear, _t_linear),
                (f"{tb}.ff_c.ff.0.0.bias", (blk, "ff_c", "project_in", "bias"), _t_id, _t_id),
                (f"{tb}.ff_c.ff.2.weight", (blk, "ff_c", "project_out", "kernel"), _t_linear, _t_linear),
                (f"{tb}.ff_c.ff.2.bias", (blk, "ff_c", "project_out", "bias"), _t_id, _t_id),
            ]
        rules += [
            (f"{tb}.ff_x.ff.0.0.weight", (blk, "ff_x", "project_in", "kernel"), _t_linear, _t_linear),
            (f"{tb}.ff_x.ff.0.0.bias", (blk, "ff_x", "project_in", "bias"), _t_id, _t_id),
            (f"{tb}.ff_x.ff.2.weight", (blk, "ff_x", "project_out", "kernel"), _t_linear, _t_linear),
            (f"{tb}.ff_x.ff.2.bias", (blk, "ff_x", "project_out", "bias"), _t_id, _t_id),
        ]
        if qk_norm:
            for norm in ("q_norm", "k_norm", "c_q_norm", "c_k_norm"):
                rules.append(
                    (f"{tb}.attn.{norm}.weight", (blk, "attn", norm, "weight"), _t_id, _t_id)
                )
    return rules


def backbone_rules(backbone: str, depth: int, conv_layers: int = 4,
                   qk_norm: bool = False, long_skip: bool = False) -> list[Rule]:
    if backbone == "DiT":
        return dit_rules(depth, conv_layers, qk_norm=qk_norm, long_skip=long_skip)
    if backbone == "UNetT":
        return unett_rules(depth, conv_layers, qk_norm=qk_norm)
    if backbone == "MMDiT":
        return mmdit_rules(depth, qk_norm=qk_norm)
    raise ValueError(f"unknown backbone {backbone!r}")


def backbone_params_from_torch(sd: dict[str, np.ndarray], backbone: str, depth: int,
                               conv_layers: int = 4, qk_norm: bool = False,
                               long_skip: bool = False, strict: bool = True) -> dict:
    sd = normalize_reference_state_dict(sd)
    prefix = "transformer." if any(k.startswith("transformer.") for k in sd) else ""
    rules = backbone_rules(backbone, depth, conv_layers, qk_norm, long_skip)
    return _import_with_rules(sd, rules, torch_prefix=prefix, strict=strict)


def backbone_params_to_torch(params: dict, backbone: str, depth: int,
                             conv_layers: int = 4, qk_norm: bool = False,
                             long_skip: bool = False, with_prefix: bool = True) -> dict[str, np.ndarray]:
    if "blocks" in params:  # scan_layers stacked layout -> per-block schema
        params = unstack_block_params(params)
    if "down_blocks" in params:  # UNetT scan_layers layout -> flat schema
        params = unstack_unett_params(params)
    rules = backbone_rules(backbone, depth, conv_layers, qk_norm, long_skip)
    prefix = "transformer." if with_prefix else ""
    out: dict[str, np.ndarray] = {}
    for torch_key, flax_path, _, inv in rules:
        out[prefix + torch_key] = inv(np.asarray(_get_path(params, flax_path)))
    return out


def vocos_rules(num_layers: int = 8) -> list[Rule]:
    rules: list[Rule] = [
        ("backbone.embed.weight", ("embed_kernel",), _t_conv, _t_conv),
        ("backbone.embed.bias", ("embed_bias",), _t_id, _t_id),
        ("backbone.norm.weight", ("norm", "scale"), _t_id, _t_id),
        ("backbone.norm.bias", ("norm", "bias"), _t_id, _t_id),
        ("backbone.final_layer_norm.weight", ("final_layer_norm", "scale"), _t_id, _t_id),
        ("backbone.final_layer_norm.bias", ("final_layer_norm", "bias"), _t_id, _t_id),
        ("head.out.weight", ("head_out", "kernel"), _t_linear, _t_linear),
        ("head.out.bias", ("head_out", "bias"), _t_id, _t_id),
    ]
    for i in range(num_layers):
        rules += _convnext_rules(f"backbone.convnext.{i}", (f"convnext_{i}",), v2=False)
    return rules


# ---------------------------------------------------------------------------
# Apply rules


def _set_path(tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _get_path(tree: dict, path: tuple[str, ...]) -> np.ndarray:
    node = tree
    for p in path:
        node = node[p]
    return node


def _import_with_rules(
    sd: dict[str, np.ndarray], rules: list[Rule], torch_prefix: str = "", strict: bool = True
) -> dict:
    params: dict = {}
    missing = []
    for torch_key, flax_path, fwd, _ in rules:
        key = torch_prefix + torch_key
        if key not in sd:
            missing.append(key)
            continue
        _set_path(params, flax_path, fwd(np.asarray(sd[key])))
    if strict and missing:
        raise KeyError(f"{len(missing)} keys missing from checkpoint, e.g. {missing[:5]}")
    return params


def dit_params_from_torch(
    sd: dict[str, np.ndarray],
    depth: int,
    conv_layers: int = 4,
    qk_norm: bool = False,
    long_skip: bool = False,
    strict: bool = True,
) -> dict:
    """Flat reference state dict -> flax DiT param tree.

    Accepts keys with or without the CFM-level ``transformer.`` prefix.
    """
    sd = normalize_reference_state_dict(sd)
    prefix = "transformer." if any(k.startswith("transformer.") for k in sd) else ""
    rules = dit_rules(depth, conv_layers, qk_norm=qk_norm, long_skip=long_skip)
    return _import_with_rules(sd, rules, torch_prefix=prefix, strict=strict)


def dit_params_to_torch(
    params: dict,
    depth: int,
    conv_layers: int = 4,
    qk_norm: bool = False,
    long_skip: bool = False,
    with_prefix: bool = True,
) -> dict[str, np.ndarray]:
    """Flax DiT param tree -> reference-layout flat dict (for export / pruner IO)."""
    rules = dit_rules(depth, conv_layers, qk_norm=qk_norm, long_skip=long_skip)
    prefix = "transformer." if with_prefix else ""
    out: dict[str, np.ndarray] = {}
    for torch_key, flax_path, _, inv in rules:
        out[prefix + torch_key] = inv(np.asarray(_get_path(params, flax_path)))
    return out


def vocos_params_from_torch(sd: dict[str, np.ndarray], num_layers: int = 8,
                            strict: bool = True) -> dict:
    sd = {k: v for k, v in sd.items() if not k.startswith("feature_extractor.")}
    return _import_with_rules(sd, vocos_rules(num_layers), strict=strict)


def infer_depth(sd: dict[str, np.ndarray]) -> int:
    """Count transformer blocks present in a (normalized) state dict."""
    sd = normalize_reference_state_dict(sd)
    pat = re.compile(r"(?:transformer\.)?transformer_blocks\.(\d+)\.")
    layers = {int(m.group(1)) for k in sd if (m := pat.match(k))}
    return max(layers) + 1 if layers else 0


def infer_text_num_embeds(sd: dict[str, np.ndarray]) -> int:
    """Vocab rows from the text-embedding table (reference `get_embeding_size.py`);
    returns rows - 1 (the +1 filler row is added by the model)."""
    sd = normalize_reference_state_dict(sd)
    for k, v in sd.items():
        if k.endswith("text_embed.text_embed.weight"):
            return v.shape[0] - 1
    raise KeyError("text embedding table not found in checkpoint")


# ---------------------------------------------------------------------------
# scan-layers layout adapters
#
# The on-disk/param-exchange schema is ALWAYS per-block (`block_N/...`, mapping
# 1:1 to the reference's `transformer.transformer_blocks.N.*` keys, so the
# torch import/export above and the pruner's per-layer surgery never see a
# stacked tree). A DiT built with `arch.scan_layers=True` (models/dit.py) holds
# one stacked subtree `blocks/...` with a leading [depth] axis instead; these
# two functions convert between the layouts, loss-free in both directions.


def stack_block_params(params: dict, name: str = "blocks",
                       prefix: str = "block_") -> dict:
    """Per-block `block_N` subtrees -> one stacked `blocks` subtree [depth, ...]."""
    import jax
    import jax.numpy as jnp

    idxs = sorted(
        int(k[len(prefix):]) for k in params
        if k.startswith(prefix) and k[len(prefix):].isdigit()
    )
    if not idxs:
        raise ValueError(f"no '{prefix}N' subtrees found to stack")
    if idxs != list(range(len(idxs))):
        raise ValueError(f"non-contiguous block indices {idxs}")
    ordered = [params[f"{prefix}{i}"] for i in idxs]

    def _stack(*leaves):
        if all(isinstance(x, np.ndarray) for x in leaves):
            return np.stack(leaves, axis=0)
        return jnp.stack([jnp.asarray(x) for x in leaves], axis=0)

    out = {
        k: v for k, v in params.items()
        if not (k.startswith(prefix) and k[len(prefix):].isdigit())
    }
    out[name] = jax.tree.map(_stack, *ordered)
    return out


def unstack_block_params(params: dict, name: str = "blocks",
                         prefix: str = "block_") -> dict:
    """Stacked `blocks` subtree [depth, ...] -> per-block `block_N` subtrees."""
    import jax

    if name not in params:
        raise ValueError(f"no stacked '{name}' subtree found to unstack")
    stacked = params[name]
    depths = {x.shape[0] for x in jax.tree.leaves(stacked)}
    if len(depths) != 1:
        raise ValueError(f"inconsistent leading depth axes {sorted(depths)}")
    depth = depths.pop()
    out = {k: v for k, v in params.items() if k != name}
    for i in range(depth):
        out[f"{prefix}{i}"] = jax.tree.map(lambda x, i=i: x[i], stacked)
    return out


def adapt_block_layout(params: dict, scan_layers: bool, name: str = "blocks",
                       prefix: str = "block_") -> dict:
    """Return ``params`` in the layout the model expects; no-op if already there."""
    has_stacked = name in params
    has_per_block = any(
        k.startswith(prefix) and k[len(prefix):].isdigit() for k in params
    )
    if scan_layers:
        return stack_block_params(params, name, prefix) if has_per_block else params
    return unstack_block_params(params, name, prefix) if has_stacked else params


_UNETT_PARTS = ("attn", "attn_norm", "ff", "ff_norm")


def stack_unett_params(params: dict, name_down: str = "down_blocks",
                       name_up: str = "up_blocks") -> dict:
    """UNetT flat per-index subtrees (`attn_3`, `skip_proj_12`, ...) -> the two
    stacked scan subtrees (`down_blocks`, `up_blocks` with a leading
    [depth/2] axis). Inverse of :func:`unstack_unett_params`."""
    import jax
    import jax.numpy as jnp

    idxs = sorted(int(k[len("attn_"):]) for k in params
                  if k.startswith("attn_") and k[len("attn_"):].isdigit())
    if not idxs or idxs != list(range(len(idxs))):
        raise ValueError(f"unexpected UNetT layer indices {idxs}")
    depth = len(idxs)
    half = depth // 2

    def _stack(*leaves):
        if all(isinstance(x, np.ndarray) for x in leaves):
            return np.stack(leaves, axis=0)
        return jnp.stack([jnp.asarray(x) for x in leaves], axis=0)

    def layer(i: int) -> dict:
        sub = {p: params[f"{p}_{i}"] for p in _UNETT_PARTS}
        if f"skip_proj_{i}" in params:
            sub["skip_proj"] = params[f"skip_proj_{i}"]
        return sub

    consumed = {f"{p}_{i}" for p in _UNETT_PARTS + ("skip_proj",)
                for i in range(depth)}
    out = {k: v for k, v in params.items() if k not in consumed}
    out[name_down] = jax.tree.map(_stack, *[layer(i) for i in range(half)])
    out[name_up] = jax.tree.map(_stack, *[layer(i) for i in range(half, depth)])
    return out


def unstack_unett_params(params: dict, name_down: str = "down_blocks",
                         name_up: str = "up_blocks") -> dict:
    """Stacked UNetT scan subtrees -> the flat per-index layout."""
    import jax

    if name_down not in params or name_up not in params:
        raise ValueError("no stacked UNetT subtrees found to unstack")
    down, up = params[name_down], params[name_up]
    half = {x.shape[0] for x in jax.tree.leaves(down)}
    half |= {x.shape[0] for x in jax.tree.leaves(up)}
    if len(half) != 1:
        raise ValueError(f"inconsistent leading depth axes {sorted(half)}")
    half = half.pop()
    out = {k: v for k, v in params.items() if k not in (name_down, name_up)}
    for j in range(half):
        for stacked, base in ((down, 0), (up, half)):
            sub = jax.tree.map(lambda x, j=j: x[j], stacked)
            for p, v in sub.items():
                out[f"{p}_{base + j}"] = v
    return out


def adapt_unett_layout(params: dict, scan_layers: bool) -> dict:
    """Return UNetT ``params`` in the layout the model expects; no-op if
    already there."""
    has_stacked = "down_blocks" in params
    has_flat = any(k.startswith("attn_") and k[len("attn_"):].isdigit()
                   for k in params)
    if scan_layers:
        return stack_unett_params(params) if has_flat else params
    return unstack_unett_params(params) if has_stacked else params
