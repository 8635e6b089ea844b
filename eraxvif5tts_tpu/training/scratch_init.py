"""TTS-specific from-scratch weight init (reference `finetune_cli.py:26-97`
``init_weights_tts``).

Rules mapped from the torch module-name heuristics onto flax param paths:

- attention projections (``attn/to_*``): Xavier *normal*, gain 1
- feed-forward (``ff/``): Xavier *uniform*, gain sqrt(2)
- embeddings: normal(0, 0.02)
- LayerNorm / RMSNorm / GroupNorm: scale 1, bias 0 (flax defaults, re-asserted)
- output projections (path contains ``proj`` or ``out``): Xavier uniform, gain 0.5
- other Dense kernels: Xavier uniform, gain 1
- conv kernels: uniform(-1/sqrt(fan_in), 1/sqrt(fan_in))
- all biases: 0

Deliberate deviation: the reference's name matching also re-initializes the
AdaLN-zero modulation linears and ``proj_out`` (their names contain "attn"/"proj"),
destroying the zero-init that makes a fresh DiT block an identity
(`backbones/dit.py:162-172`). Here those stay zero — strictly better conditioning
for from-scratch runs on the same architecture.
"""

from __future__ import annotations

import math
import zlib
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# Param paths whose zero-init is load-bearing (AdaLN-zero identity blocks).
_KEEP_ZERO = ("attn_norm/linear", "norm_out/linear", "proj_out")


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return "/".join(parts)


def _fans(shape: tuple[int, ...]) -> tuple[float, float]:
    if len(shape) == 1:
        return float(shape[0]), float(shape[0])
    if len(shape) == 2:  # dense kernel [in, out]
        return float(shape[0]), float(shape[1])
    # conv kernel [k..., in, out]
    receptive = float(np.prod(shape[:-2])) if len(shape) > 2 else 1.0
    return receptive * shape[-2], receptive * shape[-1]


def _xavier(key, shape, gain: float, uniform: bool, dtype):
    fan_in, fan_out = _fans(shape)
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    if uniform:
        bound = math.sqrt(3.0) * std
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return std * jax.random.normal(key, shape, dtype)


def init_weights_tts(params: Any, rng: jax.Array) -> Any:
    """Return a params tree re-initialized with the TTS scratch rules above.

    Deterministic per param path (the rng is folded with a path hash), so the same
    seed reproduces the same init regardless of tree traversal order.
    """

    def init_leaf(key_path, leaf):
        path = _path_str(key_path)
        name = path.rsplit("/", 1)[-1]
        shape = jnp.shape(leaf)
        dtype = jnp.asarray(leaf).dtype
        key = jax.random.fold_in(rng, zlib.crc32(path.encode()))

        if any(z in path for z in _KEEP_ZERO):
            return jnp.zeros(shape, dtype)
        if name in ("bias", "beta", "dwconv_bias", "embed_bias"):
            return jnp.zeros(shape, dtype)
        if name in ("scale", "weight") and len(shape) == 1:  # norms
            return jnp.ones(shape, dtype)
        if name == "gamma":  # GRN gamma is zero-init by design
            return jnp.zeros(shape, dtype)
        if name == "embedding":
            return 0.02 * jax.random.normal(key, shape, dtype)
        lowered = path.lower()
        if len(shape) >= 3:  # conv kernels are [k, in, out]
            fan_in, _ = _fans(shape)
            bound = 1.0 / math.sqrt(max(fan_in, 1.0))
            return jax.random.uniform(key, shape, dtype, -bound, bound)
        if "/attn/" in path or "attention" in lowered:
            return _xavier(key, shape, 1.0, uniform=False, dtype=dtype)
        if "/ff/" in path or "mlp" in lowered or "feed_forward" in lowered:
            return _xavier(key, shape, math.sqrt(2.0), uniform=True, dtype=dtype)
        if "proj" in lowered or "out" in name:
            return _xavier(key, shape, 0.5, uniform=True, dtype=dtype)
        return _xavier(key, shape, 1.0, uniform=True, dtype=dtype)

    return jax.tree_util.tree_map_with_path(init_leaf, params)
