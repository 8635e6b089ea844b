"""Position-hash dropout — the elementwise counterpart of the in-kernel
attention-weight dropout (`ops/train_attention.py`).

``jax.random.bernoulli`` generates mask bits at 0.5 Gelem/s (threefry) /
1.3 Gelem/s (rbg) on v5e; the FF + attention-output dropouts of a
38,400-frame training step need ~2.5 G bits, regenerated again under
activation-checkpoint recompute. The murmur3-finalizer position hash computes
them in a handful of VPU integer ops fused into the surrounding elementwise
graph. iid-ness comes from the mixer's avalanche; masks are deterministic in
(key, element position) so a remat recompute reproduces them exactly (as flax
nn.Dropout does via its rng).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eraxvif5tts_tpu.ops.train_attention import _fmix32


def hash_dropout(x: jnp.ndarray, rate: float, key: jax.Array) -> jnp.ndarray:
    """Dropout with keep probability ``1 - rate``, mask = position hash of the
    flat element index salted by ``key``. Semantics match ``nn.Dropout``
    (drop and rescale by 1/keep)."""
    if rate <= 0.0:
        return x
    keep = 1.0 - rate
    kd = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    # two independent fmix rounds (one per 32-bit key word) — avoids the
    # linear-combination aliasing a single multiply-add salt would have
    salt = _fmix32(kd[0] * jnp.uint32(0x9E3779B9)) ^ _fmix32(
        kd[-1] + jnp.uint32(0x7FEB352D))
    idx = jax.lax.broadcasted_iota(jnp.uint32, (x.size,), 0).reshape(x.shape)
    bits = _fmix32(idx ^ salt)
    km = bits < jnp.uint32(min(int(keep * 2**32), 2**32 - 1))
    return jnp.where(km, x / keep, jnp.zeros((), x.dtype))
