"""Length / span mask helpers (parity: reference `src/f5_tts/model/utils.py:42-66`).

All return boolean masks marking VALID positions, with static widths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lens_to_mask(lens: jnp.ndarray, length: int) -> jnp.ndarray:
    """``[b] -> [b, length]``; True where position < lens."""
    seq = jnp.arange(length)
    return seq[None, :] < lens[:, None]


def mask_from_start_end(start: jnp.ndarray, end: jnp.ndarray, length: int) -> jnp.ndarray:
    seq = jnp.arange(length)
    return (seq[None, :] >= start[:, None]) & (seq[None, :] < end[:, None])


def mask_from_frac_lengths(
    lens: jnp.ndarray, frac_lengths: jnp.ndarray, length: int, key: jax.Array
) -> jnp.ndarray:
    """Random span of ``frac * len`` frames inside each sample (`utils.py:58-66`)."""
    span = (frac_lengths * lens).astype(jnp.int32)
    max_start = lens - span
    rand = jax.random.uniform(key, lens.shape)
    start = jnp.clip((max_start * rand).astype(jnp.int32), 0, None)
    return mask_from_start_end(start, start + span, length)
