"""Rotary position embeddings (interleaved / GPT-NeoX pairing).

Matches the semantics of the x_transformers ``RotaryEmbedding`` +
``apply_rotary_pos_emb`` pair the reference backbones use (reference
`src/f5_tts/model/backbones/dit.py:134,215`, `modules.py:469-480`): frequencies
``theta^(-2i/d)``, each frequency repeated for an adjacent (even, odd) lane pair, and
rotation ``(x0, x1) -> (x0 cos - x1 sin, x1 cos + x0 sin)``.

Also provides the concatenated cos/sin table that the reference *adds* as an absolute
text positional embedding (`modules.py:196-219`, used at `backbones/dit.py:63-68`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rotary_freqs(seq_len: int, dim: int, theta: float = 10000.0) -> jnp.ndarray:
    """Per-position angles ``[seq_len, dim]`` with each frequency repeated twice."""
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    t = np.arange(seq_len, dtype=np.float64)
    freqs = t[:, None] * inv_freq[None, :]  # [n, dim/2]
    freqs = np.repeat(freqs, 2, axis=-1)  # [n, dim] interleaved pairs
    return jnp.asarray(freqs, dtype=jnp.float32)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """Adjacent-pair rotation: (x0, x1) -> (-x1, x0)."""
    x_pairs = x.reshape(*x.shape[:-1], -1, 2)
    x0, x1 = x_pairs[..., 0], x_pairs[..., 1]
    return jnp.stack([-x1, x0], axis=-1).reshape(x.shape)


def apply_rotary(x: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Rotate ``x [..., n, d]`` by angles ``freqs [n, rot_dim]`` (rot_dim <= d)."""
    rot_dim = freqs.shape[-1]
    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    cos = jnp.cos(freqs).astype(x.dtype)
    sin = jnp.sin(freqs).astype(x.dtype)
    x_rot = x_rot * cos + _rotate_half(x_rot) * sin
    if x_pass.shape[-1] == 0:
        return x_rot
    return jnp.concatenate([x_rot, x_pass], axis=-1)


def abs_pos_embedding_table(dim: int, max_pos: int = 4096, theta: float = 10000.0) -> np.ndarray:
    """``concat(cos(t f), sin(t f))`` table, shape ``[max_pos, dim]``.

    Parity with reference ``precompute_freqs_cis`` (`modules.py:196-207`): frequencies
    over the *first half* of ``dim``, cos block then sin block.
    """
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64)[: dim // 2] / dim))
    t = np.arange(max_pos, dtype=np.float64)
    angles = np.outer(t, freqs)
    return np.concatenate([np.cos(angles), np.sin(angles)], axis=-1).astype(np.float32)
