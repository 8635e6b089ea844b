"""Bidirectional multi-head attention for DiT on TPU.

The reference runs ``F.scaled_dot_product_attention`` (reference
`src/f5_tts/model/modules.py:490`). Here the default path is
``jax.nn.dot_product_attention`` (XLA's fused attention; near-MXU-peak for the
<=4096-frame sequences this model is capped at, SURVEY.md §5), plus a Pallas
flash-attention kernel for the serving hot loop (`ops/pallas_attention.py`).

Inputs are ``[b, n, h, d]``; an optional boolean key-validity mask ``[b, n]`` marks
padded frames. Padded *query* rows are left untouched here and zeroed by the caller
after the output projection, matching `modules.py:499-501`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_valid: jnp.ndarray | None = None,
    implementation: str | None = None,
) -> jnp.ndarray:
    """Softmax attention over full sequences. ``q/k/v: [b, n, h, d]``."""
    mask = None
    if key_valid is not None:
        # [b, n] key validity -> broadcastable [b, 1, 1(q), n(k)]
        mask = key_valid[:, None, None, :]
    return jax.nn.dot_product_attention(
        q, k, v, mask=mask, implementation=implementation
    )


def attention_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Plain einsum attention — the semantic reference used by tests."""
    b, n, h, d = q.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, q.dtype))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    if key_valid is not None:
        neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
        logits = jnp.where(key_valid[:, None, None, :], logits, neg)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)
