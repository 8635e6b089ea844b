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

import functools

import jax
import jax.numpy as jnp


@functools.cache
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _flash_block(n: int, cap: int = 512) -> int:
    for block in (cap, 256, 128):
        if n % block == 0:
            return block
    return n


def _flash_attention(q, k, v, key_valid):
    """Pallas TPU flash attention; padding expressed as segment ids (padded tokens
    get segment 2, valid tokens 1 — cross-segment attention is masked out and padded
    query rows are zeroed by the caller).

    Block sizes ``(block_q=512, block_k=1024, block_b=1)`` measured fastest on the
    DiT serving shapes (b=2, h=16, n=1024, d=64): 14.8x -> 23.4x realtime (24.6x with the tap-loop ConvPositionEmbedding) for the
    full NFE=32 pipeline on one v5e chip (kernel defaults were slower than XLA).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, n, h, d = q.shape
    block_q = _flash_block(n, 512)
    block_k = _flash_block(n, 1024)
    block_sizes = BlockSizes(block_q=block_q, block_k_major=block_k, block_k=block_k,
                             block_b=1)
    qt = q.swapaxes(1, 2)  # [b, h, n, d]
    kt = k.swapaxes(1, 2)
    vt = v.swapaxes(1, 2)
    segment_ids = None
    if key_valid is not None:
        seg = jnp.where(key_valid, 1, 2).astype(jnp.int32)
        segment_ids = SegmentIds(q=seg, kv=seg)
    out = flash_attention(
        qt, kt, vt, segment_ids=segment_ids, causal=False,
        sm_scale=float(1.0 / (d ** 0.5)), block_sizes=block_sizes,
    )
    return out.swapaxes(1, 2)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_valid: jnp.ndarray | None = None,
    implementation: str | None = None,
) -> jnp.ndarray:
    """Softmax attention over full sequences. ``q/k/v: [b, n, h, d]``.

    On TPU with 128-aligned sequence lengths this dispatches to the Pallas flash
    kernel (never materializes the [n, n] logits — the serving hot loop is otherwise
    HBM-bound on attention traffic); elsewhere it uses XLA's fused attention.
    """
    n, d = q.shape[1], q.shape[3]
    if (
        implementation != "xla"
        and _on_tpu()
        and n % 128 == 0
        and d in (64, 128, 256)
        and q.shape == k.shape == v.shape
    ):
        return _flash_attention(q, k, v, key_valid)
    mask = None
    if key_valid is not None:
        # [b, n] key validity -> broadcastable [b, 1, 1(q), n(k)]
        mask = key_valid[:, None, None, :]
    return jax.nn.dot_product_attention(
        q, k, v, mask=mask, implementation=None if implementation == "xla" else implementation
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
