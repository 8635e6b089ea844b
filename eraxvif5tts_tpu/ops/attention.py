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
import math

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


def _flash_attention(q, k, v, key_valid, trainable: bool = False):
    """Pallas TPU flash attention; padding expressed as segment ids (padded tokens
    get segment 2, valid tokens 1 — cross-segment attention is masked out and padded
    query rows are zeroed by the caller).

    Block sizes ``(block_q=512, block_k=1024, block_b=1)`` measured fastest on the
    DiT serving shapes (b=2, h=16, n=1024, d=64): 14.8x -> 23.4x realtime (24.6x with the tap-loop ConvPositionEmbedding) for the
    full NFE=32 pipeline on one v5e chip (kernel defaults were slower than XLA).

    ``trainable=True`` also configures the backward (dq/dkv) block sizes so the
    kernel differentiates — the dropout-free training path.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, n, h, d = q.shape
    block_q = _flash_block(n, 512)
    block_k = _flash_block(n, 1024)
    if trainable:
        bq, bk = _flash_block(n, 512), _flash_block(n, 512)
        block_sizes = BlockSizes(
            block_q=block_q, block_k_major=block_k, block_k=block_k, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
            block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
        )
    else:
        block_sizes = BlockSizes(block_q=block_q, block_k_major=block_k,
                                 block_k=block_k, block_b=1)
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


_PAD64_FORCED = False


def _pad64_enabled() -> bool:
    import os

    return _PAD64_FORCED or os.environ.get("ERAX_SERVING_ATTN_PAD64", "0") == "1"


def maybe_force_pad64(exc: BaseException, n: int) -> bool:
    """Auto-enable the pad-to-128 serving path after a Mosaic compile failure.

    The 64-only-aligned one-shot layout is validated in interpret mode but a
    hardware/toolchain combination could still reject it at compile time
    (scoped-vmem or Mosaic lowering errors). Callers wrap their first jit
    dispatch at a 64-only-aligned bucket: on such a failure this flips the
    module-level pad64 flag (same effect as ``ERAX_SERVING_ATTN_PAD64=1``,
    exact numerics, ~0.8% cost) and returns True so the caller retries — the
    failed compile was never cached, so the retry retraces with padding.
    """
    global _PAD64_FORCED
    if _PAD64_FORCED or n % 128 == 0:
        return False
    msg = str(exc).lower()
    if "mosaic" not in msg and "vmem" not in msg:
        return False
    import warnings

    warnings.warn(
        "serving attention: Mosaic rejected the 64-aligned one-shot kernel "
        f"(n={n}); auto-enabling pad-to-128 fallback and retrying: {exc}"
    )
    _PAD64_FORCED = True
    return True


def use_serving_kernel(q, k, v, trainable: bool, key_valid, prefix_key_mask: bool,
                       implementation: str | None = None) -> bool:
    """True when the one-shot serving kernel will handle this shape — callers
    that can fuse rotary into it check this BEFORE rotating q/k themselves.

    Default ON: the headloop variant with in-kernel rotary measured 25.8x
    realtime end-to-end (NFE=32, v5e) vs 24.4x for the tuned flash kernel
    (`benchmarks/attn_sweep.py` slope timing: 118 us + fused rope vs 141 us +
    56 us external rotary at b=2 n=1024). ``ERAX_SERVING_ATTN=0`` is the
    escape hatch back to the flash path."""
    import os

    n, h, d = q.shape[1], q.shape[2], q.shape[3]
    if n % 128:
        # 64-aligned sequences ride the one-shot fat-q block when it fits the
        # calibrated VMEM model (64-step duration buckets halve the ODE's
        # padding waste vs 128-step ones); anything else falls through to the
        # unfused XLA attention (the flash kernel also needs n % 128 == 0).
        # ERAX_SERVING_ATTN_PAD64=1 instead runs the kernel at the next
        # 128-multiple with masked pad frames (exact; ~0.8% end-to-end cost) —
        # the escape hatch if Mosaic rejects the one-shot layout on some
        # hardware/toolchain.
        from eraxvif5tts_tpu.ops.serving_attention import one_shot_feasible

        if not _pad64_enabled() and not one_shot_feasible(n, h, d):
            return False
    return (
        os.environ.get("ERAX_SERVING_ATTN", "1") != "0"
        and implementation != "xla"
        and not trainable
        and _on_tpu()
        and n % 64 == 0
        and n <= 4096
        # d=256 excluded: at large n the headloop finds no VMEM-feasible block
        # and the fallback _blocks() budget (fp32 logits only, not K/V
        # double-buffering + rope tables) can admit a shape Mosaic then
        # rejects with a scoped-vmem error; no shipped config uses d=256
        and d in (64, 128)
        and q.shape == k.shape == v.shape
        and (key_valid is None or prefix_key_mask)
    )


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_valid: jnp.ndarray | None = None,
    implementation: str | None = None,
    trainable: bool = False,
    prefix_key_mask: bool = False,
    rope: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Softmax attention over full sequences. ``q/k/v: [b, n, h, d]``.

    On TPU with 128-aligned sequence lengths this dispatches to the Pallas flash
    kernel (never materializes the [n, n] logits — the serving hot loop is
    otherwise HBM-bound on attention traffic); elsewhere it uses XLA's fused
    attention. ``trainable=True`` selects the flash configuration with backward
    blocks (dropout-free training). ``ERAX_SERVING_ATTN=1`` opts into the
    experimental one-shot kernel (`ops/serving_attention.py`): requires
    ``key_valid`` to be a contiguous prefix mask (``prefix_key_mask=True``) or
    None, and supports in-kernel rotary (``rope``).
    """
    n, d = q.shape[1], q.shape[3]
    if use_serving_kernel(q, k, v, trainable, key_valid, prefix_key_mask,
                          implementation):
        from eraxvif5tts_tpu.ops.serving_attention import (
            padded_serving_attention,
            serving_attention,
        )

        lens = None
        if key_valid is not None:
            lens = jnp.sum(key_valid.astype(jnp.int32), axis=-1)
        if n % 128 and _pad64_enabled():
            return padded_serving_attention(q, k, v, lens, rope=rope)
        return serving_attention(q, k, v, lens, rope=rope)
    assert rope is None, "fused rope requires the serving kernel path"
    if (
        implementation != "xla"
        and _on_tpu()
        and n % 128 == 0
        and d in (64, 128, 256)
        and q.shape == k.shape == v.shape
    ):
        return _flash_attention(q, k, v, key_valid, trainable=trainable)
    mask = None
    if key_valid is not None:
        # [b, n] key validity -> broadcastable [b, 1, 1(q), n(k)]
        mask = key_valid[:, None, None, :]
    return jax.nn.dot_product_attention(
        q, k, v, mask=mask, implementation=None if implementation == "xla" else implementation
    )


def _train_chunk(n: int, cap: int) -> int:
    if n <= cap:
        return n
    for block in (cap, 256, 128):
        if n % block == 0:
            return block
    return 0  # not chunkable


def chunked_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_valid: jnp.ndarray | None = None,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    query_chunk_size: int = 512,
    key_chunk_size: int = 1024,
) -> jnp.ndarray:
    """Online-softmax (flash-style) attention with in-kernel attention-weight
    dropout, for the TRAINING path.

    The reference trains with ``F.scaled_dot_product_attention(..., dropout_p=0.1)``
    (reference `modules.py:490,582`), whose memory-efficient CUDA kernel never
    materializes the ``[b, h, n, n]`` weights. The earlier JAX train path did — 1
    GiB/sample/layer at 4096 frames x 16 heads in fp32 — so the 38,400-frame batch
    budget could not train on one chip. This kernel scans k-chunks with running
    (max, sum, acc) statistics and scans q-chunks under ``jax.checkpoint`` so the
    backward pass recomputes chunks instead of saving them: peak extra memory is
    O(qc x kc) per head, independent of n².

    Dropout semantics match SDPA: the *normalizer* uses the undropped weights, the
    value accumulation uses dropped-and-rescaled weights (out = dropout(softmax(s))v).
    The Bernoulli stream is deterministic per (rng, q-chunk, k-chunk).
    """
    b, n, h, d = q.shape
    qc = _train_chunk(n, query_chunk_size)
    kc = _train_chunk(n, key_chunk_size)
    if qc == 0 or kc == 0:  # non-chunkable length: dense fallback
        return _dense_dropout_attention(q, k, v, key_valid, dropout_rate, dropout_rng)

    scale = 1.0 / math.sqrt(d)
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
    nq, nk = n // qc, n // kc
    keep = 1.0 - dropout_rate
    if dropout_rate > 0.0:
        # threefry bits for the [n, n]-granularity masks dominated the train step
        # (45 s/step at 9x4096 on v5e); the TPU-hardware rbg generator is ~free.
        kd = jax.random.key_data(dropout_rng)
        if kd.shape[-1] == 2:
            dropout_rng = jax.random.wrap_key_data(
                jnp.concatenate([kd, kd], axis=-1), impl="rbg"
            )

    # chunk-major layouts for scan
    qr = jnp.moveaxis(q.reshape(b, nq, qc, h, d), 1, 0)  # [nq, b, qc, h, d]
    kr = jnp.moveaxis(k.reshape(b, nk, kc, h, d), 1, 0)
    vr = jnp.moveaxis(v.reshape(b, nk, kc, h, d), 1, 0)
    valid = None
    if key_valid is not None:
        valid = jnp.moveaxis(key_valid.reshape(b, nk, kc), 1, 0)  # [nk, b, kc]

    def q_block(q_blk, qi):
        # q_blk: [b, qc, h, d]
        def kv_step(carry, x):
            m, l, acc = carry  # [b,h,qc], [b,h,qc], [b,h,qc,d]
            k_blk, v_blk, valid_blk, ki = x
            s = jnp.einsum("bqhd,bkhd->bhqk", q_blk, k_blk).astype(jnp.float32) * scale
            if valid_blk is not None:
                s = jnp.where(valid_blk[:, None, None, :], s, neg)
            m_new = jnp.maximum(m, s.max(axis=-1))
            p = jnp.exp(s - m_new[..., None])
            corr = jnp.exp(m - m_new)
            l_new = l * corr + p.sum(axis=-1)
            if dropout_rate > 0.0:
                key = jax.random.fold_in(jax.random.fold_in(dropout_rng, qi), ki)
                mask = jax.random.bernoulli(key, keep, p.shape)
                p_v = jnp.where(mask, p / keep, 0.0)
            else:
                p_v = p
            acc_new = acc * corr[..., None] + jnp.einsum(
                "bhqk,bkhd->bhqd", p_v.astype(v_blk.dtype), v_blk
            ).astype(jnp.float32)
            return (m_new, l_new, acc_new), None

        init = (
            jnp.full((b, h, qc), -jnp.inf, jnp.float32),
            jnp.zeros((b, h, qc), jnp.float32),
            jnp.zeros((b, h, qc, d), jnp.float32),
        )
        xs = (kr, vr, valid, jnp.arange(nk)) if valid is not None else (
            kr, vr, None, jnp.arange(nk)
        )
        if valid is None:
            (m, l, acc), _ = jax.lax.scan(
                lambda c, x: kv_step(c, (x[0], x[1], None, x[2])),
                init, (kr, vr, jnp.arange(nk)),
            )
        else:
            (m, l, acc), _ = jax.lax.scan(kv_step, init, xs)
        out = acc / jnp.maximum(l, 1e-30)[..., None]  # [b, h, qc, d]
        return out.swapaxes(1, 2).astype(q.dtype)  # [b, qc, h, d]

    blocks = jax.lax.map(
        lambda x: jax.checkpoint(q_block)(x[0], x[1]), (qr, jnp.arange(nq))
    )  # [nq, b, qc, h, d]
    return jnp.moveaxis(blocks, 0, 1).reshape(b, n, h, d)


def _dense_dropout_attention(q, k, v, key_valid, dropout_rate, dropout_rng):
    """Materialized-softmax fallback for non-chunkable (tiny/ragged) lengths."""
    out_w = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    out_w = out_w / math.sqrt(q.shape[-1])
    if key_valid is not None:
        neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
        out_w = jnp.where(key_valid[:, None, None, :], out_w, neg)
    weights = jax.nn.softmax(out_w, axis=-1)
    if dropout_rate > 0.0:
        mask = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(mask, weights / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v)


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
