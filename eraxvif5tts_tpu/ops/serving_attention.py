"""One-shot Pallas attention kernel for the serving hot loop.

When the whole key/value sequence fits in VMEM (n <= 4096: K+V = 1 MB bf16 per
head at d=64) online-softmax machinery is unnecessary; each program computes

    S = Q K^T  ->  mask padded keys  ->  softmax rows  ->  P V

directly. Key padding is expressed as per-sample valid lengths compared against
an iota — the model's masks are always contiguous prefixes
(`ops/masks.py lens_to_mask`).

Two variants, measured on v5e with slope timing (`benchmarks/attn_sweep.py`,
b=2 h=16 n=1024 d=64; the tunnel RTT makes naive per-call timing meaningless):

- ``headloop`` (default): per-head 2-D matmuls with a fat M = q-block under a
  static head unroll — 118 us (73 TF/s, vs ~98 ceiling for d=64 contractions)
  against 141 us for the best generic flash config. Rotary can be FUSED into
  the kernel (q/k rotated on VMEM-resident blocks), replacing ~56 us/layer of
  HBM-level elementwise rotary that XLA cannot fuse into an opaque pallas call:
  end-to-end NFE=32 serving went 24.4x -> 25.8x realtime.
- ``batched``: hb heads in one batched dot_general. Mosaic lowers the batch dim
  as hb skinny (M=128) matmuls; kept for sweep comparison (it wins at n=2048).

Forward-only (serving); the training path keeps the differentiable flash kernel
(`ops/attention.py`). Reference semantics: `F.scaled_dot_product_attention`
(reference `src/f5_tts/model/modules.py:490`).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30  # finite "minus infinity": keeps fully-masked rows NaN-free

# VMEM budget for the fp32 logits tile [hb, bq, n] (elements)
_S_BUDGET = 1024 * 1024


def _blocks(n: int, h: int) -> tuple[int, int]:
    """(head block, q block): fewest programs whose logits tile fits VMEM."""
    best = (1, 128)
    best_programs = None
    for hb in (8, 4, 2, 1):
        if h % hb:
            continue
        cap = (_S_BUDGET // (hb * n)) // 128 * 128
        bq = 0
        for cand in range(min(cap, 1024), 127, -128):
            if n % cand == 0:
                bq = cand
                break
        if bq == 0:
            continue
        programs = (h // hb) * (n // bq)
        if best_programs is None or programs < best_programs:
            best, best_programs = (hb, bq), programs
    return best


def _rotate(x, cos, sin):
    """Interleaved-pair rotary on the last axis, VPU-style: the classic
    ``reshape(..., d/2, 2)`` pair shuffle is a strided lane permutation; two
    whole-lane rolls + an even/odd select compute the same
    ``(x0, x1) -> (x0 cos - x1 sin, x1 cos + x0 sin)`` (`ops/rotary.py`).

    x [..., d] (any float dtype), cos/sin [broadcastable ..., d] fp32.
    Rotation runs in fp32; cast back by the caller.
    """
    from jax.experimental.pallas import tpu as pltpu

    x32 = x.astype(jnp.float32)
    d = x.shape[-1]
    even = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1) % 2 == 0
    left = pltpu.roll(x32, d - 1, axis=x.ndim - 1)   # x[j+1] (shift must be >= 0)
    right = pltpu.roll(x32, 1, axis=x.ndim - 1)      # x[j-1]
    rh = jnp.where(even, -left, right)
    return x32 * cos + rh * sin


def _kernel(lens_ref, q_ref, k_ref, v_ref, *rest,
            scale: float, masked: bool, roped: bool):
    # pallas passes refs as (inputs..., outputs...): rope tables sit between v
    # and the output when the fused-rotary variant is traced
    if roped:
        cosq_ref, sinq_ref, cosk_ref, sink_ref, o_ref = rest
    else:
        (o_ref,) = rest
    q = q_ref[0]  # [hb, bq, d]
    k = k_ref[0]  # [hb, n, d]
    v = v_ref[0]  # [hb, n, d]
    if roped:
        # rotary fused into the kernel: rotating q/k at HBM level costs ~1.3 ms
        # per DiT forward in elementwise passes XLA cannot fuse into an opaque
        # pallas call; here the rotation happens on VMEM-resident blocks.
        q = _rotate(q, cosq_ref[...][None], sinq_ref[...][None]).astype(q_ref.dtype)
        k = _rotate(k, cosk_ref[...][None], sink_ref[...][None]).astype(k_ref.dtype)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # [hb, bq, n]
    if masked:
        length = lens_ref[pl.program_id(0)]
        kpos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(kpos < length, s, _NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p * pl.reciprocal(denom, approx=False)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [hb, bq, d]
    o_ref[0] = o.astype(o_ref.dtype)


def _headloop_kernel(lens_ref, q_ref, k_ref, v_ref, *rest,
                     scale: float, masked: bool, roped: bool, hb: int,
                     prerotate: bool = False):
    """Per-head 2-D matmuls (fat M = q block) under a static head unroll —
    avoids the batched-dim dot_general of :func:`_kernel`, which Mosaic lowers
    as hb skinny matmuls, and lets one head's VPU softmax overlap the next
    head's MXU matmul.

    ``prerotate``: rotate the whole [hb, ., d] q/k blocks in one vectorized
    pass before the head loop instead of per-head [., d] tiles inside it —
    costs ~2 extra bf16 block copies of VMEM but utilizes the VPU on 8x
    bigger shapes (candidate from the round-4 n=1088/1152 sweeps, where the
    per-head fused rotary measured ~2x the standalone rotation cost)."""
    if roped:
        cosq_ref, sinq_ref, cosk_ref, sink_ref, o_ref = rest
    else:
        (o_ref,) = rest
    if masked:
        length = lens_ref[pl.program_id(0)]
    if roped and prerotate:
        q_all = _rotate(q_ref[0], cosq_ref[...][None],
                        sinq_ref[...][None]).astype(q_ref.dtype)
        k_all = _rotate(k_ref[0], cosk_ref[...][None],
                        sink_ref[...][None]).astype(k_ref.dtype)
    for hi in range(hb):
        if roped and prerotate:
            qh = q_all[hi]  # [bq, d]
            kh = k_all[hi]  # [n, d]
        else:
            qh = q_ref[0, hi]  # [bq, d]
            kh = k_ref[0, hi]  # [n, d]
        if roped and not prerotate:
            qh = _rotate(qh, cosq_ref[...], sinq_ref[...]).astype(q_ref.dtype)
            kh = _rotate(kh, cosk_ref[...], sink_ref[...]).astype(k_ref.dtype)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [bq, n]
        if masked:
            kpos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kpos < length, s, _NEG)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        p = p * pl.reciprocal(denom, approx=False)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, hi], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, d]
        o_ref[0, hi] = o.astype(o_ref.dtype)


def one_shot_feasible(n: int, h: int, d: int) -> bool:
    """True when the one-shot fat-q block (bq = n) fits the calibrated VMEM
    model for some head block — the variant that carries sequence lengths that
    are only 64-aligned (no 128-multiple q-block divides them). Mosaic handles
    a 64-multiple sublane/minor extent by lane padding inside the kernel; the
    dispatch gate (`ops/attention.use_serving_kernel`) calls this before
    admitting an n % 128 != 0 shape."""
    if n % 64 or d not in (64, 128):
        return False
    hb, _ = _headloop_blocks(n, h, d, _one_shot_only=True)
    return hb is not None


def _headloop_blocks(n: int, h: int, d: int,
                     _one_shot_only: bool = False) -> tuple[int, int]:
    """(head block, q block) for the headloop variant.

    Measured on v5e (`benchmarks/attn_sweep.py`, slope timing): fat q blocks
    win — (8, 1024) hits 73 TF/s at n=1024 vs 61 for the tuned flash config —
    until the fp32 logits tile + hb heads of K/V overflow VMEM (~10 MB usable;
    14 MB fails to compile). hb=8 beats hb=16 (more pipelining headroom)."""
    hb0 = next((c for c in (8, 4, 2, 1) if h % c == 0), 1) if h > 8 else h

    # Estimate calibrated against Mosaic scoped-vmem failures: K/V
    # double-buffer across the head grid dim, logits tile on stack, rope
    # tables always budgeted (fused-rope worst case) — (4,256)@n=4096+rope
    # reported 17 MB (est 17.25, fails), (8,1024)@1024+rope compiles (est 13).
    # When bq == n the q grid dim has extent 1, so Mosaic does not
    # double-buffer q/out — budget a single q buffer there.
    def est(hb: int, bq: int) -> int:
        kv = hb * n * d * 2 * 2
        q_blk = hb * bq * d * 2
        return (2 * kv            # K+V, double-buffered
                + 2 * n * d * 4   # cos_k/sin_k fp32
                + bq * n * 4      # fp32 logits tile
                + (q_blk if bq == n else 2 * q_blk)  # q
                + q_blk           # output block
                + 2 * bq * d * 4)  # cos_q/sin_q

    # fat q blocks first (M = bq drives MXU utilization), then as many heads
    # per program as VMEM allows. Sequences that are only 64-aligned have no
    # 128-multiple divisor at all and go straight to the one-shot branch.
    best = None
    if not _one_shot_only and n % 128 == 0:
        for bq in range(min(n, 1024), 127, -128):
            if n % bq:
                continue
            for hb in (hb0, hb0 // 2, hb0 // 4, 1):
                if not hb or h % hb:
                    continue
                if est(hb, bq) <= 13 * 1024 * 1024:
                    best = (hb, bq)
                    break
            if best:
                break
    if best is None or best[1] < n // 2:
        # pathological divisor structure (e.g. n = 9*128 -> best divisor 384,
        # or 64-aligned n with no 128-multiple divisor): one fat one-shot q
        # block beats the skinny divisor despite the bigger logits tile —
        # measured 227 -> 195 us/layer roped at n=1152 (hb=8).
        # With the single-buffer correction the one-shot estimate may use the
        # measured 14 MB headroom ((8,1152) est 13.6 compiles; the
        # (4,256)@4096 failure point, est 17.25, is still rejected).
        for hb in (hb0, hb0 // 2, hb0 // 4, 1):
            if not hb or h % hb:
                continue
            if est(hb, n) <= 14 * 1024 * 1024:
                return hb, n
        if _one_shot_only:
            return None, 0
    if best is not None:
        return best
    if n % 128:
        # no 128-multiple q block divides n and one-shot did not fit VMEM —
        # the dispatch gate (one_shot_feasible) refuses these shapes up front
        raise ValueError(f"no VMEM-feasible serving block for n={n}, h={h}, d={d}")
    return _blocks(n, h)


def _reference_attention(q, k, v, lens, rope):
    """jnp reference with the kernel's exact semantics — the differentiation
    surrogate for :func:`serving_attention`'s custom_jvp (materializes the
    [b, h, n, n] logits; only ever executed if a caller truly differentiates
    through the serving path)."""
    from eraxvif5tts_tpu.ops.rotary import apply_rotary

    b, n, h, d = q.shape
    if rope is not None:
        q = apply_rotary(q.swapaxes(1, 2), rope).swapaxes(1, 2)
        k = apply_rotary(k.swapaxes(1, 2), rope).swapaxes(1, 2)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / math.sqrt(d)
    if lens is not None:
        valid = jnp.arange(n)[None, :] < lens[:, None]
        s = jnp.where(valid[:, None, None, :], s, _NEG)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v).astype(q.dtype)


@functools.partial(jax.custom_jvp, nondiff_argnums=(5, 6, 7))
def _serving_attention(q, k, v, lens, rope, interpret, variant, blocks):
    return _serving_attention_impl(q, k, v, lens, rope, interpret, variant,
                                   blocks)


@_serving_attention.defjvp
def _serving_attention_jvp(interpret, variant, blocks, primals, tangents):
    # The pallas kernel has no JVP rule (pltpu.roll et al). Frozen-teacher
    # setups (training/distill.py) trace differentiation through a
    # stop_gradient'd teacher forward — the tangent graph below is dead code
    # there and gets DCE'd; if a caller really differentiates, the reference
    # path supplies a correct (memory-heavy) tangent.
    q, k, v, lens, rope = primals
    dq, dk, dv = tangents[0], tangents[1], tangents[2]
    out = _serving_attention_impl(q, k, v, lens, rope, interpret, variant,
                                  blocks)
    zeros = jnp.zeros_like
    dq = dq if not isinstance(dq, jax.custom_derivatives.SymbolicZero) else zeros(q)
    dk = dk if not isinstance(dk, jax.custom_derivatives.SymbolicZero) else zeros(k)
    dv = dv if not isinstance(dv, jax.custom_derivatives.SymbolicZero) else zeros(v)
    _, tangent = jax.jvp(
        lambda q_, k_, v_: _reference_attention(q_, k_, v_, lens, rope),
        (q, k, v), (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)),
    )
    return out, tangent


@functools.partial(jax.jit, static_argnames=("interpret", "variant", "blocks"))
def serving_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lens: jnp.ndarray | None = None,
    rope: jnp.ndarray | None = None,
    interpret: bool = False,
    variant: str = "headloop",
    blocks: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Softmax attention ``[b, n, h, d] -> [b, n, h, d]`` with optional
    contiguous-prefix key masking (``lens [b]`` valid keys per sample) and
    optional fused rotary (``rope [n, d]`` interleaved-pair angles applied to
    the raw q/k inside the kernel, all heads).

    ``variant``: "headloop" (per-head fat matmuls, default), "headloop_pre"
    (rotate q/k once up front — benchmark-only, measured negative) or
    "batched" (batched-head dot_general). ``blocks`` overrides the
    (head block, q block) chooser — the sweep harness' knob.

    Requires n % 128 == 0 — or n % 64 == 0 with a VMEM-feasible one-shot
    block (`one_shot_feasible`) — and d in {64, 128} (the caller dispatches).
    Differentiation is supported via a reference-implementation custom_jvp
    (primarily so stop-gradient'd teacher forwards trace; the training path
    has its own kernel, `ops/train_attention.py`).
    """
    return _serving_attention(q, k, v, lens, rope, interpret, variant, blocks)


def padded_serving_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lens: jnp.ndarray | None = None,
    rope: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """:func:`serving_attention` for sequence lengths that are only 64-aligned,
    run at the next 128-multiple instead of through the one-shot fat-q block.

    Pads q/k/v (and the rope table — angle 0 is the identity rotation) with 64
    zero frames, marks them invalid via ``lens``, and slices the result back to
    ``n``. The padded keys never contribute (prefix mask) and the padded query
    rows are discarded, so this is exact. Attention is ~13% of the serving
    forward, so the 6% pad costs ~0.8% end-to-end while the 64-step bucket
    ladder saves ~5% of the whole ODE — the fallback stays a net win if Mosaic
    ever rejects the one-shot layout at a 64-only-aligned n
    (``ERAX_SERVING_ATTN_PAD64=1`` selects this path in
    `ops/attention.use_serving_kernel` dispatch).
    """
    b, n = q.shape[0], q.shape[1]
    pad = (-n) % 128
    if pad == 0:
        return serving_attention(q, k, v, lens, rope=rope, interpret=interpret)
    if lens is None:
        lens = jnp.full((b,), n, jnp.int32)
    spec = ((0, 0), (0, pad), (0, 0), (0, 0))
    qp, kp, vp = (jnp.pad(t, spec) for t in (q, k, v))
    ropep = jnp.pad(rope, ((0, pad), (0, 0))) if rope is not None else None
    out = serving_attention(qp, kp, vp, lens, rope=ropep, interpret=interpret)
    return out[:, :n]


def _serving_attention_impl(q, k, v, lens, rope, interpret, variant, blocks):
    if variant not in ("batched", "headloop", "headloop_pre"):
        raise ValueError(
            f"unknown serving_attention variant {variant!r} "
            "(batched|headloop|headloop_pre)")
    b, n, h, d = q.shape
    if blocks is not None:
        hb, bq = blocks
    elif variant.startswith("headloop"):
        # NOTE: _headloop_blocks' VMEM model covers the default headloop
        # kernel; "headloop_pre" adds two rotated [hb, n, d] q/k copies it
        # does not account for (benchmark-only variant, measured negative —
        # pass explicit `blocks` when sweeping it at fat head blocks).
        hb, bq = _headloop_blocks(n, h, d)
    else:
        hb, bq = _blocks(n, h)
    scale = 1.0 / math.sqrt(d)
    masked = lens is not None
    if lens is None:
        lens = jnp.full((b,), n, jnp.int32)
    roped = rope is not None

    # Mosaic blocks the last two dims, so the kernel runs in [b, h, n, d]; the
    # transposes fuse with the surrounding reshape/projection ops just as they
    # did for the generic flash kernel.
    qt, kt, vt = (t.swapaxes(1, 2) for t in (q, k, v))

    grid = (b, h // hb, n // bq)
    if variant.startswith("headloop"):
        kernel = functools.partial(_headloop_kernel, scale=scale, masked=masked,
                                   roped=roped, hb=hb,
                                   prerotate=variant == "headloop_pre")
    else:
        kernel = functools.partial(_kernel, scale=scale, masked=masked, roped=roped)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # lens [b]
        pl.BlockSpec((1, hb, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hb, n, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hb, n, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [lens.astype(jnp.int32), qt, kt, vt]
    if roped:
        cos = jnp.cos(rope).astype(jnp.float32)
        sin = jnp.sin(rope).astype(jnp.float32)
        in_specs += [
            pl.BlockSpec((bq, d), lambda bi, hi, qi: (qi, 0),
                         memory_space=pltpu.VMEM),  # cos_q
            pl.BlockSpec((bq, d), lambda bi, hi, qi: (qi, 0),
                         memory_space=pltpu.VMEM),  # sin_q
            pl.BlockSpec((n, d), lambda bi, hi, qi: (0, 0),
                         memory_space=pltpu.VMEM),  # cos_k
            pl.BlockSpec((n, d), lambda bi, hi, qi: (0, 0),
                         memory_space=pltpu.VMEM),  # sin_k
        ]
        operands += [cos, sin, cos, sin]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hb, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * d,
            bytes_accessed=(3 * b * n * h * d + b * n * h * d) * q.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
    )(*operands)
    return out.swapaxes(1, 2)
