"""Fused int8 W8A8 feed-forward: quantize -> GEMM -> GELU -> requantize -> GEMM
in ONE Pallas kernel. OPT-IN (``ERAX_INT8_FF=1``) — measured NEGATIVE on v5e;
see :func:`use_int8_ff` and BASELINE.md's round-4 E2TTS ablation table.

The hypothesis this kernel tested: with the two-GEMM `QuantDense` path, XLA
materializes the FF midsection in HBM every layer-step (the int32 GEMM-1
output, the dequant+GELU+requant pass, the int8 GEMM-2 input — ~90 MB at the
E2TTS serving shape), so keeping the hidden activation VMEM-resident should
win. Measured outcome: it does NOT — XLA fuses those epilogues into the dot
well enough that the unfused chain runs at 311 TOPS effective, while this
kernel's VMEM budget forces bm=128 row blocks that cost more MXU efficiency
than the saved traffic is worth (paired A/B: 147 vs 124 us). Mechanism: each
[bm, K] row-block is quantized (dynamic per-row symmetric, same scheme as
`ops/quant.int8_matmul`), pushed through w1 on the int8 MXU path, dequantized
and GELU'd in fp32 registers, requantized, and pushed through w2 — only the
bf16 input and output blocks touch HBM. Both weight operands stay
VMEM-resident across the whole M grid (constant block index = fetched once).

Numerics vs the unfused path: identical quantization grid; the hidden
activation stays fp32 instead of rounding through bf16 between GEMM-1 and
GELU, so the fused path is (slightly) MORE accurate. Serving-only — the int8
path is never differentiated (quantized models are not trained).

Reference counterpart: none (the reference has no quantized path); the FF
semantics being fused are `modules.py:342-353` of the reference.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)

# Scoped-VMEM budget for picking the row block. Calibrated like
# serving_attention's model: weights are single-buffered (constant index),
# row blocks double-buffered, fp32 intermediates counted once (Mosaic reuses
# dead buffers, so this over-counts — the 13.5 MB cap absorbs that slack).
_VMEM_BUDGET = int(13.5 * 1024 * 1024)


def _gelu_tanh(x):
    return 0.5 * x * (1.0 + jnp.tanh(_SQRT_2_OVER_PI * (x + 0.044715 * x * x * x)))


def _quant_rows(x32):
    """Dynamic symmetric per-row int8 quantization (matches int8_matmul)."""
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def pick_bm(m: int, k: int, n: int, k2: int) -> int | None:
    """Largest VMEM-feasible row block dividing m, or None."""
    fixed = k * n + n * k2 + 4 * 2 * (n + k2)  # int8 weights + s/b vectors
    for bm in (512, 256, 128, 64):
        if m % bm:
            continue
        per = (2 * bm * k * 2      # x block bf16, double-buffered
               + 2 * bm * k2 * 2   # out block bf16, double-buffered
               + bm * k * 4        # x fp32
               + bm * k            # x_q int8
               + bm * n * 4        # acc1 / h fp32
               + bm * n            # h_q int8
               + bm * k2 * 4)      # acc2 fp32
        if fixed + per <= _VMEM_BUDGET:
            return bm
    return None


def use_int8_ff(m: int, k: int, n: int, k2: int) -> bool:
    """Dispatch gate: OPT-IN (``ERAX_INT8_FF=1``), TPU backend, and a
    VMEM-feasible row block.

    Default OFF — measured NEGATIVE on v5e (round 4, paired A/B at the E2TTS
    FF shape [2,1152,1024]x4096: fused 147 us vs 124 us for the XLA
    QuantDense->gelu->QuantDense chain, ratio 1.126). XLA's int8 dot plus
    fused dequant/GELU/requant epilogues already runs at 311 TOPS effective,
    so the hand-fused kernel's VMEM-resident midsection buys nothing and its
    bm=128 row blocks lose MXU efficiency. Kept as an opt-in experiment for
    other shapes/toolchains; BASELINE.md records the ablation.
    """
    import os

    from eraxvif5tts_tpu.ops import fused_matmul as _fm

    if not (os.environ.get("ERAX_INT8_FF", "0") == "1"
            or _fm._FORCE_FOR_TESTS):
        return False
    if not (_fm._on_tpu() or _fm._FORCE_FOR_TESTS):
        return False
    return pick_bm(m, k, n, k2) is not None


def _kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)                       # [bm, K]
    x_q, a_scale = _quant_rows(x)
    acc1 = jax.lax.dot_general(
        x_q, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                  # [bm, N] int32
    h = acc1.astype(jnp.float32) * (a_scale * s1_ref[...]) + b1_ref[...]
    h = _gelu_tanh(h)
    h_q, h_scale = _quant_rows(h)
    acc2 = jax.lax.dot_general(
        h_q, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                  # [bm, K2] int32
    o_ref[0] = (acc2.astype(jnp.float32) * (h_scale * s2_ref[...])
                + b2_ref[...]).astype(o_ref.dtype)


def int8_ff_reference(x, w1_q, s1, b1, w2_q, s2, b2, out_dtype=jnp.bfloat16):
    """jnp surrogate with the kernel's exact semantics (fp32 hidden)."""
    x32 = x.astype(jnp.float32)
    x_q, a_scale = _quant_rows(x32)
    h = (jnp.einsum("bmk,kn->bmn", x_q.astype(jnp.int32), w1_q.astype(jnp.int32))
         .astype(jnp.float32) * (a_scale * s1[None, None, :]) + b1[None, None, :])
    h = _gelu_tanh(h)
    h_q, h_scale = _quant_rows(h)
    out = (jnp.einsum("bmn,nk->bmk", h_q.astype(jnp.int32), w2_q.astype(jnp.int32))
           .astype(jnp.float32) * (h_scale * s2[None, None, :]) + b2[None, None, :])
    return out.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8_ff_fused(x: jnp.ndarray, w1_q: jnp.ndarray, s1: jnp.ndarray,
                  b1: jnp.ndarray, w2_q: jnp.ndarray, s2: jnp.ndarray,
                  b2: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """``dequant(requant(gelu(dequant(quant(x) @ w1_q)*s1+b1)) @ w2_q)*s2+b2``.

    x ``[B, M, K]`` (any float dtype; returned in the same dtype); w1_q
    ``[K, N]`` int8 with per-output-channel fp32 ``s1 [N]``; w2_q ``[N, K2]``
    / ``s2 [K2]``; biases fp32. Callers gate with :func:`use_int8_ff`.
    """
    if interpret is None:
        from eraxvif5tts_tpu.ops.fused_matmul import _on_tpu

        interpret = not _on_tpu()
    bsz, m, k = x.shape
    n = w1_q.shape[1]
    k2 = w2_q.shape[1]
    bm = pick_bm(m, k, n, k2)
    if bm is None:
        raise ValueError(
            f"int8_ff_fused: no VMEM-feasible row block for [{bsz},{m},{k}]"
            f"x[{k},{n}]x[{n},{k2}] — gate callers with use_int8_ff()")
    grid = (bsz, m // bm)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, k), lambda bi, mi: (bi, mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda bi, mi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda bi, mi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda bi, mi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k2), lambda bi, mi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k2), lambda bi, mi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k2), lambda bi, mi: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bm, k2), lambda bi, mi: (bi, mi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, m, k2), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * m * n * (k + k2),
            bytes_accessed=bsz * m * (k + k2) * x.dtype.itemsize
            + k * n + n * k2,
            transcendentals=bsz * m * n,
        ),
    )(x, w1_q, s1.astype(jnp.float32)[None, :], b1.astype(jnp.float32)[None, :],
      w2_q, s2.astype(jnp.float32)[None, :], b2.astype(jnp.float32)[None, :])
