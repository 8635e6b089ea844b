"""Serving-path fused matmul kernels: fold the DiT block's elementwise passes
(AdaLN modulate, gate multiply, residual add) into the projections around them.

Motivation (BASELINE.md MFU analysis): at serving shapes the forward runs ~10.6 ms
against a ~7.5-8 ms matmul speed-of-light; the residual is HBM round-trips of the
elementwise glue between matmuls — LN writes [b,n,d] which qkv re-reads, attention
output + x + gate makes three reads/one write, same again for the FF half
(reference computes the same algebra as separate torch ops,
`src/f5_tts/model/modules.py:610-641`). Two Pallas kernels remove every standalone
elementwise pass in a DiT block:

- ``ln_mod_matmul``: ``act((LN(x) * (1 + scale) + shift) @ w + bias)`` — the
  AdaLN-zero prologue fused into the next projection. Used for the packed
  q|k|v projection (one N=3*inner matmul instead of three reads of the normed
  tensor) and for the FF input projection (with tanh-GELU epilogue).
- ``matmul_gate_res``: ``res + gate * (h @ w + bias)`` — the AdaLN-zero gated
  residual fused into the preceding projection (attention out-projection and FF
  output projection). Optionally masks rows ``>= lens`` so padded positions get
  ``res`` unchanged (parity with the XLA path's ``where(mask, out, 0)``).

Hardware ablation (`benchmarks/fused_kernel_bench.py`, b=2 n=1280 d=1024
serving shapes, slope-timed): only the FF input projection wins —
``ff_in`` XLA 69.3 us -> fused 21.0 us (3.3x). The packed q|k|v fusion LOSES
(XLA 43.4 us vs fused 106.5 us pre-packed, 156.9 us with the per-call weight
concat), and ``matmul_gate_res`` loses to XLA's own epilogue fusion of
gate+residual into the matmul (4.1 us vs 21.8 us). `DiTBlock` therefore
dispatches ONLY the FF input projection to `ln_mod_matmul`
(`dit_block_fusion_ok`); the rest of this module's surface stays available
(and exact-tested) for other shapes. End-to-end effect on `bench.py` RTF
(real v5e): 25.9x unfused -> 23.9x all-fused -> 26.4x ff_in-only.

Grid layout: ``(B, N/bn)`` with the n dimension innermost ("arbitrary"), so the
``[M, K]`` input block has a constant index across n steps — Mosaic keeps it
VMEM-resident and it is read from HBM once per batch row. The LN+modulate result
is computed once per batch row (at n-step 0) into a bf16 scratch and reused for
every weight column block: LN stats run in fp32 (same policy as flax LayerNorm
with bf16 compute), the modulated activation is bf16 into the MXU, accumulation
is fp32.

VMEM per program ≈ ``M*K*(x bytes) + M*K*2 (scratch) + 2*K*bn*2 (w double-buffer)
+ M*bn*(2+4)`` — the `_fits_vmem` gate keeps this under the ~14 MB budget that
`ops/serving_attention.py` calibrated for this chip generation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is absent on CPU-only installs
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

_VMEM_BUDGET = 14 * 1024 * 1024


def _gelu_tanh(x):
    # tanh-approximated GELU, matching nn.gelu(approximate=True)
    c = jnp.sqrt(2.0 / jnp.pi).astype(x.dtype)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _ln_mod_kernel(x_ref, scale_ref, shift_ref, w_ref, b_ref, o_ref,
                   normed_ref, *, activation: Optional[str], eps: float,
                   norm: str):
    nj = pl.program_id(1)

    @pl.when(nj == 0)
    def _compute_ln():
        x = x_ref[0].astype(jnp.float32)  # [M, K]
        if norm == "rms":
            # x_transformers RMSNorm (UNetT): no mean subtraction; the
            # sqrt(d)*g factor folds into `scale` at the call site
            centered = x
        else:
            mean = jnp.mean(x, axis=-1, keepdims=True)
            centered = x - mean
        var = jnp.mean(centered * centered, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        scale = scale_ref[0].astype(jnp.float32)  # [1, K]
        shift = shift_ref[0].astype(jnp.float32)
        normed_ref[:] = (centered * (rstd * (1.0 + scale)) + shift).astype(
            normed_ref.dtype)

    acc = jnp.dot(normed_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    if activation == "gelu_tanh":
        acc = _gelu_tanh(acc)
    elif activation is not None:  # pragma: no cover
        raise ValueError(f"unknown activation {activation!r}")
    o_ref[0] = acc.astype(o_ref.dtype)


def _gate_res_kernel(h_ref, w_ref, b_ref, gate_ref, res_ref, lens_ref, o_ref,
                     *, mask_rows: bool):
    acc = jnp.dot(h_ref[0], w_ref[:], preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    gate = gate_ref[0].astype(jnp.float32)  # [1, bn]
    update = gate * acc
    if mask_rows:
        bi = pl.program_id(0)
        m = h_ref.shape[1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        update = jnp.where(rows < lens_ref[bi], update, 0.0)
    o_ref[0] = (res_ref[0].astype(jnp.float32) + update).astype(o_ref.dtype)


def _pick_bn(n: int, m: int, k: int, itemsize: int) -> Optional[int]:
    """Largest 128-multiple column block whose working set fits the budget."""
    for bn in (768, 512, 384, 256, 128):
        if n % bn:
            continue
        vmem = (m * k * itemsize          # resident input block
                + m * k * 2               # bf16 normed scratch (ln_mod only)
                + 2 * k * bn * itemsize   # double-buffered weight block
                + m * bn * (itemsize + 4 + itemsize))  # out + fp32 acc + res
        if vmem <= _VMEM_BUDGET:
            return bn
    return None


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def use_fused_serving(m: int, k: int, n: int, dtype) -> bool:
    """Shape gate: 128-aligned, bf16, fits the VMEM model, running on TPU."""
    if (pltpu is None or not _on_tpu()) and not _FORCE_FOR_TESTS:
        return False
    if dtype != jnp.bfloat16 and not _FORCE_FOR_TESTS:
        return False
    if m % 8 or k % 128 or n % 128:
        return False
    return _pick_bn(n, m, k, 2) is not None


# Test hook: lets CPU tests (interpret mode) exercise the fused block path.
_FORCE_FOR_TESTS = False


def dit_block_fusion_ok(n: int, dim: int, inner: int, ff_inner: int,
                        dtype) -> bool:
    """Gate for DiTBlock's fused dispatch. Only the FF input projection
    (K=dim, N=ff_inner) is hand-fused — the measured winner; see the module
    docstring's hardware ablation for why qkv and the out-projections stay
    with XLA."""
    del inner  # qkv/out-projection fusion measured slower than XLA; not used
    return use_fused_serving(n, dim, ff_inner, dtype)


def _ln_mod_reference(x, scale, shift, w, bias, activation, eps, norm="ln"):
    """jnp surrogate with the kernel's semantics (fp32 LN statistics, matmul in
    x.dtype with fp32 accumulation) — the differentiation path behind
    :func:`ln_mod_matmul`'s custom_jvp. The pallas kernel has no JVP rule;
    frozen-teacher forwards (training/distill.py) and grad-over-deterministic
    callers trace differentiation through the fused serving branch, where this
    graph is either DCE'd (zero tangents) or supplies a correct tangent."""
    xf = x.astype(jnp.float32)
    if norm == "rms":
        centered = xf
    else:
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        centered = xf - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    normed = (centered * (rstd * (1.0 + scale[:, None, :].astype(jnp.float32)))
              + shift[:, None, :].astype(jnp.float32)).astype(x.dtype)
    acc = jnp.einsum("bmk,kn->bmn", normed, w,
                     preferred_element_type=jnp.float32)
    acc = acc + bias[None, None, :].astype(jnp.float32)
    if activation == "gelu_tanh":
        acc = _gelu_tanh(acc)
    return acc.astype(x.dtype)


@functools.partial(jax.custom_jvp, nondiff_argnums=(5, 6, 7, 8))
def _ln_mod_matmul(x, scale, shift, w, bias, activation, eps, interpret,
                   norm="ln"):
    bsz, m, k = x.shape
    n = w.shape[1]
    bn = _pick_bn(n, m, k, x.dtype.itemsize)
    if bn is None:
        raise ValueError(
            f"ln_mod_matmul: no VMEM-feasible output block for shape "
            f"[{bsz},{m},{k}]x[{k},{n}] — gate callers with use_fused_serving()")
    grid = (bsz, n // bn)
    kernel = functools.partial(_ln_mod_kernel, activation=activation, eps=eps,
                               norm=norm)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, m, k), lambda bi, nj: (bi, 0, 0)),
            pl.BlockSpec((1, 1, k), lambda bi, nj: (bi, 0, 0)),
            pl.BlockSpec((1, 1, k), lambda bi, nj: (bi, 0, 0)),
            pl.BlockSpec((k, bn), lambda bi, nj: (0, nj)),
            pl.BlockSpec((1, bn), lambda bi, nj: (0, nj)),
        ],
        out_specs=pl.BlockSpec((1, m, bn), lambda bi, nj: (bi, 0, nj)),
        out_shape=jax.ShapeDtypeStruct((bsz, m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, k), x.dtype)] if pltpu else [],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ) if pltpu else None,
        interpret=interpret,
    )(x, scale[:, None, :], shift[:, None, :], w, bias[None, :])


@_ln_mod_matmul.defjvp
def _ln_mod_matmul_jvp(activation, eps, interpret, norm, primals, tangents):
    out = _ln_mod_matmul(*primals, activation, eps, interpret, norm)
    zero = jax.custom_derivatives.SymbolicZero
    tans = tuple(jnp.zeros_like(p) if isinstance(t, zero) else t.astype(p.dtype)
                 for p, t in zip(primals, tangents))
    _, tangent = jax.jvp(
        lambda *p: _ln_mod_reference(*p, activation, eps, norm), tuple(primals),
        tans)
    return out, tangent


@functools.partial(jax.jit,
                   static_argnames=("activation", "eps", "interpret", "norm"))
def ln_mod_matmul(x: jnp.ndarray, scale: jnp.ndarray, shift: jnp.ndarray,
                  w: jnp.ndarray, bias: jnp.ndarray,
                  activation: Optional[str] = None, eps: float = 1e-6,
                  interpret: Optional[bool] = None,
                  norm: str = "ln") -> jnp.ndarray:
    """``act((norm(x) * (1 + scale) + shift) @ w + bias)`` per batch row.

    x ``[B, M, K]``; scale/shift ``[B, K]`` (AdaLN modulation vectors); w
    ``[K, N]``; bias ``[N]``. ``norm="ln"`` is scale/bias-free layernorm over K
    with fp32 statistics; ``norm="rms"`` skips the mean subtraction
    (x_transformers RMSNorm as used by UNetT — fold the ``sqrt(d)*g`` factor
    into ``scale`` as ``g*sqrt(d)/sqrt(d) - 1 = g - 1`` since rsqrt(mean(x^2))
    already carries the 1/sqrt(d)). Returns ``[B, M, N]`` in x.dtype.
    Differentiable via a reference-implementation custom_jvp (same pattern as
    serving_attention).
    """
    if interpret is None:
        interpret = not _on_tpu()
    return _ln_mod_matmul(x, scale, shift, w, bias, activation, eps, interpret,
                          norm)


@functools.partial(jax.jit, static_argnames=("mask_rows", "interpret"))
def matmul_gate_res(h: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray,
                    gate: jnp.ndarray, res: jnp.ndarray,
                    lens: Optional[jnp.ndarray] = None,
                    mask_rows: bool = False,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """``res + gate * (h @ w + bias)``, with rows ``>= lens[b]`` left as ``res``
    when ``mask_rows`` (parity with the unfused path's masked attention output).

    h ``[B, M, K]``; w ``[K, N]``; bias ``[N]``; gate ``[B, N]``; res
    ``[B, M, N]``; lens ``[B]`` int32 (required iff mask_rows).
    """
    if interpret is None:
        interpret = not _on_tpu()
    bsz, m, k = h.shape
    n = w.shape[1]
    bn = _pick_bn(n, m, k, h.dtype.itemsize)
    if bn is None:
        raise ValueError(
            f"matmul_gate_res: no VMEM-feasible output block for shape "
            f"[{bsz},{m},{k}]x[{k},{n}] — gate callers with use_fused_serving()")
    if lens is None:
        lens = jnp.full((bsz,), m, jnp.int32)
    grid = (bsz, n // bn)
    kernel = functools.partial(_gate_res_kernel, mask_rows=mask_rows)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, m, k), lambda bi, nj: (bi, 0, 0)),
            pl.BlockSpec((k, bn), lambda bi, nj: (0, nj)),
            pl.BlockSpec((1, bn), lambda bi, nj: (0, nj)),
            pl.BlockSpec((1, 1, bn), lambda bi, nj: (bi, 0, nj)),
            pl.BlockSpec((1, m, bn), lambda bi, nj: (bi, 0, nj)),
            pl.BlockSpec(memory_space=pltpu.SMEM) if pltpu
            else pl.BlockSpec((bsz,), lambda bi, nj: (0,)),
        ],
        out_specs=pl.BlockSpec((1, m, bn), lambda bi, nj: (bi, 0, nj)),
        out_shape=jax.ShapeDtypeStruct((bsz, m, n), h.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ) if pltpu else None,
        interpret=interpret,
    )(h, w, bias[None, :], gate[:, None, :], res, lens.astype(jnp.int32))
