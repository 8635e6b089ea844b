"""Pallas flash-attention TRAINING kernel with in-kernel dropout.

The reference trains with ``F.scaled_dot_product_attention(..., dropout_p=0.1)``
(reference `src/f5_tts/model/modules.py:490`). The earlier JAX train path
generated the Bernoulli masks with ``jax.random`` at HBM level: the TPU RBG
generator measures 1.3 Gelem/s, and a 9x4096-frame batch needs
b*h*n^2*layers ~= 53 G mask elements per step — ~40 s of PRNG alone (measured
170 s/step end to end). Here the mask is a *position-based counter hash*
computed inside the kernel with a handful of VPU integer ops per element:

    bit(b, h, q, k) = murmur3_fmix(seed ^ mix(b, h) ^ (q * n + k)) < keep * 2^32

Properties that shape the design:
- deterministic in (seed, positions) alone — the backward kernels regenerate
  byte-identical masks with a *different* block layout, so no mask is ever
  stored;
- implementable in plain jnp integer ops — the same function runs inside the
  Mosaic kernel, in interpret mode on CPU, and in the dense test reference
  (tests compare the kernel against a dense implementation using the *same*
  mask, making the dropout path exactly checkable, not just statistically).

Forward: classic flash (online softmax, per-(batch, head, q-block) programs,
k-blocks streamed) storing O and the log-sum-exp L. Backward (custom_vjp):
D = rowsum(dO * O) in XLA, then a dq kernel (grid over q-blocks) and a dkv
kernel (grid over k-blocks), each recomputing P = exp(S - L) and the mask.

Dropout semantics match SDPA: the softmax normalizer uses undropped weights;
the value accumulation uses dropped-and-rescaled weights.

Key padding is a contiguous-prefix valid length per sample (`ops/masks.py
lens_to_mask`), like `ops/serving_attention.py`.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _fmix32(h):
    """murmur3 finalizer — 4 multiplies/xors of avalanche, uint32."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def dropout_keep_mask(seed, b_idx, h_idx, q0, k0, bq, bk, n, keep: float):
    """Boolean keep-mask ``[bq, bk]`` for global positions (q0+i, k0+j).

    Pure jnp (uint32) — usable inside Mosaic kernels, interpret mode, and the
    dense test reference alike. ``seed``/``b_idx``/``h_idx`` are traced or
    python ints; ``q0``/``k0`` block origins.
    """
    # Everything MUST stay uint32: int32 would sign-extend the right shifts in
    # the mixer (q0/b_idx/... arrive as traced int32 program ids in-kernel but
    # as python ints in the dense reference — identical bits only if unsigned).
    u32 = lambda x: jnp.asarray(x).astype(jnp.uint32)  # noqa: E731
    qpos = u32(q0) + jax.lax.broadcasted_iota(jnp.uint32, (bq, bk), 0)
    kpos = u32(k0) + jax.lax.broadcasted_iota(jnp.uint32, (bq, bk), 1)
    ctr = qpos * jnp.uint32(n) + kpos
    salt = (u32(seed) * jnp.uint32(0x9E3779B9)
            + u32(b_idx) * jnp.uint32(0x7FEB352D)
            + u32(h_idx) * jnp.uint32(0x846CA68B))
    bits = _fmix32(ctr ^ salt)
    return bits < jnp.uint32(min(int(keep * 2**32), 2**32 - 1))


def _block(n: int, cap: int = 512) -> int:
    for b in (cap, 384, 256, 128):
        if n % b == 0:
            return b
    return n


def _bwd_default_blocks(n: int) -> tuple[int, int, int, int]:
    """Calibrated backward block layout (bq_dq, bk_dq, bk_dkv, bq_dkv).

    TPU v5e sweep at the training length (benchmarks/train_attn_bwd_sweep.py,
    n=4096 b=9h16d64): dq512x256_dkv512x512 measured 24.1 ms vs the square-512
    default's 25.7 ms (2.01x vs 2.14x forward) — a narrower dq key block keeps
    the dq kernel's K/V tiles smaller in VMEM per inner-loop step. Square
    256 came second (24.6 ms); every dkv deviation measured worse. Only
    proven at long n; short lengths keep the square layout.
    """
    base = _block(n)
    bk_dq = 256 if n >= 2048 and n % 256 == 0 else base
    return base, bk_dq, base, base


# ---------------------------------------------------------------------------
# forward


def _fwd_kernel(seed_ref, lens_ref, q_ref, k_ref, v_ref, o_ref, l_ref,
                *, scale, keep, masked, bk, n):
    bi, hi, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    q = q_ref[0, 0]  # [bq, d]
    bq = q.shape[0]
    q0 = qi * bq
    m = jnp.full((bq, 1), _NEG, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, q.shape[1]), jnp.float32)
    if masked:
        length = lens_ref[pl.program_id(0)]
    for ki in range(n // bk):
        k_blk = k_ref[0, 0, ki]  # [bk, d]
        v_blk = v_ref[0, 0, ki]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [bq, bk]
        if masked:
            kpos = ki * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kpos < length, s, _NEG)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        if keep < 1.0:
            km = dropout_keep_mask(seed_ref[0], bi, hi, q0, ki * bk,
                                   bq, bk, n, keep)
            p_v = jnp.where(km, p * (1.0 / keep), 0.0)
        else:
            p_v = p
        acc = acc * corr + jax.lax.dot_general(
            p_v.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = m_new
    denom = jnp.maximum(l, 1e-30)
    o_ref[0, 0] = (acc * pl.reciprocal(denom, approx=False)).astype(o_ref.dtype)
    # lse is lane-replicated to 128 (Mosaic block tiling needs a 128-wide last
    # dim; same layout as the jax flash kernel's l/m outputs)
    l_ref[0, 0] = jnp.broadcast_to(m + jnp.log(denom), (bq, 128))


# ---------------------------------------------------------------------------
# backward


def _dq_kernel(seed_ref, lens_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
               dq_ref, *, scale, keep, masked, bk, n):
    bi, hi, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    q = q_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, :1]  # [bq, 1] (lane-replicated storage)
    dd = dd_ref[0, 0][:, :1]
    bq = q.shape[0]
    q0 = qi * bq
    dq = jnp.zeros((bq, q.shape[1]), jnp.float32)
    if masked:
        length = lens_ref[pl.program_id(0)]
    for ki in range(n // bk):
        k_blk = k_ref[0, 0, ki]
        v_blk = v_ref[0, 0, ki]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if masked:
            kpos = ki * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kpos < length, s, _NEG)
        p = jnp.exp(s - lse)  # [bq, bk], exact fwd P
        dpd = jax.lax.dot_general(
            do, v_blk.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, bk] = dO V^T
        if keep < 1.0:
            km = dropout_keep_mask(seed_ref[0], bi, hi, q0, ki * bk,
                                   bq, bk, n, keep)
            dp = jnp.where(km, dpd * (1.0 / keep), 0.0)
        else:
            dp = dpd
        ds = p * (dp - dd)  # softmax jacobian w/ rowsum trick
        dq = dq + jax.lax.dot_general(
            ds.astype(k_blk.dtype), k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dq_ref[0, 0] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(seed_ref, lens_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
                dk_ref, dv_ref, acc_ref, *, scale, keep, masked, n, nq):
    """Grid (b, h, k-block, q-block): q/dO/lse/dd stream per q-block while
    dk/dv accumulate in a VMEM scratch across the (sequential) q dimension —
    holding the whole q/do/lse/dd rows per program oversubscribed VMEM at
    n=4096 (scoped limit 16 MB)."""
    bi, hi, ki, qi = (pl.program_id(i) for i in range(4))
    k_blk = k_ref[0, 0]  # [bk, d]
    v_blk = v_ref[0, 0]
    bk = k_blk.shape[0]
    k0 = ki * bk
    q = q_ref[0, 0]  # [bq, d]
    bq = q.shape[0]
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, :1]  # [bq, 1]
    dd = dd_ref[0, 0][:, :1]

    @pl.when(qi == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    s = jax.lax.dot_general(
        q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if masked:
        length = lens_ref[bi]
        kpos = k0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kpos < length, s, _NEG)
    p = jnp.exp(s - lse)
    dpd = jax.lax.dot_general(
        do, v_blk.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if keep < 1.0:
        km = dropout_keep_mask(seed_ref[0], bi, hi, qi * bq, k0, bq, bk, n, keep)
        pd = jnp.where(km, p * (1.0 / keep), 0.0)
        dp = jnp.where(km, dpd * (1.0 / keep), 0.0)
    else:
        pd = p
        dp = dpd
    ds = p * (dp - dd)  # [bq, bk]
    acc_ref[0] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[1] += jax.lax.dot_general(
        pd.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == nq - 1)
    def _flush():
        dk_ref[0, 0] = (acc_ref[0] * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = acc_ref[1].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# host-side plumbing


def _specs_bhnd(bq, d, n, blocked_k=None):
    """BlockSpec for a [b, h, n, d] operand: one (1, 1, bq, d) q-indexed block,
    or the whole k/v row reshaped [b, h, nk, bk, d] when blocked_k is set."""
    if blocked_k is None:
        return pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                            memory_space=pltpu.VMEM)
    nk, bk = blocked_k
    return pl.BlockSpec((1, 1, nk, bk, d), lambda bi, hi, qi: (bi, hi, 0, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _train_attention(q, k, v, lens, seed, keep: float, masked: bool,
                     interpret: bool, bwd_blocks):
    out, _ = _fwd(q, k, v, lens, seed, keep, masked, interpret)
    return out


def _fwd(q, k, v, lens, seed, keep, masked, interpret):
    b, h, n, d = q.shape
    bq = _block(n)
    bk = _block(n)
    grid = (b, h, n // bq)
    kernel = functools.partial(_fwd_kernel, scale=1.0 / math.sqrt(d), keep=keep,
                               masked=masked, bk=bk, n=n)
    kr = k.reshape(b, h, n // bk, bk, d)
    vr = v.reshape(b, h, n // bk, bk, d)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed [1]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lens [b]
            _specs_bhnd(bq, d, n),
            _specs_bhnd(bq, d, n, blocked_k=(n // bk, bk)),
            _specs_bhnd(bq, d, n, blocked_k=(n // bk, bk)),
        ],
        out_specs=[
            _specs_bhnd(bq, d, n),
            pl.BlockSpec((1, 1, bq, 128), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, h, n, 128), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(seed, lens, q, kr, vr)
    return out, lse


def _train_attention_fwd(q, k, v, lens, seed, keep, masked, interpret,
                         bwd_blocks):
    out, lse = _fwd(q, k, v, lens, seed, keep, masked, interpret)
    return out, (q, k, v, lens, seed, out, lse)


def _train_attention_bwd(keep, masked, interpret, bwd_blocks, res, do):
    q, k, v, lens, seed, out, lse = res
    b, h, n, d = q.shape
    # (bq_dq, bk_dq, bk_dkv, bq_dkv) override — the sweep harness' knob
    # (benchmarks/train_attn_bwd_sweep.py); default = calibrated _block(n).
    # The position-hash dropout mask depends only on absolute positions, so
    # any valid block layout reproduces byte-identical masks (module docstring).
    if bwd_blocks is not None:
        bq_dq, bk_dq, bk_dkv, bq_dkv = bwd_blocks
        for blk in bwd_blocks:
            assert n % blk == 0, (n, bwd_blocks)
    else:
        bq_dq, bk_dq, bk_dkv, bq_dkv = _bwd_default_blocks(n)
    bq = bq_dq
    bk = bk_dq
    scale = 1.0 / math.sqrt(d)
    # D_q = rowsum(dO * O): cheap elementwise in XLA, lane-replicated to match
    # the lse storage layout
    dd = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    dd = jnp.broadcast_to(dd[..., None], (b, h, n, 128))

    l_spec = pl.BlockSpec((1, 1, bq, 128), lambda bi, hi, qi: (bi, hi, qi, 0),
                          memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, keep=keep, masked=masked,
                          bk=bk, n=n),
        grid=(b, h, n // bq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _specs_bhnd(bq, d, n),
            _specs_bhnd(bq, d, n, blocked_k=(n // bk, bk)),
            _specs_bhnd(bq, d, n, blocked_k=(n // bk, bk)),
            _specs_bhnd(bq, d, n),   # dO
            l_spec,                  # lse
            l_spec,                  # dd
        ],
        out_specs=_specs_bhnd(bq, d, n),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(seed, lens, q, k.reshape(b, h, n // bk, bk, d),
      v.reshape(b, h, n // bk, bk, d), do, lse, dd)

    bq, bk = bq_dkv, bk_dkv
    kv_spec = pl.BlockSpec((1, 1, bk, d), lambda bi, hi, ki, qi: (bi, hi, ki, 0),
                           memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, 1, bq, d), lambda bi, hi, ki, qi: (bi, hi, qi, 0),
                          memory_space=pltpu.VMEM)
    lq_spec = pl.BlockSpec((1, 1, bq, 128), lambda bi, hi, ki, qi: (bi, hi, qi, 0),
                           memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, keep=keep, masked=masked,
                          n=n, nq=n // bq),
        grid=(b, h, n // bk, n // bq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            q_spec,
            kv_spec,
            kv_spec,
            q_spec,    # dO blocked like q
            lq_spec,   # lse
            lq_spec,   # dd
        ],
        out_specs=[kv_spec, kv_spec],
        out_shape=[jax.ShapeDtypeStruct(k.shape[:2] + (n, d), k.dtype),
                   jax.ShapeDtypeStruct(v.shape[:2] + (n, d), v.dtype)],
        scratch_shapes=[pltpu.VMEM((2, bk, d), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary", "arbitrary"),
        ),
    )(seed, lens, q, k, v, do, lse, dd)
    return dq, dk, dv, None, None


_train_attention.defvjp(_train_attention_fwd, _train_attention_bwd)


def can_use_train_kernel(n: int, d: int, dtype=None) -> bool:
    """Shape/dtype gate for the flash train kernel.

    The forward kernel unrolls its k-loop (n//bk iterations), so its Mosaic
    VMEM stack grows with n and with the operand itemsize: measured on v5e at
    n=4096 d=64, float32 operands demand 21.2 MB scoped VMEM vs the 16 MB
    limit (compile failure), while bfloat16 fits. Production training runs
    bfloat16 compute (`configs.ModelConfig.compute_dtype`); float32 callers
    are gated to n<=3072 (= 4096 * 16/21.2, rounded down to a block multiple)
    and fall back to the chunked online-softmax path above that.
    """
    if not (n % 128 == 0 and n >= 128 and d in (64, 128)):
        return False
    if dtype is not None and jnp.dtype(dtype).itemsize >= 4 and n > 3072:
        return False
    return True


def train_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_valid: jnp.ndarray | None = None,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    interpret: bool = False,
    bwd_blocks: tuple[int, int, int, int] | None = None,
) -> jnp.ndarray:
    """Differentiable flash attention with in-kernel dropout.

    ``q/k/v: [b, n, h, d]``; ``key_valid [b, n]`` must be a contiguous prefix
    mask. ``dropout_rng`` seeds the position-hash mask (folded to one int32).
    ``bwd_blocks=(bq_dq, bk_dq, bk_dkv, bq_dkv)`` overrides the backward
    kernels' block shapes (each must divide n); None = calibrated default.
    """
    b, n, h, d = q.shape
    assert can_use_train_kernel(n, d, q.dtype), (n, d, q.dtype)
    keep = 1.0 - dropout_rate
    if dropout_rate > 0.0:
        assert dropout_rng is not None
        kd = jax.random.key_data(dropout_rng).reshape(-1)
        # mix both 32-bit key words through independent fmix rounds so the
        # full 64-bit key space spreads over the 32-bit kernel seed (a plain
        # xor aliases keys differing symmetrically in both words)
        seed = (
            _fmix32(kd[0].astype(jnp.uint32))
            ^ _fmix32(kd[-1].astype(jnp.uint32) + jnp.uint32(0x9E3779B9))
        )[None].astype(jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    masked = key_valid is not None
    if masked:
        lens = jnp.sum(key_valid.astype(jnp.int32), axis=-1)
    else:
        lens = jnp.full((b,), n, jnp.int32)
    qt, kt, vt = (t.swapaxes(1, 2) for t in (q, k, v))
    out = _train_attention(qt, kt, vt, lens, seed, keep, masked, interpret,
                           bwd_blocks)
    return out.swapaxes(1, 2)


def dense_reference(q, k, v, key_valid=None, dropout_rate=0.0, seed=0):
    """Dense attention using the SAME position-hash dropout mask as the kernel —
    the exact-comparison oracle for tests. ``q/k/v: [b, n, h, d]``."""
    b, n, h, d = q.shape
    scale = 1.0 / math.sqrt(d)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if key_valid is not None:
        s = jnp.where(key_valid[:, None, None, :], s, _NEG)
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0:
        keep = 1.0 - dropout_rate
        masks = []
        for bi in range(b):
            per_h = [dropout_keep_mask(seed, bi, hi, 0, 0, n, n, n, keep)
                     for hi in range(h)]
            masks.append(jnp.stack(per_h))
        km = jnp.stack(masks)  # [b, h, n, n]
        p = jnp.where(km, p / keep, 0.0)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)
