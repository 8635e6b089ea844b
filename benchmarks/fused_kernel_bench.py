"""Isolated slope-timing of the fused serving kernels vs the XLA op sequence
they replace, at the flagship serving shapes (b=2 CFG, n=1280, d=1024).

Decides whether `ops/fused_matmul` should stay in the DiT-block dispatch:
variant (b) exposes the in-graph qkv weight concat cost, (c) the kernel itself.

    python benchmarks/fused_kernel_bench.py
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np


def slope_us(fn, x, reps=32):
    """Per-iteration microseconds via (wall(4R)-wall(R))/3R on an in-jit chain."""
    import jax

    @functools.partial(jax.jit, static_argnames=("r",))
    def loop(x, r):
        def body(i, acc):
            out = fn(acc)
            return (out * 1e-3 + acc * 0.999).astype(acc.dtype)
        return jax.lax.fori_loop(0, r, body, x)

    np.asarray(loop(x, reps).ravel()[:1])
    np.asarray(loop(x, 4 * reps).ravel()[:1])
    t1 = time.perf_counter(); np.asarray(loop(x, reps).ravel()[:1]); t1 = time.perf_counter() - t1
    t4 = time.perf_counter(); np.asarray(loop(x, 4 * reps).ravel()[:1]); t4 = time.perf_counter() - t4
    return (t4 - t1) / (3 * reps) * 1e6


def main():
    import jax
    import jax.numpy as jnp

    from eraxvif5tts_tpu.ops.fused_matmul import ln_mod_matmul, matmul_gate_res

    b, m, k = 2, 1280, 1024
    inner, ff_inner = 1024, 2048
    key = jax.random.key(0)
    ks = jax.random.split(key, 12)
    x = jax.random.normal(ks[0], (b, m, k), jnp.bfloat16)
    scale = 0.1 * jax.random.normal(ks[1], (b, k), jnp.bfloat16)
    shift = 0.1 * jax.random.normal(ks[2], (b, k), jnp.bfloat16)
    wq, wk, wv = (jax.random.normal(kk, (k, inner), jnp.bfloat16) * 0.02
                  for kk in ks[3:6])
    bq = bk = bv = jnp.zeros((inner,), jnp.bfloat16)
    w_packed = jnp.concatenate([wq, wk, wv], axis=1)
    b_packed = jnp.zeros((3 * inner,), jnp.bfloat16)
    w_ff = jax.random.normal(ks[6], (k, ff_inner), jnp.bfloat16) * 0.02
    b_ff = jnp.zeros((ff_inner,), jnp.bfloat16)
    w_out = jax.random.normal(ks[7], (inner, k), jnp.bfloat16) * 0.02
    b_out = jnp.zeros((k,), jnp.bfloat16)
    gate = jax.random.normal(ks[8], (b, k), jnp.bfloat16)
    h = jax.random.normal(ks[9], (b, m, inner), jnp.bfloat16)

    def ln_mod(a):
        a32 = a.astype(jnp.float32)
        mean = a32.mean(-1, keepdims=True)
        var = ((a32 - mean) ** 2).mean(-1, keepdims=True)
        normed = (a32 - mean) * jax.lax.rsqrt(var + 1e-6)
        return (normed * (1 + scale.astype(jnp.float32)[:, None])
                + shift.astype(jnp.float32)[:, None]).astype(a.dtype)

    report = {}

    # --- qkv projection half -------------------------------------------------
    def xla_qkv(a):
        n = ln_mod(a)
        q = n @ wq + bq
        kk_ = n @ wk + bk
        v = n @ wv + bv
        return (q + kk_ + v)[:, :, :k]

    report["qkv_xla_us"] = slope_us(xla_qkv, x)

    def fused_qkv_concat_inside(a):
        wp = jnp.concatenate([wq, wk, wv], axis=1)  # per-iteration concat
        out = ln_mod_matmul(a, scale, shift, wp, b_packed)
        q, kk_, v = jnp.split(out, 3, axis=-1)
        return (q + kk_ + v)[:, :, :k]

    report["qkv_fused_concat_inside_us"] = slope_us(fused_qkv_concat_inside, x)

    def fused_qkv_prepacked(a):
        out = ln_mod_matmul(a, scale, shift, w_packed, b_packed)
        q, kk_, v = jnp.split(out, 3, axis=-1)
        return (q + kk_ + v)[:, :, :k]

    report["qkv_fused_prepacked_us"] = slope_us(fused_qkv_prepacked, x)

    # --- FF input projection half -------------------------------------------
    def xla_ff_in(a):
        n = ln_mod(a)
        return jax.nn.gelu(n @ w_ff + b_ff, approximate=True)[:, :, :k]

    report["ff_in_xla_us"] = slope_us(xla_ff_in, x)
    report["ff_in_fused_us"] = slope_us(
        lambda a: ln_mod_matmul(a, scale, shift, w_ff, b_ff,
                                activation="gelu_tanh")[:, :, :k], x)

    # --- out-projection + gate + residual half ------------------------------
    res = x

    def xla_out(hh):
        out = hh @ w_out + b_out
        return (res + gate[:, None, :] * out)[:, :, :inner]

    report["out_xla_us"] = slope_us(xla_out, h)
    report["out_fused_us"] = slope_us(
        lambda hh: matmul_gate_res(hh, w_out, b_out, gate, res)[:, :, :inner], h)

    for key_ in list(report):
        report[key_] = round(report[key_], 1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
