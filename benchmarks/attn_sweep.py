"""Sweep attention kernel configurations on the real TPU at the serving shapes.

Chains reps calls inside one jit (out feeds the next q) so per-call latency is
measured without tunnel RTT. Prints one JSON line per config.

    python benchmarks/attn_sweep.py --n 1024 --reps 64
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--h", type=int, default=16)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--reps", type=int, default=64)
    ap.add_argument("--masked", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from eraxvif5tts_tpu.ops.rotary import rotary_freqs
    from eraxvif5tts_tpu.ops.serving_attention import serving_attention

    b, n, h, d = args.b, args.n, args.h, args.d
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (b, n, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, n, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, n, h, d), jnp.bfloat16)
    lens = jnp.asarray([n if i % 2 == 0 else n - 128 for i in range(b)], jnp.int32)
    key_valid = jnp.arange(n)[None, :] < lens[:, None]
    rope = rotary_freqs(n, d)
    flops = 4 * b * h * n * n * d

    def timeit(fn):
        """Slope timing: wall(4R) - wall(R) over 3R calls — cancels the fixed
        per-dispatch cost (tunnel RTT ~27 ms dwarfs a single kernel call)."""
        @functools.partial(jax.jit, static_argnames=("reps",))
        def loop(q, k, v, reps):
            def body(i, acc):
                return fn(acc, k, v).astype(acc.dtype)
            return jax.lax.fori_loop(0, reps, body, q)

        r = args.reps

        def wall(reps):
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(loop(q, k, v, reps).ravel()[:1])
            return (time.perf_counter() - t0) / 3

        try:
            np.asarray(loop(q, k, v, r).ravel()[:1])      # compile R
            np.asarray(loop(q, k, v, 4 * r).ravel()[:1])  # compile 4R
        except Exception as e:  # noqa: BLE001
            return None, str(e).splitlines()[0][:100]
        us = (wall(4 * r) - wall(r)) / (3 * r) * 1e6
        return us, None

    results = {}

    def record(name, fn):
        us, err = timeit(fn)
        if us is None:
            print(json.dumps({"config": name, "error": err}), flush=True)
        else:
            results[name] = us
            print(json.dumps({"config": name, "us": round(us, 1),
                              "tflops": round(flops / us / 1e6, 1)}), flush=True)

    kv_mask = key_valid if args.masked else None
    lens_arg = lens if args.masked else None

    # --- generic pallas flash, block sweep ---------------------------------
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention,
    )

    seg = jnp.where(key_valid, 1, 2).astype(jnp.int32) if args.masked else None

    def flash(bq_, bk_):
        def run(q, k, v):
            qt, kt, vt = (t.swapaxes(1, 2) for t in (q, k, v))
            sids = SegmentIds(q=seg, kv=seg) if seg is not None else None
            o = flash_attention(
                qt, kt, vt, segment_ids=sids, causal=False,
                sm_scale=float(1.0 / d ** 0.5),
                block_sizes=BlockSizes(block_q=bq_, block_k_major=bk_,
                                       block_k=bk_, block_b=1),
            )
            return o.swapaxes(1, 2)
        return run

    for bq_, bk_ in ((512, 1024), (1024, 1024), (256, 1024), (512, 512)):
        if bq_ <= n and bk_ <= n:
            record(f"flash_q{bq_}_k{bk_}", flash(bq_, bk_))

    # --- XLA fused --------------------------------------------------------
    record("xla_fused", lambda q, k, v: jax.nn.dot_product_attention(
        q, k, v, mask=kv_mask[:, None, None, :] if args.masked else None))

    # --- serving kernel variants ------------------------------------------
    def serving(variant, blocks, roped):
        def run(q, k, v):
            return serving_attention(q, k, v, lens_arg,
                                     rope=rope if roped else None,
                                     variant=variant, blocks=blocks)
        return run

    record("batched_auto", serving("batched", None, False))
    # every 128-multiple q block that divides n, plus the one-shot bq=n (which
    # needs no divisor) — at 64-only-aligned n (1088, 1152) the divisor set is
    # sparse (e.g. 1152 -> 128/384), so the one-shot fat block competes with
    # skinny divisors rather than with n/2
    bq_cands = sorted({bq_ for bq_ in range(128, n + 1, 128) if n % bq_ == 0}
                      | {n}, reverse=True)
    for hb in (h, h // 2, h // 4):
        if not hb:
            continue
        for bq_ in bq_cands:
            record(f"headloop_h{hb}_q{bq_}", serving("headloop", (hb, bq_), False))
    best = min((kk_ for kk_ in results if kk_.startswith("headloop")),
               key=lambda kk_: results[kk_], default=None)
    if best:
        _, hb_s, bq_s = best.split("_")
        blocks_best = (int(hb_s[1:]), int(bq_s[1:]))
        record(best + "_rope", serving("headloop", blocks_best, True))
        # vectorized whole-block rotation before the head loop (+VMEM for two
        # rotated block copies; may fail to compile at fat blocks)
        record(best + "_rope_pre", serving("headloop_pre", blocks_best, True))
        hb_half = blocks_best[0] // 2
        if hb_half and h % hb_half == 0:
            record(f"headloop_h{hb_half}_q{blocks_best[1]}_rope_pre",
                   serving("headloop_pre", (hb_half, blocks_best[1]), True))

        # rope OUTSIDE the kernel (XLA elementwise on [b,n,h,d]) + unroped
        # kernel — the fused in-kernel rotary re-rotates K/V once per head-grid
        # program, so at one-shot blocks with h/hb programs it can cost more
        # than the dumb way
        from eraxvif5tts_tpu.ops.rotary import apply_rotary

        def rope_outside(q, k, v):
            qr = apply_rotary(q.swapaxes(1, 2), rope).swapaxes(1, 2).astype(q.dtype)
            kr = apply_rotary(k.swapaxes(1, 2), rope).swapaxes(1, 2).astype(k.dtype)
            return serving_attention(qr, kr, v, lens_arg, rope=None,
                                     variant="headloop", blocks=blocks_best)

        record(best + "_rope_outside", rope_outside)
        # rotary alone, to attribute the delta
        record("rotary_alone", lambda q, k, v: apply_rotary(
            q.swapaxes(1, 2), rope).swapaxes(1, 2).astype(q.dtype) + v * 0)

    print(json.dumps({k_: round(v_, 1) for k_, v_ in
                      sorted(results.items(), key=lambda kv_: kv_[1])}))


if __name__ == "__main__":
    main()
