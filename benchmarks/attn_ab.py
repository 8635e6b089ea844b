"""Paired A/B timing of serving-attention variants at one shape.

The tunnel-attached v5e's effective throughput DRIFTS by tens of percent over
minutes (round-4 observation: the same headloop config measured 131 us and
198 us in sweeps half an hour apart), so sequential per-config sweeps
(`attn_sweep.py`) cannot resolve 10-20%% deltas across configs. This harness
compiles every candidate ONCE, then interleaves slope-timed rounds
A,B,...,A,B,... and reports per-round numbers plus the paired median of
ratios — drift hits adjacent measurements equally and cancels in the pair.

    python benchmarks/attn_ab.py --n 1152 --rounds 6 \
        --config headloop:rope --config headloop_pre:rope
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1152)
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--h", type=int, default=16)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--reps", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--config", action="append", default=None,
                    help="variant[:rope][:hb,bq] — repeatable; default compares "
                         "headloop:rope vs headloop_pre:rope at auto blocks")
    args = ap.parse_args()
    configs = args.config or ["headloop:rope", "headloop_pre:rope"]

    import jax
    import jax.numpy as jnp

    from eraxvif5tts_tpu.ops.rotary import rotary_freqs
    from eraxvif5tts_tpu.ops.serving_attention import serving_attention

    b, n, h, d = args.b, args.n, args.h, args.d
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (b, n, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, n, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, n, h, d), jnp.bfloat16)
    lens = jnp.asarray([n if i % 2 == 0 else n - 128 for i in range(b)],
                       jnp.int32)
    rope = rotary_freqs(n, d)
    flops = 4 * b * h * n * n * d

    def build(spec: str):
        parts = spec.split(":")
        variant = parts[0]
        roped = "rope" in parts[1:]
        blocks = None
        for p in parts[1:]:
            if "," in p:
                hb_s, bq_s = p.split(",")
                blocks = (int(hb_s), int(bq_s))

        def fn(acc, k_, v_):
            return serving_attention(
                acc, k_, v_, lens, rope=rope if roped else None,
                variant=variant, blocks=blocks).astype(acc.dtype)

        @functools.partial(jax.jit, static_argnames=("reps",))
        def loop(q_, k_, v_, reps):
            return jax.lax.fori_loop(0, reps, lambda i, a: fn(a, k_, v_), q_)

        return loop

    loops = {spec: build(spec) for spec in configs}
    r = args.reps

    # compile both rep counts for every config BEFORE any timing
    for spec, loop in loops.items():
        np.asarray(loop(q, k, v, r).ravel()[:1])
        np.asarray(loop(q, k, v, 4 * r).ravel()[:1])
        print(json.dumps({"compiled": spec}), flush=True)

    per_round: dict[str, list[float]] = {spec: [] for spec in configs}
    for rnd in range(args.rounds):
        for spec, loop in loops.items():
            t0 = time.perf_counter()
            for _ in range(2):
                np.asarray(loop(q, k, v, r).ravel()[:1])
            w1 = (time.perf_counter() - t0) / 2
            t0 = time.perf_counter()
            for _ in range(2):
                np.asarray(loop(q, k, v, 4 * r).ravel()[:1])
            w4 = (time.perf_counter() - t0) / 2
            us = (w4 - w1) / (3 * r) * 1e6
            per_round[spec].append(us)
        print(json.dumps({"round": rnd, **{s: round(per_round[s][-1], 1)
                                           for s in configs}}), flush=True)

    base = configs[0]
    out = {"shape": f"b{b}_n{n}_h{h}_d{d}",
           "rounds": {s: [round(x, 1) for x in per_round[s]] for s in configs}}
    for s in configs:
        med = float(np.median(per_round[s]))
        out[s] = {"median_us": round(med, 1),
                  "tflops": round(flops / med / 1e6, 1)}
        if s != base:
            ratios = [a / bse for a, bse in zip(per_round[s], per_round[base])]
            out[s]["paired_ratio_vs_" + base] = round(float(np.median(ratios)), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
