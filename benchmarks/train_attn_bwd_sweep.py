"""Sweep the train-attention BACKWARD block shapes at the training length
(n=4096) on the real TPU — VERDICT round-4 task 6.

The round-4 training-budget closure identified the flash dq/dkv kernels at
n=4096 as 0.19 s/step (backward = 3.42x forward vs a 3.0x remat-adjusted
ceiling, BASELINE.md). The forward kernel's blocks got a measured sweep; the
backward never did — `ops/train_attention._block(n)` hardwires 512. This
harness slope-times value_and_grad of the kernel per (bq_dq, bk_dq, bk_dkv,
bq_dkv) config via the new ``bwd_blocks`` override.

Methodology: reps chained inside one jit (grad feeds the next q) so per-call
latency excludes the tunnel RTT; slope = (wall(4R)-wall(R))/3R. Configs that
fail to compile (scoped-vmem) are recorded as errors, not crashes.

    python benchmarks/train_attn_bwd_sweep.py --n 4096 --b 9 --reps 8
"""

from __future__ import annotations

import argparse
import functools
import itertools
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--b", type=int, default=9)
    ap.add_argument("--h", type=int, default=16)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--blocks", type=int, nargs="+", default=[256, 512, 1024],
                    help="candidate block sizes (each must divide n)")
    ap.add_argument("--full-grid", action="store_true",
                    help="sweep all 4-tuples instead of the paired "
                         "(dq)=(dkv) diagonal + single-knob deviations")
    ap.add_argument("--configs", nargs="+", default=None,
                    help="explicit bq_dq,bk_dq,bk_dkv,bq_dkv quadruples "
                         "(comma-separated); replaces the generated grid")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from eraxvif5tts_tpu.ops.train_attention import train_attention

    b, n, h, d = args.b, args.n, args.h, args.d
    kq, kk, kv_ = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (b, n, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, n, h, d), jnp.bfloat16)
    v = jax.random.normal(kv_, (b, n, h, d), jnp.bfloat16)
    lens = jnp.asarray([n - 128 * (i % 3) for i in range(b)], jnp.int32)
    key_valid = jnp.arange(n)[None, :] < lens[:, None]
    rng = jax.random.key(7)
    # fwd 2 matmuls + bwd 4 (dq: ds@q + p recompute etc. — count the canonical
    # 2 fwd + 5 bwd MACs? use 4*bhn^2d fwd-equivalent for comparability with
    # BASELINE's attention accounting: report raw us and x_forward instead)
    fwd_flops = 4 * b * h * n * n * d

    def timeit(step):
        @functools.partial(jax.jit, static_argnames=("reps",))
        def loop(q, reps):
            def body(i, acc):
                return step(acc)
            return jax.lax.fori_loop(0, reps, body, q)

        r = args.reps

        def wall(reps):
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(loop(q, reps).ravel()[:1])
            return (time.perf_counter() - t0) / 3

        try:
            np.asarray(loop(q, r).ravel()[:1])
            np.asarray(loop(q, 4 * r).ravel()[:1])
        except Exception as e:  # noqa: BLE001
            return None, str(e).splitlines()[0][:120]
        us = (wall(4 * r) - wall(r)) / (3 * r) * 1e6
        return us, None

    def fwd_only_step(q_):
        o = train_attention(q_, k, v, key_valid=key_valid,
                            dropout_rate=args.dropout, dropout_rng=rng)
        return (q_ + 1e-6 * o).astype(q_.dtype)

    def grad_step(cfg):
        def step(q_):
            def loss(qq):
                o = train_attention(qq, k, v, key_valid=key_valid,
                                    dropout_rate=args.dropout, dropout_rng=rng,
                                    bwd_blocks=cfg)
                return jnp.sum(o.astype(jnp.float32) ** 2)
            g = jax.grad(loss)(q_)
            return (q_ + 1e-6 * g).astype(q_.dtype)
        return step

    fwd_us, err = timeit(fwd_only_step)
    print(json.dumps({"config": "fwd_only", "us": round(fwd_us or -1, 1),
                      "tflops": round(fwd_flops / fwd_us / 1e6, 1) if fwd_us else None,
                      "error": err}), flush=True)

    cands = [blk for blk in args.blocks if n % blk == 0]
    if args.configs:
        grid = [tuple(int(x) for x in c.split(",")) for c in args.configs]
    elif args.full_grid:
        grid = list(itertools.product(cands, repeat=4))
    else:
        grid = [(x, x, x, x) for x in cands]
        base = 512 if 512 in cands else cands[0]
        for i in range(4):
            for x in cands:
                cfg = [base] * 4
                cfg[i] = x
                if tuple(cfg) not in grid:
                    grid.append(tuple(cfg))
    grid = [None] + grid  # None = current production default

    best = (None, float("inf"))
    for cfg in grid:
        us, err = timeit(grad_step(cfg))
        name = "default" if cfg is None else "dq{}x{}_dkv{}x{}".format(*cfg)
        row = {"config": name, "us": round(us, 1) if us else None,
               "x_forward": round(us / fwd_us, 2) if us and fwd_us else None,
               "error": err}
        print(json.dumps(row), flush=True)
        if us is not None and us < best[1]:
            best = (name, us)
    print(json.dumps({"metric": "train_attn_bwd_best", "config": best[0],
                      "us": round(best[1], 1),
                      "x_forward": round(best[1] / fwd_us, 2) if fwd_us else None,
                      "n": n, "b": b}))


if __name__ == "__main__":
    main()
