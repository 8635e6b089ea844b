"""Validate + time the serving-attention kernel at every 64-only-aligned
duration bucket (n % 128 == 64) on real hardware.

The 64-step bucket ladder (`infer/utils.DURATION_BUCKETS`) relies on the
one-shot fat-q block compiling under Mosaic at sequence lengths that are only
64-aligned — interpret-mode tests validate the math, this probe validates the
Mosaic layouts and measures the kernel (slope timing; CLAUDE.md: per-dispatch
RTT through the axon tunnel makes naive timing meaningless).

Prints one line per bucket: n, blocks, max |err| vs the rotate-then-attend
reference, and slope-timed us/call at flagship shape (b=2 h=16 d=64).
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from eraxvif5tts_tpu.infer.utils import DURATION_BUCKETS
    from eraxvif5tts_tpu.ops.rotary import apply_rotary, rotary_freqs
    from eraxvif5tts_tpu.ops.serving_attention import (
        _headloop_blocks,
        serving_attention,
    )

    b, h, d = 2, 16, 64
    odd = [n for n in DURATION_BUCKETS if n % 128 == 64]
    print(f"64-only buckets: {odd}")
    for n in odd:
        k1, k2, k3 = jax.random.split(jax.random.key(n), 3)
        q = jax.random.normal(k1, (b, n, h, d), jnp.bfloat16)
        k = jax.random.normal(k2, (b, n, h, d), jnp.bfloat16)
        v = jax.random.normal(k3, (b, n, h, d), jnp.bfloat16)
        lens = jnp.asarray([n, n - 53])
        rope = rotary_freqs(n, d)
        blocks = _headloop_blocks(n, h, d)

        qr = apply_rotary(q.swapaxes(1, 2), rope).swapaxes(1, 2)
        kr = apply_rotary(k.swapaxes(1, 2), rope).swapaxes(1, 2)
        ref = jax.jit(lambda q_, k_, v_: jnp.einsum(
            "bhqk,bkhd->bqhd",
            jax.nn.softmax(
                jnp.where(
                    (jnp.arange(n)[None, None, None, :] < lens[:, None, None, None]),
                    jnp.einsum("bqhd,bkhd->bhqk", q_.astype(jnp.float32),
                               k_.astype(jnp.float32)) / np.sqrt(d),
                    -1e30),
                axis=-1).astype(v_.dtype), v_))(qr, kr, v)
        valid = (jnp.arange(n)[None, :] < lens[:, None])[:, :, None, None]

        # slope timing: R vs 4R chained calls
        def chain(reps, fn):
            def f(x):
                def body(i, acc):
                    return fn(acc, k, v, lens, rope=rope)
                return jax.lax.fori_loop(0, reps, body, x)
            g = jax.jit(f)
            g(q)  # compile
            t0 = time.perf_counter()
            np.asarray(g(q)[:1, :1, :1, :1])
            return time.perf_counter() - t0

        # both variants, independently fallible: the one-shot fat-q block
        # (Mosaic layout at n % 128 == 64 is what this probe validates) and
        # the pad-to-128 escape hatch (exact; see padded_serving_attention) —
        # measured side by side so the ladder decision is data, not hope
        from eraxvif5tts_tpu.ops.serving_attention import padded_serving_attention

        r = 16
        results = []
        for name, fn in (("oneshot", serving_attention),
                         ("pad128", padded_serving_attention)):
            try:
                out = fn(q, k, v, lens, rope=rope)
                err = float(jnp.max(jnp.abs((out - ref) * valid)))
                t1, t4 = chain(r, fn), chain(4 * r, fn)
                us = (t4 - t1) / (3 * r) * 1e6
                results.append(f"{name} err={err:.4f} {us:8.1f} us/call")
            except Exception as e:  # Mosaic compile failure is the risk here
                results.append(f"{name} FAIL {type(e).__name__}: "
                               f"{str(e).splitlines()[0][:90]}")
        print(f"n={n:5d} blocks={blocks} | " + " | ".join(results))


if __name__ == "__main__":
    main()
