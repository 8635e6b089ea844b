"""Ablation profile of the serving hot path on the attached TPU.

Times (all inside single jit regions, looped via lax.fori_loop to amortize the
~27 ms axon dispatch RTT):
1. full pipeline RTF at b=1 and b=8 (the `generate_batch` shape)
2. one DiT forward at the CFG-doubled serving shape [2b, 1024]
3. attention-only at the serving shape — Pallas flash vs XLA
4. FF/matmul-only at the same token count (MXU roofline probe)

Prints one JSON line per measurement; the summary feeds BASELINE.md's
binding-resource analysis.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def timed(fn, sync, iters=3):
    """fn() -> device value; sync(value) blocks until it is computed."""
    sync(fn())  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(fn())
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bucket", type=int, default=1024)
    ap.add_argument("--ref-frames", type=int, default=256)
    ap.add_argument("--nfe", type=int, default=32)
    ap.add_argument("--loop", type=int, default=16, help="inner fori_loop reps")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench as bench_mod

    cfg, cfm, params, vocoder, vparams = bench_mod.build(False, "bfloat16")
    hop, sr = cfg.mel_spec.hop_length, cfg.mel_spec.target_sample_rate
    n, ref = args.bucket, args.ref_frames
    mel_d = cfg.mel_spec.n_mel_channels

    results = {}

    def record(k, v):
        results[k] = v
        print(json.dumps({k: v}), flush=True)

    def sync_arr(x):
        # slice ON DEVICE first — device_get of the full array ships megabytes
        # through the axon tunnel and dominates the measurement
        leaf = jax.tree.leaves(x)[0]
        np.asarray(leaf.ravel()[:1])

    # --- 1. full pipeline b=1 / b=8 -------------------------------------
    for b in (1, 8):
        cond = jax.random.normal(jax.random.key(2), (b, ref, mel_d))
        text = jnp.zeros((b, 128), jnp.int32).at[:, :96].set(
            jnp.arange(1, 97, dtype=jnp.int32))
        duration = jnp.full((b,), n)
        lens = jnp.full((b,), ref)

        vocode = jax.jit(
            lambda mel: vocoder.apply({"params": vparams}, mel.swapaxes(1, 2))
        )

        def run(cond=cond, text=text, duration=duration, lens=lens, vocode=vocode):
            mel = cfm.sample(params, cond, text, duration, lens, jax.random.key(3),
                             steps=args.nfe, max_duration=n)
            return vocode(mel)

        out = run()
        sync_arr(out)
        t0 = time.perf_counter()
        for _ in range(3):
            sync_arr(run())
        wall = (time.perf_counter() - t0) / 3
        audio_s = b * (n - ref) * hop / sr
        record(f"rtf_b{b}", round(audio_s / wall, 2))
        record(f"wall_b{b}_ms", round(wall * 1e3, 1))

    # --- 2. one DiT forward at serving shape ----------------------------
    b2 = 2  # CFG-doubled batch
    x = jax.random.normal(jax.random.key(4), (b2, n, mel_d))
    condf = jnp.zeros((b2, n, mel_d))
    te = jax.random.normal(jax.random.key(5), (b2, n, 512), jnp.bfloat16)
    tvec = jnp.full((b2,), 0.5)
    false_b = jnp.zeros((b2,), bool)
    mask = jnp.ones((b2, n), bool)

    # params must be jit ARGUMENTS, not closure constants: the axon remote-compile
    # service rejects HLO with 672 MB of baked-in weight constants (HTTP 413).
    @functools.partial(jax.jit, static_argnames=("reps",))
    def dit_loop(params, x, reps):
        def body(i, acc):
            out = cfm.transformer.apply(
                {"params": params}, acc, condf, te, tvec, false_b, mask,
                method="run")
            return out.astype(acc.dtype)
        return jax.lax.fori_loop(0, reps, body, x)

    f = lambda: dit_loop(params, x, args.loop)  # noqa: E731
    wall = timed(f, sync_arr)
    record("dit_forward_ms", round(wall / args.loop * 1e3, 2))

    # --- 3. attention-only: pallas vs xla --------------------------------
    from eraxvif5tts_tpu.ops.attention import dot_product_attention

    h, dh = cfg.arch.heads, cfg.arch.dim_head
    q = jax.random.normal(jax.random.key(6), (b2, n, h, dh), jnp.bfloat16)

    for impl, kwargs in (("pallas", {}), ("xla", {"implementation": "xla"})):
        @functools.partial(jax.jit, static_argnames=("reps",))
        def attn_loop(q, reps, kwargs=kwargs):
            def body(i, acc):
                return dot_product_attention(acc, q, q, **kwargs)
            return jax.lax.fori_loop(0, reps, body, q)

        fa = lambda attn_loop=attn_loop: attn_loop(q, args.loop * 4)  # noqa: E731
        wall = timed(fa, sync_arr)
        per = wall / (args.loop * 4)
        flops = 4 * b2 * h * n * n * dh  # qk + pv
        record(f"attn_{impl}_us", round(per * 1e6, 1))
        record(f"attn_{impl}_tflops", round(flops / per / 1e12, 1))

    # --- 4. matmul roofline at the FF shape ------------------------------
    d_model, ff = cfg.arch.dim, cfg.arch.dim * cfg.arch.ff_mult
    a = jax.random.normal(jax.random.key(7), (b2 * n, d_model), jnp.bfloat16)
    w1 = jax.random.normal(jax.random.key(8), (d_model, ff), jnp.bfloat16)
    w2 = jax.random.normal(jax.random.key(9), (ff, d_model), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def mm_loop(a, w1, w2, reps):
        def body(i, acc):
            return (acc @ w1) @ w2
        return jax.lax.fori_loop(0, reps, body, a)

    fm = lambda: mm_loop(a, w1, w2, args.loop * 8)  # noqa: E731
    wall = timed(fm, sync_arr)
    per = wall / (args.loop * 8)
    flops = 2 * a.shape[0] * d_model * ff * 2
    record("ff_matmul_us", round(per * 1e6, 1))
    record("ff_matmul_tflops", round(flops / per / 1e12, 1))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
