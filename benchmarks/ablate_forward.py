"""Component-ablation timing of one DiT forward at the serving shape.

Measures dit_forward_ms with each hot component monkey-patched to an identity
(attention kernel, rotary, ConvPositionEmbedding, FeedForward) — the delta vs
baseline is that component's wall share. Run on the TPU:

    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/ablate_forward.py
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bucket", type=int, default=1024)
    ap.add_argument("--loop", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench as bench_mod
    from eraxvif5tts_tpu.models import modules

    cfg, cfm, params, _, _ = bench_mod.build(False, "bfloat16")
    n = args.bucket
    mel_d = cfg.mel_spec.n_mel_channels
    b2 = 2

    x = jax.random.normal(jax.random.key(4), (b2, n, mel_d))
    condf = jnp.zeros((b2, n, mel_d))
    te = jax.random.normal(jax.random.key(5), (b2, n, cfg.arch.text_dim), jnp.bfloat16)
    tvec = jnp.full((b2,), 0.5)
    false_b = jnp.zeros((b2,), bool)
    mask = jnp.ones((b2, n), bool)

    def sync_arr(v):
        np.asarray(jax.tree.leaves(v)[0].ravel()[:1])

    def measure():
        @functools.partial(jax.jit, static_argnames=("reps",))
        def dit_loop(params, x, reps):
            def body(i, acc):
                out = cfm.transformer.apply(
                    {"params": params}, acc, condf, te, tvec, false_b, mask,
                    method="run")
                return out.astype(acc.dtype)
            return jax.lax.fori_loop(0, reps, body, x)

        f = lambda: dit_loop(params, x, args.loop)  # noqa: E731
        sync_arr(f())
        t0 = time.perf_counter()
        for _ in range(3):
            sync_arr(f())
        return (time.perf_counter() - t0) / 3 / args.loop * 1e3

    results = {}

    def record(k, v):
        results[k] = round(v, 2)
        print(json.dumps({k: results[k]}), flush=True)

    base = measure()
    record("baseline_ms", base)

    # -- attention kernel -> identity (keeps qkv/out projections) ----------
    orig_attn = modules.dot_product_attention
    modules.dot_product_attention = lambda q, k, v, **kw: v
    record("no_attn_kernel_ms", measure())
    modules.dot_product_attention = orig_attn

    # -- rotary -> identity -------------------------------------------------
    orig_rot = modules.apply_rotary
    modules.apply_rotary = lambda t, rope: t
    record("no_rotary_ms", measure())
    modules.apply_rotary = orig_rot

    # -- conv position embedding -> zero ------------------------------------
    orig_cpe = modules.ConvPositionEmbedding.__call__
    modules.ConvPositionEmbedding.__call__ = (
        lambda self, x, mask=None: jnp.zeros_like(x))
    record("no_convpos_ms", measure())
    modules.ConvPositionEmbedding.__call__ = orig_cpe

    # -- feedforward -> zero (keeps AdaLN/LN) --------------------------------
    orig_ff = modules.FeedForward.__call__
    modules.FeedForward.__call__ = (
        lambda self, x, deterministic=True, **kw: jnp.zeros_like(x))
    record("no_ff_ms", measure())
    modules.FeedForward.__call__ = orig_ff

    # -- qkv+out projections AND attention -> zero block --------------------
    orig_att_call = modules.Attention.__call__
    modules.Attention.__call__ = (
        lambda self, x, mask=None, rope=None, deterministic=True, **kw: jnp.zeros_like(x))
    record("no_attention_block_ms", measure())
    modules.Attention.__call__ = orig_att_call

    for k in list(results):
        if k != "baseline_ms":
            results[k.replace("_ms", "_share_ms")] = round(base - results[k], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
