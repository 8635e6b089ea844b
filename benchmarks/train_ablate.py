"""Attribute the train-step wall time at the reference batch scale.

Times (a) forward-only loss, (b) full value_and_grad step, with the attention
backend swapped between the trainable Pallas flash kernel and XLA fused
attention, plus (c) standalone fwd+bwd of each attention backend at the train
shape via slope timing. Run on the TPU:

    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/train_ablate.py
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=9)
    ap.add_argument("--depth", type=int, default=22)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from eraxvif5tts_tpu.configs import ArchConfig
    from eraxvif5tts_tpu.models import modules
    from eraxvif5tts_tpu.models.cfm import CFM
    from eraxvif5tts_tpu.models.dit import DiT
    from eraxvif5tts_tpu.ops import attention as attn_mod

    arch = ArchConfig(dim=1024, depth=args.depth, heads=16, dim_head=64,
                      ff_mult=2, text_dim=512, conv_layers=4, dropout=0.0,
                      checkpoint_activations=True)
    cfm = CFM(transformer=DiT(arch=arch, text_num_embeds=2545, mel_dim=100,
                              compute_dtype=jnp.bfloat16))
    params = cfm.init_params(jax.random.key(0))

    b, n = args.batch, args.frames
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((b, n, 100)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, 2545, (b, 1024)).astype(np.int32))
    lens = jnp.full((b,), n, jnp.int32)

    def sync(x):
        np.asarray(jax.tree.leaves(x)[0].ravel()[:1])

    def timed(fn, iters=2):
        sync(fn())
        t0 = time.perf_counter()
        for _ in range(iters):
            sync(fn())
        return (time.perf_counter() - t0) / iters

    results = {}

    def record(k, v):
        results[k] = round(v, 3)
        print(json.dumps({k: results[k]}), flush=True)

    @jax.jit
    def fwd_only(params):
        loss, _, _ = cfm.loss(params, mel, text, lens, jax.random.key(1))
        return loss

    @jax.jit
    def fwd_bwd(params):
        def f(p):
            loss, _, _ = cfm.loss(p, mel, text, lens, jax.random.key(1))
            return loss
        loss, grads = jax.value_and_grad(f)(params)
        return loss, jax.tree.leaves(grads)[0]

    record("fwd_only_s", timed(lambda: fwd_only(params)))
    record("fwd_bwd_s", timed(lambda: fwd_bwd(params)))

    # swap attention to XLA fused and retime (OOMs at 4096 frames — the
    # materialized [b,h,n,n] f32 logits are 9 GB; kept for smaller shapes)
    modules.dot_product_attention = functools.partial(
        attn_mod.dot_product_attention, implementation="xla")

    @jax.jit
    def fwd_bwd_xla(params):
        def f(p):
            loss, _, _ = cfm.loss(p, mel, text, lens, jax.random.key(1))
            return loss
        loss, grads = jax.value_and_grad(f)(params)
        return loss, jax.tree.leaves(grads)[0]

    try:
        record("fwd_bwd_xla_attn_s", timed(lambda: fwd_bwd_xla(params)))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"fwd_bwd_xla_attn_error": str(e)[:120]}), flush=True)
    modules.dot_product_attention = attn_mod.dot_product_attention

    # standalone attention fwd+bwd at the train shape, slope-timed
    h, d = 16, 64
    kq, kk, kv = jax.random.split(jax.random.key(2), 3)
    q = jax.random.normal(kq, (b, n, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, n, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, n, h, d), jnp.bfloat16)
    key_valid = jnp.ones((b, n), bool)

    def slope(make_fn):
        @functools.partial(jax.jit, static_argnames=("reps",))
        def loop(q, reps):
            def body(i, acc):
                return make_fn(acc)[1]
            return jax.lax.fori_loop(0, reps, body, q)
        r = args.reps
        sync(loop(q, r)); sync(loop(q, 4 * r))
        t1 = time.perf_counter(); sync(loop(q, r)); t1 = time.perf_counter() - t1
        t4 = time.perf_counter(); sync(loop(q, 4 * r)); t4 = time.perf_counter() - t4
        return (t4 - t1) / (3 * r)

    def flash_fb(qq):
        loss, grad = jax.value_and_grad(
            lambda x: attn_mod.dot_product_attention(
                x, k, v, key_valid=key_valid, trainable=True).astype(jnp.float32).sum()
        )(qq)
        return loss, grad.astype(qq.dtype)

    def xla_fb(qq):
        loss, grad = jax.value_and_grad(
            lambda x: attn_mod.dot_product_attention(
                x, k, v, key_valid=key_valid, implementation="xla").astype(jnp.float32).sum()
        )(qq)
        return loss, grad.astype(qq.dtype)

    record("attn_flash_fwdbwd_s", slope(flash_fb))
    record("attn_xla_fwdbwd_s", slope(xla_fb))

    try:
        from eraxvif5tts_tpu.ops.train_attention import train_attention

        def newk_fb(qq):
            loss, grad = jax.value_and_grad(
                lambda x: train_attention(
                    x, k, v, key_valid=key_valid, dropout_rate=0.1,
                    dropout_rng=jax.random.key(9)).astype(jnp.float32).sum()
            )(qq)
            return loss, grad.astype(qq.dtype)

        record("attn_trainkernel_drop_fwdbwd_s", slope(newk_fb))

        def newk0_fb(qq):
            loss, grad = jax.value_and_grad(
                lambda x: train_attention(
                    x, k, v, key_valid=key_valid, dropout_rate=0.0).astype(jnp.float32).sum()
            )(qq)
            return loss, grad.astype(qq.dtype)

        record("attn_trainkernel_nodrop_fwdbwd_s", slope(newk0_fb))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"train_kernel_error": str(e)[:200]}), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
