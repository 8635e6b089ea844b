"""Component-level accounting of the train step at the reference batch scale.

Round-3 recorded 2.37 s/step at 9x4096 (15.5k frames/s) with `train_step_bench`,
which SYNCS EVERY STEP (`float(metrics["loss"])`). The production loop
(`Trainer.train`, trainer.py:649-672) fetches scalars only every `log_every`
steps, so its steady state pipelines the host batch ingestion under the device
step. This harness decomposes one step into its real components:

- ``full_sync``      : legacy number — one step, loss fetched each step
- ``full_pipelined`` : production-loop semantics — K steps dispatched
                       back-to-back with fresh host batches, ONE sync at the end
- ``device_resident``: same pipelined loop with the batch already on device
                       (isolates host->device ingest from device compute)
- ``fwd_bwd``        : value_and_grad of the CFM loss alone (no optimizer/EMA),
                       device-resident batch
- ``opt_ema``        : AdamW update + EMA map alone on device-resident grads
- ``ingest``         : wall time of handing the host batch to a trivial jit
                       (the tunnel/PCIe transfer serialization at dispatch)

Run on the TPU:

    JAX_COMPILATION_CACHE_DIR=/tmp/jax_bench_cache \
      PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/train_step_decompose.py
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _sync(x):
    # block_until_ready does not reliably sync through the axon tunnel; force a
    # tiny transfer (CLAUDE.md timing methodology)
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=9)
    ap.add_argument("--depth", type=int, default=22)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--remat-policy", default="full",
                    choices=["full", "dots", "attn"])
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    global jax
    import jax
    import jax.numpy as jnp
    import optax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from eraxvif5tts_tpu.configs import ArchConfig
    from eraxvif5tts_tpu.models.cfm import CFM
    from eraxvif5tts_tpu.models.dit import DiT
    from eraxvif5tts_tpu.training.trainer import Trainer, make_optimizer

    if args.smoke:
        arch = ArchConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2,
                          text_dim=32, conv_layers=1, dropout=0.1,
                          checkpoint_activations=True,
                          remat_policy=args.remat_policy)
        args.frames, args.batch, args.steps = 128, 2, 2
        vocab = 256
    else:
        arch = ArchConfig(dim=1024, depth=args.depth, heads=16, dim_head=64,
                          ff_mult=2, text_dim=512, conv_layers=4, dropout=0.1,
                          checkpoint_activations=True,
                          remat_policy=args.remat_policy)
        vocab = 2545

    cfm = CFM(transformer=DiT(arch=arch, text_num_embeds=vocab, mel_dim=100,
                              compute_dtype=jnp.bfloat16))
    trainer = Trainer(cfm=cfm, optimizer=make_optimizer(total_updates=1000))
    state = trainer.init_state(jax.random.key(0))

    rng = np.random.default_rng(0)

    def host_batch(seed):
        r = np.random.default_rng(seed)
        return {
            "mel": r.standard_normal(
                (args.batch, args.frames, 100)).astype(np.float32),
            "text": r.integers(0, vocab, (args.batch, 1024)).astype(np.int32),
            "lens": np.full((args.batch,), args.frames, np.int32),
        }

    batches = [host_batch(i) for i in range(args.steps + 2)]
    report = {}

    # -- full step, sync every step (legacy train_step_bench number) --------
    for w in range(2):  # compile + donated-layout recompile
        t0 = time.time()
        state, metrics = trainer.train_step(state, batches[w], jax.random.key(w))
        _ = float(metrics["loss"])
        print(f"warmup {w}: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    for i in range(args.steps):
        state, metrics = trainer.train_step(state, batches[i], jax.random.key(9 + i))
        _ = float(metrics["loss"])
    report["full_sync"] = (time.time() - t0) / args.steps

    # -- full step, pipelined (production Trainer.train semantics) ----------
    t0 = time.time()
    for i in range(args.steps):
        state, metrics = trainer.train_step(state, batches[i], jax.random.key(31 + i))
    _ = float(metrics["loss"])
    report["full_pipelined"] = (time.time() - t0) / args.steps

    # -- pipelined with the batch already device-resident --------------------
    dev_batch = {k: jnp.asarray(v) for k, v in batches[0].items()}
    _sync(dev_batch["mel"])
    state, metrics = trainer.train_step(state, dev_batch, jax.random.key(50))
    _ = float(metrics["loss"])  # possible reshape/layout warm
    t0 = time.time()
    for i in range(args.steps):
        state, metrics = trainer.train_step(state, dev_batch, jax.random.key(51 + i))
    _ = float(metrics["loss"])
    report["device_resident"] = (time.time() - t0) / args.steps

    # -- host batch ingestion alone ------------------------------------------
    # the probe must USE every operand: a constant-returning jit lets XLA drop
    # the parameters and the dispatch transfers nothing
    probe = jax.jit(lambda mel, text, lens:
                    mel.ravel()[0] + text.ravel()[0] + lens[0])
    _ = float(probe(**batches[0]))
    t0 = time.time()
    for i in range(args.steps):
        probe(**batches[i])  # dispatch ingests the host arrays synchronously
    report["ingest_dispatch"] = (time.time() - t0) / args.steps

    # -- fwd+bwd only (no optimizer, no EMA) ---------------------------------
    def fwd_bwd(params, mel, text, lens, rng_):
        def loss_fn(p):
            loss, _, _ = cfm.loss(p, mel, text, lens, rng_)
            return loss
        return jax.value_and_grad(loss_fn)(params)

    fwd_bwd_j = jax.jit(fwd_bwd)
    mel_d, text_d, lens_d = (dev_batch["mel"], dev_batch["text"],
                             dev_batch["lens"])
    loss, grads = fwd_bwd_j(state.params, mel_d, text_d, lens_d, jax.random.key(7))
    _ = float(loss)
    t0 = time.time()
    for i in range(args.steps):
        loss, grads = fwd_bwd_j(state.params, mel_d, text_d, lens_d,
                                jax.random.key(70 + i))
    _ = float(loss)
    report["fwd_bwd"] = (time.time() - t0) / args.steps

    # -- forward only ---------------------------------------------------------
    def fwd(params, mel, text, lens, rng_):
        loss, _, _ = cfm.loss(params, mel, text, lens, rng_)
        return loss

    fwd_j = jax.jit(fwd)
    _ = float(fwd_j(state.params, mel_d, text_d, lens_d, jax.random.key(8)))
    t0 = time.time()
    for i in range(args.steps):
        loss = fwd_j(state.params, mel_d, text_d, lens_d, jax.random.key(80 + i))
    _ = float(loss)
    report["fwd_only"] = (time.time() - t0) / args.steps

    # -- optimizer + EMA alone ------------------------------------------------
    def opt_ema(params, opt_state, ema, grads_, loss_, step):
        new_params, new_opt, applied = trainer._applied_and_update(
            grads_, opt_state, params, loss_)
        new_ema = trainer._ema_map(applied, step, ema, new_params)
        return new_params, new_opt, new_ema

    opt_ema_j = jax.jit(opt_ema, donate_argnums=(0, 1, 2))
    p2, o2, e2 = opt_ema_j(state.params, state.opt_state, state.ema_params,
                           grads, loss, state.step)
    _sync(p2)
    t0 = time.time()
    for i in range(args.steps):
        p2, o2, e2 = opt_ema_j(p2, o2, e2, grads, loss, state.step + i)
    _sync(p2)
    report["opt_ema"] = (time.time() - t0) / args.steps

    frames = args.batch * args.frames
    out = {k: round(v, 4) for k, v in report.items()}
    out.update({
        "metric": "train_step_pipelined_seconds",
        "value": round(report["full_pipelined"], 4),
        "unit": "s/step",
        "frames_per_sec_pipelined": round(frames / report["full_pipelined"], 1),
        "frames_per_sec_sync": round(frames / report["full_sync"], 1),
        "batch_frames": frames,
        "residue_sync_minus_fwdbwd": round(
            report["full_sync"] - report["fwd_bwd"], 4),
        "device_step_estimate": round(
            report["fwd_bwd"] + report["opt_ema"], 4),
    })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
