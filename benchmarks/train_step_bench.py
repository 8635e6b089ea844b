"""Train-step throughput at the reference's real batch scale.

Reference recipe: 38,400 frames/GPU per batch (`configs/F5TTS_v1_Base.yaml`
``batch_size_per_gpu``), sequences up to 4096 frames. This drives one full
F5TTS_v1_Base (22-layer, 335.8M param) training step — remat on, chunked-attention
train path — on the attached TPU and reports steps/sec + frames/sec.

Usage: python benchmarks/train_step_bench.py [--frames 4096] [--batch 9] [--steps 3]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=4096)
    p.add_argument("--batch", type=int, default=9)  # 9 x 4096 = 36,864 <= 38,400
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--depth", type=int, default=22)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="activation dtype; params/optimizer stay float32")
    p.add_argument("--smoke", action="store_true", help="tiny model, CPU-safe")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from eraxvif5tts_tpu.configs import ArchConfig
    from eraxvif5tts_tpu.models.cfm import CFM
    from eraxvif5tts_tpu.models.dit import DiT
    from eraxvif5tts_tpu.training.trainer import Trainer, make_optimizer

    if args.smoke:
        arch = ArchConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2,
                          text_dim=32, conv_layers=1, dropout=args.dropout,
                          checkpoint_activations=True)
        args.frames, args.batch = 256, 2
        mel_dim, vocab = 100, 256
    else:
        arch = ArchConfig(dim=args.dim, depth=args.depth, heads=16, dim_head=64,
                          ff_mult=2, text_dim=512, conv_layers=4,
                          dropout=args.dropout, checkpoint_activations=True)
        mel_dim, vocab = 100, 2545

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    cfm = CFM(transformer=DiT(arch=arch, text_num_embeds=vocab, mel_dim=mel_dim,
                              compute_dtype=dtype))
    trainer = Trainer(cfm=cfm, optimizer=make_optimizer(total_updates=1000))
    state = trainer.init_state(jax.random.key(0))
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(state.params))
    print(f"params: {n_params/1e6:.1f}M  batch: {args.batch}x{args.frames} frames")

    rng = np.random.default_rng(0)
    batch = {
        "mel": rng.standard_normal((args.batch, args.frames, mel_dim)).astype(np.float32),
        "text": rng.integers(0, vocab, (args.batch, 1024)).astype(np.int32),
        "lens": np.full((args.batch,), args.frames, np.int32),
    }

    # compile + warm: TWO warmup steps — the first compiles, the second hits a
    # one-off donated-buffer-layout recompile/load (measured 225 s once, then
    # 2.5 s/step steady at 9x4096)
    for w in range(2):
        t0 = time.time()
        state, metrics = trainer.train_step(state, batch, jax.random.key(1 + w))
        _ = float(metrics["loss"])  # force sync through a scalar transfer
        print(f"warmup {w}: {time.time()-t0:.1f}s  loss={float(metrics['loss']):.4f}")

    t0 = time.time()
    for i in range(args.steps):
        state, metrics = trainer.train_step(state, batch, jax.random.key(3 + i))
        loss = float(metrics["loss"])  # per-step sync (steady-state walls)
    dt = (time.time() - t0) / args.steps
    frames = args.batch * args.frames
    print(json.dumps({
        "metric": "train_step_seconds", "value": round(dt, 3), "unit": "s/step",
        "steps_per_sec": round(1.0 / dt, 4),
        "frames_per_sec": round(frames / dt, 1),
        "batch_frames": frames, "loss": round(loss, 4),
    }))


if __name__ == "__main__":
    main()
