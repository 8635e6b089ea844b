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
    p.add_argument("--pipeline", action="store_true",
                   help="ALSO drive steps through the real input pipeline "
                        "(CustomDataset + DynamicBatchSampler + collate) in "
                        "three variants — precomputed-mel, audio-path serial, "
                        "audio-path with num_workers prefetch — to prove the "
                        "host mel FFT hides under the device step")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon sitecustomize ignores "
                        "JAX_PLATFORMS env)")
    p.add_argument("--remat-policy", default="full", choices=["full", "dots", "attn"],
                   help="remat selectivity under activation checkpointing "
                        "('dots' saves GEMM outputs, skipping their backward "
                        "recompute at the cost of HBM)")
    p.add_argument("--mu-dtype", default=None, choices=[None, "bfloat16"],
                   help="store the AdamW first moment in bf16 (the "
                        "optim.mu_dtype config knob) — A/B its step-time cost")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from eraxvif5tts_tpu.configs import ArchConfig
    from eraxvif5tts_tpu.models.cfm import CFM
    from eraxvif5tts_tpu.models.dit import DiT
    from eraxvif5tts_tpu.training.trainer import Trainer, make_optimizer

    if args.smoke:
        arch = ArchConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2,
                          text_dim=32, conv_layers=1, dropout=args.dropout,
                          checkpoint_activations=True,
                          remat_policy=args.remat_policy)
        args.frames, args.batch = 256, 2
        mel_dim, vocab = 100, 256
    else:
        arch = ArchConfig(dim=args.dim, depth=args.depth, heads=16, dim_head=64,
                          ff_mult=2, text_dim=512, conv_layers=4,
                          dropout=args.dropout, checkpoint_activations=True,
                          remat_policy=args.remat_policy)
        mel_dim, vocab = 100, 2545

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    cfm = CFM(transformer=DiT(arch=arch, text_num_embeds=vocab, mel_dim=mel_dim,
                              compute_dtype=dtype))
    trainer = Trainer(cfm=cfm, optimizer=make_optimizer(
        total_updates=1000,
        mu_dtype=jnp.bfloat16 if args.mu_dtype == "bfloat16" else None))
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

    if not args.pipeline:
        return

    # ---- input-pipeline variants (same jitted step; batches now come through
    # the REAL dataset machinery the train CLI uses) ----------------------
    import tempfile
    import wave as wave_mod
    from concurrent.futures import ThreadPoolExecutor

    from eraxvif5tts_tpu.training.cli import epoch_batches
    from eraxvif5tts_tpu.training.dataset import (
        CustomDataset,
        DynamicBatchSampler,
        prefetch_batches,
    )

    vocab_map = {chr(97 + i): i for i in range(26)}
    vocab_map[" "] = 26
    sr = 24000
    dur_s = args.frames * 256 / sr
    n_rows = args.batch * (args.steps + 1)
    text = ("the quick brown fox jumps over the lazy dog " * 40)[:900]

    # train_step donates its state buffers, so ONE state threads through all
    # variants (copies would triple the ~4 GB param+Adam+EMA footprint and
    # OOM next to the 9x4096 activations)
    pstate = state

    def run_pipeline(tag, dataset, workers):
        nonlocal pstate
        executor = (ThreadPoolExecutor(max_workers=workers) if workers > 1
                    else None)
        sampler = DynamicBatchSampler(
            [dataset.frame_length(i) for i in range(len(dataset))],
            frames_threshold=args.batch * (args.frames + 1), random_seed=0)
        gen = epoch_batches(dataset, sampler, vocab_map, 0, executor=executor)
        it = prefetch_batches(gen) if workers else gen
        b0 = next(it)  # warm (first batch prep is not overlapped with anything)
        pstate, m = trainer.train_step(pstate, b0, jax.random.key(9))
        float(m["loss"])
        t0 = time.time()
        done = 0
        for bt in it:
            pstate, m = trainer.train_step(pstate, bt, jax.random.key(10 + done))
            float(m["loss"])
            done += 1
        dt_p = (time.time() - t0) / max(done, 1)
        if executor is not None:
            executor.shutdown()
        print(json.dumps({"metric": f"pipeline_{tag}_seconds",
                          "value": round(dt_p, 3), "unit": "s/step",
                          "steps": done}))
        return dt_p

    mel_frames = args.frames  # all rows the same length -> one static bucket
    rng_p = np.random.default_rng(1)
    mel_rows = [{"text": text, "duration": dur_s,
                 "mel_spec": rng_p.standard_normal(
                     (mel_frames, mel_dim)).astype(np.float32)}
                for _ in range(n_rows)]
    t_mel = run_pipeline(
        "mel", CustomDataset(mel_rows, preprocessed_mel=True), workers=0)

    with tempfile.TemporaryDirectory() as td:
        t_ax = np.arange(int(sr * dur_s)) / sr
        audio_rows = []
        for i in range(n_rows):
            path = f"{td}/u{i}.wav"
            pcm = (0.2 * np.sin(2 * np.pi * (120 + 5 * i) * t_ax)
                   * 32767).astype(np.int16)
            with wave_mod.open(path, "wb") as f:
                f.setnchannels(1); f.setsampwidth(2); f.setframerate(sr)
                f.writeframes(pcm.tobytes())
            audio_rows.append({"text": text, "duration": dur_s,
                               "audio_path": path})
        ds_audio = CustomDataset(audio_rows)
        t_serial = run_pipeline("audio_serial", ds_audio, workers=0)
        t_overlap = run_pipeline("audio_overlap", ds_audio, workers=8)

    print(json.dumps({
        "metric": "pipeline_overlap_ratio",
        "value": round(t_overlap / t_mel, 3),
        "unit": "audio_overlap / precomputed_mel step time (1.0 = fully hidden)",
        "serial_ratio": round(t_serial / t_mel, 3),
    }))


if __name__ == "__main__":
    main()
