"""scan-over-layers A/B on real hardware: compile wall + steady-state speed,
scan vs unrolled, at flagship shape (VERDICT round-4 task 2).

``arch.scan_layers=True`` compiles ONE DiT block body instead of ``depth``
copies (models/dit.py). This harness measures what that buys/costs on the
real chip:

- serve: the fused sample jit at a serving bucket — first-call wall
  (trace + compile + execute) vs warm-call wall (execute), both forms.
- train: ``Trainer.train_step`` at a configurable frame budget — same split.

Compile measurements use a FRESH compilation cache dir (tempdir) unless
``--cache-dir`` is given, so first-call walls are honest cold compiles.
Steady-state uses median of ``--iters`` warm calls with a tiny sync fetch
(CLAUDE.md timing methodology: donated train states pay a one-off
donated-layout recompile on step 2 — step 3+ are the warm samples).

Prints one JSON line per (what, form) cell.

    python benchmarks/scan_compile_bench.py --what serve train --iters 3
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import tempfile
import time

import numpy as np


def _sync(x):
    np.asarray(jax_arr_head(x))


def jax_arr_head(x):
    import jax

    leaf = jax.tree.leaves(x)[0]
    return leaf[(slice(0, 1),) * leaf.ndim]


def bench_serve(form: str, scan: bool, nfe: int, bucket: int, iters: int) -> dict:
    import jax
    import jax.numpy as jnp

    from eraxvif5tts_tpu.configs import PRESETS
    from eraxvif5tts_tpu.models import build_backbone
    from eraxvif5tts_tpu.models.cfm import CFM
    from eraxvif5tts_tpu.text.tokenizer import list_str_to_idx

    cfg = PRESETS["F5TTS_v1_Base"]
    cfg = dataclasses.replace(cfg, arch=dataclasses.replace(
        cfg.arch, scan_layers=scan))
    dit = build_backbone(cfg, text_num_embeds=2546, compute_dtype=jnp.bfloat16)
    cfm = CFM.build(dit, cfg.mel_spec)
    params = jax.device_put(
        jax.tree.map(lambda p: p.astype(jnp.bfloat16) if p.ndim > 1 else p,
                     cfm.init_params(jax.random.key(0))))

    ref_frames = 280
    vocab = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.,!?")}
    text = [list("a reference prompt. " + "the quick brown fox jumps over the lazy dog. " * 3)]
    text_ids = jnp.asarray(list_str_to_idx(text, vocab, pad_to=256))
    cond = jnp.zeros((1, ref_frames, 100), jnp.float32)

    def call(i):
        out = cfm.sample(params, cond, text_ids,
                         jnp.asarray([bucket]), jnp.asarray([ref_frames]),
                         jax.random.key(i), steps=nfe, cfg_strength=2.0,
                         max_duration=bucket)
        _sync(out)

    t0 = time.perf_counter()
    call(0)
    cold = time.perf_counter() - t0
    times = []
    for i in range(1, iters + 1):
        t0 = time.perf_counter()
        call(i)
        times.append(time.perf_counter() - t0)
    warm = float(np.median(times))
    audio_s = (bucket - ref_frames) * cfg.mel_spec.hop_length / cfg.mel_spec.target_sample_rate
    return {
        "metric": f"scan_ab_serve_{form}",
        "value": round(audio_s / warm, 3),
        "unit": "x_realtime",
        "bucket": bucket,
        "nfe": nfe,
        "cold_first_call_s": round(cold, 1),
        "warm_call_s": round(warm, 3),
    }


def bench_train(form: str, scan: bool, batch: int, frames: int, iters: int) -> dict:
    import jax

    from eraxvif5tts_tpu.configs import PRESETS, resolve_remat_policy
    from eraxvif5tts_tpu.models import build_backbone
    from eraxvif5tts_tpu.models.cfm import CFM
    from eraxvif5tts_tpu.training.trainer import Trainer, make_optimizer

    cfg = PRESETS["F5TTS_v1_Base"]
    policy = resolve_remat_policy("auto", batch * frames)
    cfg = dataclasses.replace(cfg, arch=dataclasses.replace(
        cfg.arch, scan_layers=scan, checkpoint_activations=True,
        remat_policy=policy))
    # production training recipe is bfloat16 compute (ModelConfig.compute_dtype
    # default; train CLI passes it through) — and the flash train kernel's VMEM
    # stack only fits at n=4096 in bf16 (see ops/train_attention.py
    # can_use_train_kernel)
    import jax.numpy as jnp

    dit = build_backbone(cfg, text_num_embeds=2546, compute_dtype=jnp.bfloat16)
    cfm = CFM.build(dit, cfg.mel_spec)
    trainer = Trainer(cfm=cfm, optimizer=make_optimizer(total_updates=1000))

    state = trainer.init_state(jax.random.key(0))
    rng = np.random.default_rng(0)
    b = {
        "mel": rng.standard_normal((batch, frames, 100)).astype(np.float32),
        "text": np.tile(np.arange(1, 257, dtype=np.int32), (batch, 1)),
        "lens": np.full((batch,), frames, np.int32),
    }

    t0 = time.perf_counter()
    state, m = trainer.train_step(state, b, jax.random.key(1))
    float(m["loss"])
    cold = time.perf_counter() - t0
    # step 2 pays the donated-layout recompile; exclude it from warm timing
    state, m = trainer.train_step(state, b, jax.random.key(2))
    float(m["loss"])
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        state, m = trainer.train_step(state, b, jax.random.key(3 + i))
        float(m["loss"])
        times.append(time.perf_counter() - t0)
    warm = float(np.median(times))
    return {
        "metric": f"scan_ab_train_{form}",
        "value": round(batch * frames / warm, 1),
        "unit": "frames_per_s",
        "batch": batch,
        "frames": frames,
        "remat": policy,
        "cold_first_step_s": round(cold, 1),
        "warm_step_s": round(warm, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", nargs="+", default=["serve"],
                    choices=["serve", "train"])
    ap.add_argument("--forms", nargs="+", default=["unrolled", "scan"])
    ap.add_argument("--nfe", type=int, default=32)
    ap.add_argument("--bucket", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cache-dir", default=None,
                    help="compilation cache dir (default: fresh tempdir so "
                         "cold compiles are honest)")
    args = ap.parse_args()

    import jax

    cache = args.cache_dir or tempfile.mkdtemp(prefix="jax_scan_ab_")
    jax.config.update("jax_compilation_cache_dir", cache)

    for what in args.what:
        for form in args.forms:
            scan = form == "scan"
            if what == "serve":
                row = bench_serve(form, scan, args.nfe, args.bucket, args.iters)
            else:
                row = bench_train(form, scan, args.batch, args.frames, args.iters)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
