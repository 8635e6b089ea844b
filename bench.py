"""Benchmark: real-time factor of the zero-shot cloning hot path on one chip.

Measures the full serving pipeline — CFG-batched DiT Euler sampling (NFE=32) + native
Vocos decode, all on-device — and prints ONE JSON line:

    {"metric": "rtf_nfe32", "value": <audio_s / wall_s>, "unit": "x_realtime",
     "vs_baseline": <value / 20.0>}

Baseline: the north-star target of >=20x realtime per chip at NFE=32 (BASELINE.md);
the reference publishes no RTF numbers of its own.

``--smoke`` runs a tiny model on small buckets (CPU-safe, for CI).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np


def build(smoke: bool, dtype: str):
    import jax
    import jax.numpy as jnp

    from eraxvif5tts_tpu.configs import PRESETS
    from eraxvif5tts_tpu.models.cfm import CFM
    from eraxvif5tts_tpu.models.dit import DiT
    from eraxvif5tts_tpu.models.vocos import Vocos

    cfg = PRESETS["F5TTS_v1_Base"]
    if smoke:
        cfg = dataclasses.replace(
            cfg,
            arch=dataclasses.replace(cfg.arch, dim=64, depth=2, heads=2, dim_head=32,
                                     text_dim=32, conv_layers=1),
        )
    cdtype = jnp.bfloat16 if dtype in ("bfloat16", "int8") else jnp.float32
    dit = DiT(arch=cfg.arch, text_num_embeds=2546, mel_dim=cfg.mel_spec.n_mel_channels,
              compute_dtype=cdtype)
    cfm = CFM.build(dit, cfg.mel_spec)
    params = cfm.init_params(jax.random.key(0))
    if dtype == "int8":
        # opt-in W8A8 serving: block matmuls int8 (3.6x GEMM rate on v5e)
        from eraxvif5tts_tpu.ops.quant import quantize_params

        qarch = dataclasses.replace(cfg.arch, quantized=True)
        dit = DiT(arch=qarch, text_num_embeds=2546,
                  mel_dim=cfg.mel_spec.n_mel_channels, compute_dtype=cdtype)
        cfm = CFM.build(dit, cfg.mel_spec)
        params = quantize_params(params)
    vocoder = Vocos(
        input_channels=cfg.mel_spec.n_mel_channels,
        n_fft=cfg.mel_spec.n_fft,
        hop_length=cfg.mel_spec.hop_length,
    ) if not smoke else Vocos(input_channels=cfg.mel_spec.n_mel_channels, dim=64,
                              intermediate_dim=128, num_layers=2)
    vparams = jax.jit(vocoder.init)(
        jax.random.key(1), jnp.zeros((1, cfg.mel_spec.n_mel_channels, 8))
    )["params"]
    if dtype == "bfloat16":
        # store weights in bf16 too: halves HBM traffic in the Euler scan
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    return cfg, cfm, params, vocoder, vparams


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny model, CPU-safe")
    ap.add_argument("--nfe", type=int, default=32)
    ap.add_argument("--bucket", type=int, default=None, help="total mel frames")
    ap.add_argument("--ref-frames", type=int, default=None)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16", "int8"])
    args = ap.parse_args()

    import os

    import jax

    if args.smoke:
        # genuinely CPU-safe: the axon sitecustomize force-sets
        # jax_platforms="axon,cpu" (env JAX_PLATFORMS is ignored) and a downed
        # tunnel HANGS backend init rather than failing over — force cpu here
        jax.config.update("jax_platforms", "cpu")
    # Persistent compile cache: remote TPU compiles of the full Euler program
    # are minutes cold; a warm cache makes repeated bench runs start in seconds
    # (same default scheme as __graft_entry__.dryrun_multichip).
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_tpu_cache"))

    import jax.numpy as jnp

    bucket = args.bucket or (128 if args.smoke else 1024)
    ref_frames = args.ref_frames or (32 if args.smoke else 256)

    cfg, cfm, params, vocoder, vparams = build(args.smoke, args.dtype)
    hop = cfg.mel_spec.hop_length
    sr = cfg.mel_spec.target_sample_rate

    cond = jax.random.normal(jax.random.key(2), (1, ref_frames, cfg.mel_spec.n_mel_channels))
    text = jnp.zeros((1, 128), jnp.int32).at[:, :96].set(
        jnp.arange(1, 97, dtype=jnp.int32)
    )
    duration = jnp.asarray([bucket])
    lens = jnp.asarray([ref_frames])
    key = jax.random.key(3)

    vocode = jax.jit(lambda mel: vocoder.apply({"params": vparams}, mel.swapaxes(1, 2)))

    def run():
        mel = cfm.sample(
            params, cond, text, duration, lens, key,
            steps=args.nfe, cfg_strength=2.0, sway_sampling_coef=-1.0,
            max_duration=bucket,
        )
        return vocode(mel)

    def sync(x):
        # block_until_ready is unreliable on the experimental axon platform;
        # a host transfer of one element forces a real sync.
        return np.asarray(x[:, :8])

    # warmup / compile
    sync(run())

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        sync(run())
        times.append(time.perf_counter() - t0)

    wall = float(np.median(times))
    audio_seconds = (bucket - ref_frames) * hop / sr
    rtf = audio_seconds / wall
    print(json.dumps({
        "metric": "rtf_nfe32" if args.nfe == 32 else f"rtf_nfe{args.nfe}",
        "value": round(rtf, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
