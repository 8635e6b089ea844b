"""End-to-end RTF through the REAL serving path: a reference-format torch
checkpoint imported by ``F5TTSWrapper`` (bf16 cast path, bucketed fused
sample+vocode jit, int16 PCM transfer) — not the raw-init-params path of
``bench.py``.

Weights are random but travel the exact import pipeline a production checkpoint
does (``compression/convert.py`` torch key schema, ``ema_model.`` prefix), so the
number proves the imported-weights serving path matches the kernel benchmark.

Prints one JSON line: {"metric": "wrapper_rtf_nfe32", ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np


def make_checkpoint(path: str, model_name: str = "F5TTS_v1_Base") -> None:
    import jax
    import torch

    from eraxvif5tts_tpu.compression.convert import backbone_params_to_torch
    from eraxvif5tts_tpu.configs import PRESETS
    from eraxvif5tts_tpu.models import build_backbone
    from eraxvif5tts_tpu.models.cfm import CFM

    cfg = PRESETS[model_name]
    dit = build_backbone(cfg, text_num_embeds=2546)
    cfm = CFM.build(dit, cfg.mel_spec)
    params = jax.device_get(cfm.init_params(jax.random.key(0)))
    sd = backbone_params_to_torch(
        params,
        backbone=cfg.backbone,
        depth=cfg.arch.depth,
        conv_layers=cfg.arch.conv_layers,
        qk_norm=cfg.arch.qk_norm == "rms_norm",
        long_skip=cfg.arch.long_skip_connection,
    )
    torch.save(
        {"ema_model_state_dict": {
            "ema_model." + k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()
        }},
        path,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nfe", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--gen-seconds", type=float, default=8.0,
                    help="fixed generated duration (selects the bucket)")
    ap.add_argument("--model", default="F5TTS_v1_Base",
                    help="architecture preset (e.g. E2TTS_Base for the UNetT "
                         "variant's perf story)")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "int8", "float32"],
                    help="serving compute dtype (int8 = opt-in W8A8 block "
                         "matmuls; supported for all three backbones)")
    args = ap.parse_args()

    from eraxvif5tts_tpu.infer.wrapper import F5TTSWrapper

    vocab = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.,!?'\"-")}

    with tempfile.TemporaryDirectory() as td:
        ckpt = os.path.join(td, "model_ema.pt")
        make_checkpoint(ckpt, args.model)
        wrapper = F5TTSWrapper(
            model_name=args.model,
            ckpt_path=ckpt,
            vocab_char_map=vocab,
            compute_dtype=args.dtype,
            nfe_step=args.nfe,
        )

    sr = wrapper.target_sample_rate
    t = np.arange(int(sr * 3.0)) / sr
    ref_wav = (0.1 * np.sin(2 * np.pi * 180 * t)).astype(np.float32)
    wrapper.preprocess_reference(
        ref_audio=ref_wav, ref_sample_rate=sr,
        ref_text="this is the reference prompt for the benchmark. ",
    )

    gen_text = ("the quick brown fox jumps over the lazy dog while the tpu "
                "streams mel frames at many times realtime. ") * 2
    total_s = wrapper.ref.audio_seconds + args.gen_seconds

    # warmup/compile
    wav = wrapper.generate(gen_text, return_numpy=True, fix_duration=total_s,
                           use_pinyin=False)
    audio_s = len(wav) / sr

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        wav = wrapper.generate(gen_text, return_numpy=True, fix_duration=total_s,
                               use_pinyin=False)
        times.append(time.perf_counter() - t0)

    wall = float(np.median(times))
    rtf = audio_s / wall

    # device-side wall: same call synced with a 2-byte fetch instead of the
    # full waveform download. Through the axon tunnel a device_get carries a
    # fixed ~26 ms round trip plus ~8 ms per 384 KB
    # (`benchmarks/wrapper_latency_split.py`); on a standard PCIe-attached
    # TPU host the waveform fetch is <1 ms, so that deployment's wall RTF is
    # this number.
    import jax

    from eraxvif5tts_tpu.infer.utils import pick_bucket
    from eraxvif5tts_tpu.infer.wrapper import VOCODE_MARGIN_FRAMES
    from eraxvif5tts_tpu.text.tokenizer import list_str_to_idx

    ref = wrapper.ref
    tokens = [list(ref.text + gen_text)]
    duration = max(wrapper._duration_for(ref, gen_text, 1.0, total_s),
                   ref.n_frames + 1)
    bucket = pick_bucket(duration, wrapper.duration_buckets)
    text_ids = np.asarray(list_str_to_idx(
        tokens, wrapper.vocab_char_map,
        pad_to=pick_bucket(len(tokens[0]), wrapper.text_buckets)))
    dev_times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        pcm, _ = wrapper._sample_vocode_jit(
            wrapper.params, wrapper.vocoder_params, ref.mel, text_ids,
            np.asarray([min(duration, bucket)]), np.asarray([ref.n_frames]),
            jax.random.key(i), np.float32(1.0), steps=args.nfe,
            cfg_strength=2.0, sway=-1.0, max_duration=bucket,
            vocode_start=max(ref.n_frames - VOCODE_MARGIN_FRAMES, 0),
            # same static args as generate() above, so this reuses the already
            # compiled executable instead of paying a fresh XLA compile (1-10
            # min through the tunnel) inside the timed loop
            gen_start=ref.n_frames - max(ref.n_frames - VOCODE_MARGIN_FRAMES, 0))
        np.asarray(pcm[:1, :1])
        dev_times.append(time.perf_counter() - t0)
    device_rtf = audio_s / float(np.median(dev_times))

    print(json.dumps({
        "metric": f"wrapper_rtf_nfe{args.nfe}"
                  + ("" if args.model == "F5TTS_v1_Base" else f"_{args.model}")
                  + ("" if args.dtype == "bfloat16" else f"_{args.dtype}"),
        "value": round(rtf, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 20.0, 3),
        "audio_s": round(audio_s, 2),
        "wall_ms": round(wall * 1e3, 1),
        "device_rtf": round(device_rtf, 3),
    }))


if __name__ == "__main__":
    main()
