"""First-streaming-chunk latency benchmark (north-star: p50 < 300 ms on one chip).

Simulates the socket-server first-package path (`serving/socket_server.py`): the
first text chunk is cut down to ``min_chars`` so the smallest duration bucket is hit,
then measures text-in -> first PCM chunk out, end to end (tokenize + DiT ODE +
Vocos + device->host transfer).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--nfe", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from eraxvif5tts_tpu.configs import ArchConfig, ModelConfig, PRESETS
    from eraxvif5tts_tpu.infer.wrapper import F5TTSWrapper

    if args.smoke:
        cfg = ModelConfig(arch=ArchConfig(dim=64, depth=2, heads=2, dim_head=32,
                                          text_dim=32, conv_layers=1, dropout=0.0))
    else:
        cfg = PRESETS["F5TTS_v1_Base"]
    vocab = {c: i for i, c in enumerate(
        " abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.,!?0123456789'-")}
    wrapper = F5TTSWrapper(model_cfg=cfg, vocab_char_map=vocab,
                           nfe_step=args.nfe, compute_dtype=args.dtype,
                           duration_buckets=(256, 384, 512, 768, 1024),
                           text_buckets=(64, 128, 256))

    t = np.arange(24000 * 2) / 24000.0  # 2 s reference
    ref_wav = (0.2 * np.sin(2 * np.pi * 170 * t)).astype(np.float32)
    ref = wrapper.preprocess_reference(ref_audio=ref_wav, ref_sample_rate=24000,
                                       ref_text="this is the reference prompt audio.")

    first_text = "Hello!"  # min-chars first package
    # warm the compiled buckets
    wrapper.generate(first_text, ref=ref, nfe_step=args.nfe, seed=0,
                     return_numpy=True, use_pinyin=False)

    latencies = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        wave = wrapper.generate(first_text, ref=ref, nfe_step=args.nfe, seed=i,
                                return_numpy=True, use_pinyin=False)
        assert len(wave) > 0
        latencies.append(time.perf_counter() - t0)
    p50 = float(np.percentile(latencies, 50))
    p90 = float(np.percentile(latencies, 90))
    print(json.dumps({
        "metric": "first_chunk_latency_p50",
        "value": round(p50 * 1000, 1),
        "unit": "ms",
        "vs_baseline": round(300.0 / max(p50 * 1000, 1e-9), 3),
        "p90_ms": round(p90 * 1000, 1),
        "nfe": args.nfe,
    }))


if __name__ == "__main__":
    main()
