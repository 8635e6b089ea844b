"""Split `F5TTSWrapper.generate`'s wall time into device compute vs PCM
transfer vs host prep, at the `wrapper_rtf.py` serving point (8 s generated,
3 s reference, bucket 1152).

Through the axon tunnel the download of the int16 waveform is a real cost;
this probe shows whether the gap between `bench.py`'s kernel RTF and the
wrapper RTF is device time or transport/host overhead.

    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/wrapper_latency_split.py
"""

from __future__ import annotations

import json
import os
import tempfile
import sys
import time

import numpy as np

from wrapper_rtf import make_checkpoint  # noqa: E402  (same dir)


def main():
    import argparse

    import jax

    from eraxvif5tts_tpu.infer.utils import pick_bucket
    from eraxvif5tts_tpu.infer.wrapper import VOCODE_MARGIN_FRAMES, F5TTSWrapper
    from eraxvif5tts_tpu.text.tokenizer import list_str_to_idx

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="F5TTS_v1_Base",
                    help="preset (E2TTS_Base closes the UNetT wall-vs-device gap)")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "int8", "float32"])
    args = ap.parse_args()

    vocab = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.,!?'\"-")}
    with tempfile.TemporaryDirectory() as td:
        ckpt = os.path.join(td, "model_ema.pt")
        make_checkpoint(ckpt, args.model)
        wrapper = F5TTSWrapper(model_name=args.model, ckpt_path=ckpt,
                               vocab_char_map=vocab, compute_dtype=args.dtype)

    sr = wrapper.target_sample_rate
    t = np.arange(int(sr * 3.0)) / sr
    wrapper.preprocess_reference(
        ref_audio=(0.1 * np.sin(2 * np.pi * 180 * t)).astype(np.float32),
        ref_sample_rate=sr,
        ref_text="this is the reference prompt for the benchmark. ",
    )
    ref = wrapper.ref
    gen_text = ("the quick brown fox jumps over the lazy dog while the tpu "
                "streams mel frames at many times realtime. ") * 2

    # replicate generate()'s per-call host prep once, outside timing
    full_text = ref.text + gen_text
    tokens = [list(full_text)]
    duration = wrapper._duration_for(ref, gen_text, 1.0,
                                     ref.audio_seconds + 8.0)
    duration = max(duration, ref.n_frames + 1)
    bucket = pick_bucket(duration, wrapper.duration_buckets)
    text_bucket = pick_bucket(len(tokens[0]), wrapper.text_buckets)
    text_ids = np.asarray(list_str_to_idx(tokens, wrapper.vocab_char_map,
                                          pad_to=text_bucket))
    vstart = max(ref.n_frames - VOCODE_MARGIN_FRAMES, 0)

    def device_call():
        return wrapper._sample_vocode_jit(
            wrapper.params, wrapper.vocoder_params, ref.mel,
            text_ids, np.asarray([min(duration, bucket)]),
            np.asarray([ref.n_frames]), jax.random.key(0),
            np.float32(1.0), steps=32, cfg_strength=2.0, sway=-1.0,
            max_duration=bucket, vocode_start=vstart)

    print("wrapper ready; compiling...", file=sys.stderr, flush=True)
    pcm, _ = device_call()  # compile
    np.asarray(pcm[:1, :1])

    print("compiled", file=sys.stderr, flush=True)
    report = {"model": args.model, "dtype": args.dtype, "bucket": bucket,
              "duration_frames": int(duration)}

    # (a) dispatch + device compute, 2-byte sync transfer
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        pcm, _ = device_call()
        np.asarray(pcm[:1, :1])
        times.append(time.perf_counter() - t0)
    report["device_ms"] = round(float(np.median(times)) * 1e3, 1)

    # (b) + full waveform transfer, as generate() does
    start = (ref.n_frames - vstart) * wrapper.hop_length
    end = (min(duration, bucket) - vstart) * wrapper.hop_length
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        pcm, _ = device_call()
        wave = np.asarray(pcm[0, start:end])
        times.append(time.perf_counter() - t0)
    report["device_plus_transfer_ms"] = round(float(np.median(times)) * 1e3, 1)
    report["transfer_bytes"] = int((end - start) * 2)

    # (c) full generate() wall for the same call
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        wrapper.generate(gen_text, return_numpy=True,
                         fix_duration=ref.audio_seconds + 8.0, use_pinyin=False)
        times.append(time.perf_counter() - t0)
    report["generate_ms"] = round(float(np.median(times)) * 1e3, 1)
    report["host_prep_ms"] = round(report["generate_ms"]
                                   - report["device_plus_transfer_ms"], 1)

    # (d) transport floor: fetch of a RESIDENT device buffer of the same size
    # (no compute in the way) — the irreducible tunnel cost per request; plus
    # a 2-byte fetch isolating the fixed round-trip from the per-byte part.
    resident = jax.device_put(np.zeros(end - start, np.int16))
    np.asarray(resident[:1])
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(resident)
        times.append(time.perf_counter() - t0)
    report["fetch_resident_ms"] = round(float(np.median(times)) * 1e3, 1)
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(resident[:1])
        times.append(time.perf_counter() - t0)
    report["fetch_2B_ms"] = round(float(np.median(times)) * 1e3, 1)

    # (e) null-dispatch round trip: a trivial jitted op + tiny sync — the
    # per-request dispatch RTT floor.
    null = jax.jit(lambda x: x + 1)
    np.asarray(null(resident[:8])[:1])
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(null(resident[:8])[:1])
        times.append(time.perf_counter() - t0)
    report["null_dispatch_ms"] = round(float(np.median(times)) * 1e3, 1)

    # transport-floor closure: wall-over-device explained by transfer + prep
    report["wall_minus_device_ms"] = round(
        report["generate_ms"] - report["device_ms"], 1)
    report["transport_floor_ms"] = round(
        report["fetch_resident_ms"] + report["host_prep_ms"], 1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
