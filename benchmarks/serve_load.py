"""Load test of the HTTP streaming server on the attached TPU.

Runs the real F5TTS_v1_Base serving stack (full model, bf16, serving attention
kernel) behind `serving/http_server.py`, then fires concurrent `/tts/stream`
requests and reports first-byte / completion latency percentiles and aggregate
realtime factor under load. The reference FastAPI server has no comparable
harness (and would cross-talk: it mutates shared wrapper state per request).

    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/serve_load.py --clients 4 --requests 12
"""

from __future__ import annotations

import argparse
import asyncio
import json
import time

import numpy as np


async def one_request(host, port, text, ref_id):
    reader, writer = await asyncio.open_connection(host, port)
    body = json.dumps({"text": text, "reference_id": ref_id}).encode()
    req = (
        b"POST /tts/stream HTTP/1.1\r\nHost: x\r\nContent-Type: application/json\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode() + body
    )
    t0 = time.perf_counter()
    writer.write(req)
    await writer.drain()
    first_byte = None
    total = 0
    # headers
    while True:
        line = await reader.readline()
        if line in (b"\r\n", b""):
            break
    # chunked body
    while True:
        size_line = await reader.readline()
        if not size_line:
            break
        try:
            size = int(size_line.strip() or b"0", 16)
        except ValueError:
            break
        if size == 0:
            break
        data = await reader.readexactly(size + 2)
        total += size
        if first_byte is None and total > 44:  # past the WAV header: real PCM
            first_byte = time.perf_counter() - t0
    writer.close()
    return first_byte, time.perf_counter() - t0, total


async def main_async(args):
    import jax

    from eraxvif5tts_tpu.infer.wrapper import F5TTSWrapper
    from eraxvif5tts_tpu.serving.http_server import ServerConfig, TTSServer

    vocab = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.,!?'\"-")}
    wrapper = F5TTSWrapper(model_name="F5TTS_v1_Base", vocab_char_map=vocab,
                           compute_dtype="bfloat16", nfe_step=args.nfe)
    sr = wrapper.target_sample_rate
    t = np.arange(int(sr * 3.0)) / sr
    ref = wrapper.preprocess_reference(
        ref_audio=(0.1 * np.sin(2 * np.pi * 180 * t)).astype(np.float32),
        ref_sample_rate=sr, ref_text="this is the reference prompt for the benchmark. ",
    )
    cfg = ServerConfig(host="127.0.0.1", port=args.port, nfe_step=args.nfe,
                       max_concurrent_generations=args.max_concurrent)
    server = TTSServer(wrapper, cfg)
    server.references["bench"] = ref

    srv = await asyncio.start_server(server._handle, cfg.host, cfg.port)
    async with srv:
        text = ("the quick brown fox jumps over the lazy dog while the tpu "
                "streams mel frames at many times realtime. ")
        # warm the bucket once
        await one_request(cfg.host, cfg.port, text, "bench")

        t0 = time.perf_counter()
        sem = asyncio.Semaphore(args.clients)

        async def task(i):
            async with sem:
                return await one_request(cfg.host, cfg.port, text, "bench")

        results = await asyncio.gather(*[task(i) for i in range(args.requests)])
        wall = time.perf_counter() - t0

    fb = sorted(r[0] for r in results if r[0] is not None)
    done = sorted(r[1] for r in results)
    audio_s = sum(r[2] for r in results) / 2 / sr  # int16 bytes -> seconds
    print(json.dumps({
        "metric": "serve_load",
        "clients": args.clients,
        "requests": args.requests,
        "first_byte_p50_ms": round(fb[len(fb) // 2] * 1e3, 1),
        "first_byte_p95_ms": round(fb[int(len(fb) * 0.95) - 1] * 1e3, 1),
        "complete_p50_ms": round(done[len(done) // 2] * 1e3, 1),
        "complete_p95_ms": round(done[int(len(done) * 0.95) - 1] * 1e3, 1),
        "aggregate_rtf": round(audio_s / wall, 2),
        "audio_seconds_total": round(audio_s, 1),
        "wall_s": round(wall, 2),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--requests", type=int, default=12)
    ap.add_argument("--nfe", type=int, default=32)
    ap.add_argument("--port", type=int, default=18111)
    ap.add_argument("--max-concurrent", type=int, default=4)
    args = ap.parse_args()
    asyncio.run(main_async(args))


if __name__ == "__main__":
    main()
