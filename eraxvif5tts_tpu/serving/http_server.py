"""Streaming TTS HTTP server on stdlib asyncio (no FastAPI/uvicorn dependency).

Endpoint parity with the reference FastAPI server
(`src/streaming/f5tts-fastapi-server.py`):

- ``POST /tts/stream``  JSON {text, reference_id?, nfe_step?, cfg_strength?, speed?,
  sway_sampling_coef?, seed?} -> chunked ``audio/wav`` stream: WAV header first
  (`:375`), then int16 PCM per text chunk (`:388-392`).
- ``POST /upload_reference`` multipart (file=<wav>, ref_text=<str>, reference_id?)
  -> 202 + background processing with a "processing" placeholder (`:514-585`).
- ``GET /references`` -> reference cache listing (`:593-601`).
- ``GET /health`` -> model/reference status (`:607-615`).
- ``GET /`` -> minimal HTML client (`client.html` equivalent).

Reference-state race fixed by design: each request resolves an immutable
``ReferenceState`` and passes it to ``wrapper.generate(ref=...)`` instead of mutating
wrapper state (reference mutates shared attrs per request, `:327-343` — SURVEY.md §5).
"""

from __future__ import annotations

import asyncio
import io
import json
import os
import tempfile
import time
import traceback
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from eraxvif5tts_tpu.infer.wrapper import F5TTSWrapper, ReferenceState
from eraxvif5tts_tpu.serving.wave_stream import create_wave_header, float_to_int16_bytes
from eraxvif5tts_tpu.text.chunk import chunk_text

try:  # optional Vietnamese text normalizer (reference uses vinorm `:354`)
    from vinorm import TTSnorm as _ttsnorm
except ImportError:  # pragma: no cover
    def _ttsnorm(text: str) -> str:
        return text


@dataclass
class ServerConfig:
    """Parity with the reference config block (`f5tts-fastapi-server.py:23-48`)."""

    host: str = "0.0.0.0"
    port: int = 8000
    model_name: str = "F5TTS_v1_Base"
    ckpt_path: Optional[str] = None
    vocab_file: Optional[str] = None
    vocoder_ckpt_path: Optional[str] = None
    default_references: dict = field(default_factory=dict)  # id -> (wav_path, text)
    text_chunk_size: int = 100
    nfe_step: int = 32
    cfg_strength: float = 2.0
    speed: float = 1.0
    sway_sampling_coef: float = -1.0
    # hardening (the reference FastAPI server has none of these):
    max_body_bytes: int = 50 * 1024 * 1024  # uploads; oversize -> 413, no buffering
    request_read_timeout: float = 30.0  # seconds to receive head+body
    generation_timeout: float = 300.0  # per text-chunk synthesis budget
    max_concurrent_generations: int = 4  # device-work admission control
    warmup: bool = False  # pre-compile the duration-bucket ladder at startup


class TTSServer:
    def __init__(self, wrapper: F5TTSWrapper, config: ServerConfig | None = None):
        self.wrapper = wrapper
        self.config = config or ServerConfig()
        self.references: dict[str, ReferenceState | str] = {}  # id -> state|"processing"
        self._lock = asyncio.Lock()
        self._gen_semaphore = asyncio.Semaphore(
            max(self.config.max_concurrent_generations, 1)
        )

    # ------------------------------------------------------------------

    async def startup(self):
        """Preprocess and cache default references (`:87-170`)."""
        for ref_id, (path, text) in self.config.default_references.items():
            state = await asyncio.to_thread(
                self.wrapper.preprocess_reference, path, text
            )
            self.references[ref_id] = state
        if self.config.warmup and self.references:
            # compile the whole serving bucket ladder before accepting traffic
            # (cold XLA compiles run minutes on a remote-compile link; the
            # reference's socket server warms one path, `socket_server.py:121-135`)
            ref = next(iter(self.references.values()))
            warmed = await asyncio.to_thread(self.wrapper.warmup, ref,
                                             self.config.nfe_step)
            print(f"warmup: compiled {len(warmed)} bucket programs: {warmed}")

    # ------------------------------------------------------------------
    # HTTP plumbing

    async def serve(self):
        server = await asyncio.start_server(self._handle, self.config.host, self.config.port)
        addrs = ", ".join(str(s.getsockname()) for s in server.sockets)
        print(f"TTS server listening on {addrs}")
        async with server:
            await server.serve_forever()

    async def _handle(self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter):
        try:
            try:
                request = await asyncio.wait_for(
                    _read_request(reader, max_body=self.config.max_body_bytes),
                    timeout=self.config.request_read_timeout,
                )
            except asyncio.TimeoutError:
                await _respond_json(writer, 408, {"detail": "request read timeout"})
                return
            except _BodyTooLarge as e:
                await _respond_json(writer, 413, {"detail": str(e)})
                return
            if request is None:
                return
            method, path, headers, body = request
            route = (method, path.split("?")[0])
            if route == ("GET", "/health"):
                await self._health(writer)
            elif route == ("GET", "/references"):
                await self._list_references(writer)
            elif route == ("GET", "/"):
                await _respond(writer, 200, _CLIENT_HTML, content_type="text/html")
            elif route == ("POST", "/tts/stream"):
                await self._tts_stream(writer, body)
            elif route == ("POST", "/upload_reference"):
                await self._upload_reference(writer, headers, body)
            else:
                await _respond_json(writer, 404, {"detail": "not found"})
        except ConnectionError:
            pass
        except Exception:
            traceback.print_exc()
            try:
                await _respond_json(writer, 500, {"detail": "internal error"})
            except Exception:
                pass
        finally:
            try:
                writer.close()
                await writer.wait_closed()
            except Exception:
                pass

    # ------------------------------------------------------------------
    # endpoints

    async def _health(self, writer):
        ready = {k: not isinstance(v, str) for k, v in self.references.items()}
        await _respond_json(writer, 200, {
            "status": "healthy",
            "model_loaded": self.wrapper is not None,
            "references": ready,
        })

    async def _list_references(self, writer):
        out = {}
        for k, v in self.references.items():
            if isinstance(v, str):
                out[k] = {"status": "processing"}
            else:
                out[k] = {
                    "status": "ready",
                    "text": v.text,
                    "duration_seconds": round(v.audio_seconds, 3),
                }
        await _respond_json(writer, 200, {"references": out})

    async def _tts_stream(self, writer, body: bytes):
        try:
            req = json.loads(body or b"{}")
        except json.JSONDecodeError:
            await _respond_json(writer, 400, {"detail": "invalid JSON body"})
            return
        text = req.get("text", "")
        if not text.strip():
            await _respond_json(writer, 400, {"detail": "text is required"})
            return
        # `speaker` is the reference client's field name (`client.html:454`);
        # `reference_id` matches the upload response — accept both.
        ref_id = req.get("reference_id", req.get("speaker"))
        ref = None
        if ref_id is not None:
            ref = self.references.get(ref_id)
            if ref is None:
                await _respond_json(writer, 404, {"detail": f"unknown reference {ref_id!r}"})
                return
            if isinstance(ref, str):
                await _respond_json(writer, 409, {"detail": f"reference {ref_id!r} still processing"})
                return
        elif self.wrapper.ref is not None:
            ref = self.wrapper.ref
        else:
            await _respond_json(writer, 400, {"detail": "no reference available"})
            return

        sr = self.wrapper.target_sample_rate
        writer.write(
            b"HTTP/1.1 200 OK\r\ncontent-type: audio/wav\r\n"
            b"transfer-encoding: chunked\r\nconnection: close\r\n\r\n"
        )
        await _write_chunk(writer, create_wave_header(sr))

        normalized = _ttsnorm(text)
        pieces = chunk_text(normalized, max_chars=self.config.text_chunk_size)
        for piece in pieces:
            try:
                # admission control: at most max_concurrent_generations device
                # jobs in flight; each chunk has a hard wall-clock budget.
                async with self._gen_semaphore:
                    wave = await asyncio.wait_for(
                        asyncio.to_thread(
                            self.wrapper.generate,
                            piece,
                            ref=ref,
                            nfe_step=int(req.get("nfe_step", self.config.nfe_step)),
                            cfg_strength=float(
                                req.get("cfg_strength", self.config.cfg_strength)),
                            speed=float(req.get("speed", self.config.speed)),
                            sway_sampling_coef=float(
                                req.get("sway_sampling_coef",
                                        self.config.sway_sampling_coef)
                            ),
                            seed=req.get("seed"),
                            cross_fade_duration=float(
                                req.get("cross_fade_duration", 0.15)),
                            return_numpy=True,
                        ),
                        timeout=self.config.generation_timeout,
                    )
                await _write_chunk(writer, float_to_int16_bytes(wave))
            except Exception:
                # one bad chunk must not kill the stream (`:251-254`)
                traceback.print_exc()
                continue
        await _write_chunk(writer, b"")  # terminating chunk

    async def _upload_reference(self, writer, headers: dict, body: bytes):
        ctype = headers.get("content-type", "")
        if "multipart/form-data" not in ctype:
            await _respond_json(writer, 400, {"detail": "expected multipart/form-data"})
            return
        try:
            fields = _parse_multipart(ctype, body)
        except ValueError as e:
            await _respond_json(writer, 400, {"detail": str(e)})
            return
        def as_text(value) -> str:
            if value is None:
                return ""
            return value.decode("utf-8") if isinstance(value, bytes) else str(value)

        audio = fields.get("file")
        ref_text = as_text(fields.get("ref_text"))
        ref_id = as_text(fields.get("reference_id")) or f"ref_{int(time.time())}"
        if audio is None:
            await _respond_json(writer, 400, {"detail": "file field required"})
            return

        self.references[ref_id] = "processing"  # placeholder (`:548`)
        asyncio.get_running_loop().create_task(
            self._process_reference(ref_id, audio, ref_text)
        )
        await _respond_json(writer, 202, {"reference_id": ref_id, "status": "processing"})

    async def _process_reference(self, ref_id: str, audio_bytes: bytes, ref_text: str):
        try:
            with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
                f.write(audio_bytes)
                path = f.name
            state = await asyncio.to_thread(
                self.wrapper.preprocess_reference, path, ref_text
            )
            self.references[ref_id] = state
        except Exception:
            traceback.print_exc()
            self.references.pop(ref_id, None)


# ---------------------------------------------------------------------------
# tiny HTTP/1.1 + multipart plumbing


class _BodyTooLarge(Exception):
    pass


async def _read_request(reader, max_body: int = 50 * 1024 * 1024):
    try:
        head = await reader.readuntil(b"\r\n\r\n")
    except (asyncio.IncompleteReadError, asyncio.LimitOverrunError):
        return None
    lines = head.decode("latin1").split("\r\n")
    method, path, _ = lines[0].split(" ", 2)
    headers = {}
    for line in lines[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    body = b""
    try:
        n = int(headers.get("content-length", 0))
    except ValueError:
        n = 0
    if n > max_body:
        # reject before buffering anything — a single request could otherwise
        # OOM the host
        raise _BodyTooLarge(f"body {n} bytes exceeds limit {max_body}")
    if n:
        body = await reader.readexactly(n)
    return method, path, headers, body


async def _respond(writer, status: int, body, content_type="application/json"):
    if isinstance(body, str):
        body = body.encode("utf-8")
    reason = {200: "OK", 202: "Accepted", 400: "Bad Request", 404: "Not Found",
              408: "Request Timeout", 409: "Conflict", 413: "Payload Too Large",
              500: "Internal Server Error"}.get(status, "OK")
    writer.write(
        f"HTTP/1.1 {status} {reason}\r\ncontent-type: {content_type}\r\n"
        f"content-length: {len(body)}\r\nconnection: close\r\n\r\n".encode()
    )
    writer.write(body)
    await writer.drain()


async def _respond_json(writer, status: int, obj):
    await _respond(writer, status, json.dumps(obj))


async def _write_chunk(writer, data: bytes):
    writer.write(f"{len(data):x}\r\n".encode() + data + b"\r\n")
    await writer.drain()


def _parse_multipart(content_type: str, body: bytes) -> dict[str, bytes | str]:
    """Minimal multipart/form-data parser (file fields -> bytes, text -> str)."""
    boundary = None
    for part in content_type.split(";"):
        part = part.strip()
        if part.startswith("boundary="):
            boundary = part[len("boundary="):].strip('"')
    if not boundary:
        raise ValueError("missing multipart boundary")
    delim = b"--" + boundary.encode()
    fields: dict[str, bytes | str] = {}
    for segment in body.split(delim):
        segment = segment.strip(b"\r\n")
        if not segment or segment == b"--":
            continue
        if b"\r\n\r\n" not in segment:
            continue
        raw_headers, content = segment.split(b"\r\n\r\n", 1)
        name = None
        is_file = False
        for hline in raw_headers.decode("latin1").split("\r\n"):
            if hline.lower().startswith("content-disposition"):
                for item in hline.split(";"):
                    item = item.strip()
                    if item.startswith("name="):
                        name = item[5:].strip('"')
                    if item.startswith("filename="):
                        is_file = True
        if name:
            fields[name] = content if is_file else content.decode("utf-8")
    return fields


def _load_client_html() -> str:
    """The full streaming client page (parity surface of the reference
    `src/streaming/client.html`, with true chunked Web Audio playback)."""
    path = os.path.join(os.path.dirname(__file__), "client.html")
    try:
        with open(path, encoding="utf-8") as f:
            return f.read()
    except OSError:
        return ("<!doctype html><html><body><h2>EraXviF5TTS-TPU</h2>"
                "<p>client.html missing from the package; POST /tts/stream "
                "directly.</p></body></html>")


_CLIENT_HTML = _load_client_html()


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--vocab", default=None)
    ap.add_argument("--vocoder-ckpt", default=None)
    ap.add_argument("--model", default="F5TTS_v1_Base")
    ap.add_argument("--ref-audio", default=None)
    ap.add_argument("--ref-text", default="")
    ap.add_argument("--smoke", action="store_true", help="tiny random model (demo/CI)")
    ap.add_argument("--warmup", action="store_true",
                    help="pre-compile the duration-bucket ladder before serving")
    ap.add_argument("--scan-layers", action="store_true",
                    help="serve the scan-over-layers model form: one compiled "
                         "block body instead of `depth` copies — cuts cold-start "
                         "compile (incl. --warmup ladder) at the cost of the "
                         "scan-vs-unrolled steady-state delta (BASELINE.md)")
    args = ap.parse_args()

    if args.smoke:
        from eraxvif5tts_tpu.configs import ArchConfig, ModelConfig

        cfg = ModelConfig(arch=ArchConfig(dim=64, depth=2, heads=2, dim_head=32,
                                          text_dim=32, conv_layers=1, dropout=0.0,
                                          scan_layers=args.scan_layers))
        vocab = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.,!?àáâãèéêìíòóôõùúýăđĩũơưạảấầẩẫậắằẳẵặẹẻẽếềểễệỉịọỏốồổỗộớờởỡợụủứừửữựỳỵỷỹ")}
        wrapper = F5TTSWrapper(model_cfg=cfg, vocab_char_map=vocab, nfe_step=4,
                               duration_buckets=(128, 256), text_buckets=(128,))
    else:
        model_cfg = None
        if args.scan_layers:
            import dataclasses

            from eraxvif5tts_tpu.configs import PRESETS

            base = PRESETS[args.model]
            model_cfg = dataclasses.replace(
                base, arch=dataclasses.replace(base.arch, scan_layers=True))
        wrapper = F5TTSWrapper(
            model_name=None if model_cfg is not None else args.model,
            model_cfg=model_cfg,
            ckpt_path=args.ckpt, vocab_file=args.vocab,
            vocoder_ckpt_path=args.vocoder_ckpt,
        )
    config = ServerConfig(host=args.host, port=args.port, model_name=args.model,
                          warmup=args.warmup)
    server = TTSServer(wrapper, config)

    async def run():
        if args.ref_audio:
            config.default_references["default"] = (args.ref_audio, args.ref_text)
        elif args.smoke:
            t = np.arange(24000 // 2) / 24000.0
            wav = (0.2 * np.sin(2 * np.pi * 150 * t)).astype(np.float32)
            state = wrapper.preprocess_reference(ref_audio=wav, ref_sample_rate=24000,
                                                 ref_text="xin chao cac ban")
            server.references["default"] = state
            wrapper.ref = state
        await server.startup()
        await server.serve()

    asyncio.run(run())


if __name__ == "__main__":
    main()
