"""Serving-layer integration tests: HTTP endpoints + socket streaming protocol
(tiny model, 2 NFE steps, small buckets)."""

import asyncio
import http.client
import json
import socket
import threading
import time

import numpy as np
import pytest

from eraxvif5tts_tpu.configs import ArchConfig, ModelConfig
from eraxvif5tts_tpu.infer.wrapper import F5TTSWrapper
from eraxvif5tts_tpu.serving.http_server import ServerConfig, TTSServer
from eraxvif5tts_tpu.serving.socket_server import TTSStreamingProcessor
from eraxvif5tts_tpu.serving.wave_stream import create_wave_header, float_to_int16_bytes

SR = 24000


@pytest.fixture(scope="module")
def wrapper():
    cfg = ModelConfig(arch=ArchConfig(dim=32, depth=1, heads=2, dim_head=16,
                                      text_dim=16, conv_layers=0, dropout=0.0))
    vocab = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.,!?")}
    w = F5TTSWrapper(model_cfg=cfg, vocab_char_map=vocab, nfe_step=2,
                     duration_buckets=(64, 128), text_buckets=(64,))
    t = np.arange(SR // 4) / SR
    wav = (0.2 * np.sin(2 * np.pi * 150 * t)).astype(np.float32)
    state = w.preprocess_reference(ref_audio=wav, ref_sample_rate=SR,
                                   ref_text="hello ref")
    w.ref = state
    return w


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def http_port(wrapper):
    port = _free_port()
    server = TTSServer(wrapper, ServerConfig(host="127.0.0.1", port=port, nfe_step=2))
    server.references["default"] = wrapper.ref

    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(server.serve())

    thread = threading.Thread(target=run, daemon=True)
    thread.start()
    # wait for socket
    for _ in range(100):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=0.2):
                break
        except OSError:
            time.sleep(0.1)
    yield port
    loop.call_soon_threadsafe(loop.stop)


def test_http_health_and_references(http_port):
    conn = http.client.HTTPConnection("127.0.0.1", http_port, timeout=30)
    conn.request("GET", "/health")
    resp = conn.getresponse()
    health = json.loads(resp.read())
    assert resp.status == 200 and health["status"] == "healthy"
    conn.request("GET", "/references")
    refs = json.loads(conn.getresponse().read())
    assert refs["references"]["default"]["status"] == "ready"


def test_http_stream_returns_wav(http_port):
    conn = http.client.HTTPConnection("127.0.0.1", http_port, timeout=600)
    body = json.dumps({"text": "hi there.", "reference_id": "default",
                       "nfe_step": 2, "seed": 0})
    conn.request("POST", "/tts/stream", body=body,
                 headers={"content-type": "application/json"})
    resp = conn.getresponse()
    data = resp.read()
    assert resp.status == 200
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    assert len(data) > 44 + 1000  # header + some PCM


def test_http_error_paths(http_port):
    conn = http.client.HTTPConnection("127.0.0.1", http_port, timeout=30)
    conn.request("POST", "/tts/stream", body=json.dumps({"text": ""}),
                 headers={"content-type": "application/json"})
    assert conn.getresponse().status == 400
    conn.request("POST", "/tts/stream", body=json.dumps({"text": "x", "reference_id": "missing"}),
                 headers={"content-type": "application/json"})
    assert conn.getresponse().status == 404
    conn.request("GET", "/nope")
    assert conn.getresponse().status == 404


def test_http_oversize_body_rejected(http_port):
    """A content-length beyond max_body_bytes is refused BEFORE buffering (413)."""
    with socket.create_connection(("127.0.0.1", http_port), timeout=30) as s:
        huge = 10 * 1024 * 1024 * 1024  # 10 GiB claim
        s.sendall(
            f"POST /tts/stream HTTP/1.1\r\nhost: x\r\ncontent-type: application/json\r\n"
            f"content-length: {huge}\r\n\r\n".encode()
        )
        status = s.recv(4096).decode("latin1").split("\r\n")[0]
    assert "413" in status


def _stream_bytes(port, text, reference_id, seed=0):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    body = json.dumps({"text": text, "reference_id": reference_id,
                       "nfe_step": 2, "seed": seed})
    conn.request("POST", "/tts/stream", body=body,
                 headers={"content-type": "application/json"})
    resp = conn.getresponse()
    data = resp.read()
    assert resp.status == 200
    return data


def test_http_concurrent_streams_no_crosstalk(http_port, wrapper):
    """Two parallel /tts/stream requests with DIFFERENT references produce exactly
    the same audio as when run serially — the immutable per-request ReferenceState
    holds under load (the reference server mutates shared wrapper attrs,
    `f5tts-fastapi-server.py:327-343`)."""
    # upload a second, different-sounding reference through the real endpoint
    t = np.arange(SR // 4) / SR
    wav2 = (0.2 * np.sin(2 * np.pi * 420 * t)).astype(np.float32)
    import io
    import wave as wave_mod

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(SR)
        wf.writeframes((wav2 * 32767).astype("<i2").tobytes())
    boundary = "x123"
    parts = (
        f'--{boundary}\r\ncontent-disposition: form-data; name="reference_id"\r\n\r\nalt\r\n'
        f'--{boundary}\r\ncontent-disposition: form-data; name="ref_text"\r\n\r\nother ref\r\n'
        f'--{boundary}\r\ncontent-disposition: form-data; name="file"; filename="a.wav"\r\n'
        "content-type: audio/wav\r\n\r\n"
    ).encode() + buf.getvalue() + f"\r\n--{boundary}--\r\n".encode()
    conn = http.client.HTTPConnection("127.0.0.1", http_port, timeout=60)
    conn.request("POST", "/upload_reference", body=parts,
                 headers={"content-type": f"multipart/form-data; boundary={boundary}"})
    assert conn.getresponse().status == 202
    for _ in range(300):
        conn.request("GET", "/references")
        refs = json.loads(conn.getresponse().read())["references"]
        if refs.get("alt", {}).get("status") == "ready":
            break
        time.sleep(0.2)
    assert refs["alt"]["status"] == "ready"

    # serial baselines
    want_a = _stream_bytes(http_port, "hello there.", "default")
    want_b = _stream_bytes(http_port, "hello there.", "alt")
    assert want_a != want_b  # different references actually change the audio

    # concurrent run: each request must still match its own serial baseline
    results = {}

    def worker(key, ref_id):
        results[key] = _stream_bytes(http_port, "hello there.", ref_id)

    threads = [threading.Thread(target=worker, args=("a", "default")),
               threading.Thread(target=worker, args=("b", "alt"))]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    assert results["a"] == want_a
    assert results["b"] == want_b


def test_socket_processor_streams_chunks(wrapper):
    proc = TTSStreamingProcessor(wrapper, ref_state=wrapper.ref, nfe_step=2,
                                 output_file=None, warm_up=False, chunk_size=512)
    sent: list[bytes] = []
    proc.generate_stream("hello world.", sent.append)
    assert sent[-1] == b"END"
    total = sum(len(b) for b in sent[:-1])
    assert total > 0 and total % 4 == 0  # float32 frames
    wave = np.frombuffer(b"".join(sent[:-1]), dtype=np.float32)
    assert np.isfinite(wave).all()
    # first package split into smaller chunks only once
    assert proc.first_package is False


def test_wave_header_and_pcm():
    header = create_wave_header(24000)
    assert header[:4] == b"RIFF" and header[8:12] == b"WAVE" and len(header) == 44
    pcm = float_to_int16_bytes(np.asarray([0.0, 1.0, -1.0]))
    assert np.frombuffer(pcm, "<i2").tolist() == [0, 32767, -32767]


def test_http_root_serves_full_client(http_port):
    """GET / serves the real streaming client page (serving/client.html), not
    the fallback shim; it must reference every endpoint it drives."""
    conn = http.client.HTTPConnection("127.0.0.1", http_port, timeout=30)
    conn.request("GET", "/")
    resp = conn.getresponse()
    page = resp.read().decode("utf-8")
    assert resp.status == 200
    assert "EraXviF5TTS-TPU streaming client" in page
    for endpoint in ("/tts/stream", "/upload_reference", "/references", "/health"):
        assert endpoint in page, endpoint
    # the improvement over the reference page: chunk-streaming playback
    assert "getReader" in page and "AudioContext" in page


def test_http_speaker_alias_and_crossfade(http_port):
    """`speaker` (reference client field name) selects the reference like
    `reference_id`; cross_fade_duration is accepted."""
    conn = http.client.HTTPConnection("127.0.0.1", http_port, timeout=600)
    body = json.dumps({"text": "alias check.", "speaker": "default",
                       "nfe_step": 2, "seed": 0, "cross_fade_duration": 0.05})
    conn.request("POST", "/tts/stream", body=body,
                 headers={"content-type": "application/json"})
    resp = conn.getresponse()
    data = resp.read()
    assert resp.status == 200 and data[:4] == b"RIFF" and len(data) > 1044
    # unknown speaker still 404s through the alias path
    conn.request("POST", "/tts/stream",
                 body=json.dumps({"text": "x", "speaker": "missing"}),
                 headers={"content-type": "application/json"})
    assert conn.getresponse().status == 404


def test_socket_processor_streams_with_scan_form():
    """The socket streaming path serves a scan_layers model identically in
    protocol terms (chunks + END)."""
    cfg = ModelConfig(arch=ArchConfig(dim=32, depth=2, heads=2, dim_head=16,
                                      text_dim=16, conv_layers=0, dropout=0.0,
                                      scan_layers=True))
    vocab = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.,!?")}
    w = F5TTSWrapper(model_cfg=cfg, vocab_char_map=vocab, nfe_step=2,
                     duration_buckets=(64, 128), text_buckets=(64,))
    assert "blocks" in w.params
    t = np.arange(SR // 4) / SR
    wav = (0.2 * np.sin(2 * np.pi * 150 * t)).astype(np.float32)
    state = w.preprocess_reference(ref_audio=wav, ref_sample_rate=SR,
                                   ref_text="hello ref")
    proc = TTSStreamingProcessor(w, ref_state=state, nfe_step=2, output_file=None)
    chunks = []
    proc.generate_stream("a scan form test.", chunks.append)
    assert chunks and chunks[-1] == b"END"
    pcm = b"".join(c for c in chunks[:-1])
    assert len(pcm) > 0 and len(pcm) % 4 == 0  # float32 frames
    assert np.isfinite(np.frombuffer(pcm, np.float32)).all()
