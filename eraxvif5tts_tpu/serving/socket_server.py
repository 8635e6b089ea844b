"""Raw-TCP streaming TTS server.

Parity with reference `src/f5_tts/socket_server.py`:
- protocol: client sends UTF-8 text; server streams raw float32 PCM frames and a
  final ``b"END"`` marker (`socket_server.py:162-173`);
- warm-up generation at startup (`:121-135`);
- adaptive first-package chunking: the very first request's first chunk is re-split
  down to ``few_chars`` then ``min_chars`` so first-audio latency is minimal
  (`:111-119`, `:137-142`), with budgets derived from the reference-prompt
  byte/second ratio (25-second window);
- async wav persistence thread (`AudioFileWriterThread`, `:31-68`).
"""

from __future__ import annotations

import queue
import socket
import struct
import threading
import traceback
from typing import Optional

import numpy as np

from eraxvif5tts_tpu.audio.io import write_wav
from eraxvif5tts_tpu.infer.wrapper import F5TTSWrapper, ReferenceState
from eraxvif5tts_tpu.text.chunk import chunk_text


class AudioFileWriterThread(threading.Thread):
    """Queue-drained wav writer (`socket_server.py:31-68`)."""

    def __init__(self, output_file: str, sample_rate: int):
        super().__init__(daemon=True)
        self.output_file = output_file
        self.sample_rate = sample_rate
        self.queue: queue.Queue = queue.Queue()
        self.stop_event = threading.Event()
        self.chunks: list[np.ndarray] = []

    def run(self):
        while not self.stop_event.is_set() or not self.queue.empty():
            try:
                chunk = self.queue.get(timeout=0.1)
                self.chunks.append(np.asarray(chunk, dtype=np.float32))
            except queue.Empty:
                continue
        if self.chunks:
            write_wav(self.output_file, np.concatenate(self.chunks), self.sample_rate)

    def add_chunk(self, chunk):
        self.queue.put(chunk)

    def stop(self):
        self.stop_event.set()
        self.join()


class TTSStreamingProcessor:
    """Holds the wrapper + reference and streams float32 chunks per request."""

    def __init__(
        self,
        wrapper: F5TTSWrapper,
        ref_audio: Optional[str] = None,
        ref_text: str = "",
        ref_state: Optional[ReferenceState] = None,
        chunk_size: int = 2048,
        output_file: Optional[str] = "output.wav",
        nfe_step: Optional[int] = None,
        warm_up: bool = True,
    ):
        self.wrapper = wrapper
        self.chunk_size = chunk_size
        self.output_file = output_file
        self.nfe_step = nfe_step
        if ref_state is not None:
            self.ref = ref_state
        else:
            self.ref = wrapper.preprocess_reference(ref_audio, ref_text)
        self.sampling_rate = wrapper.target_sample_rate
        self._update_char_budgets()
        self.file_writer_thread: Optional[AudioFileWriterThread] = None
        self.first_package = True
        if warm_up:
            self._warm_up()

    def _update_char_budgets(self):
        """First-package budgets from the ref byte/sec ratio (`:111-119`)."""
        ref_sec = max(self.ref.audio_seconds, 1e-3)
        ref_bytes = max(len(self.ref.text.encode("utf-8")), 1)
        base = ref_bytes / ref_sec * max(25.0 - ref_sec, 1.0)
        self.max_chars = max(int(base), 8)
        self.few_chars = max(int(base / 2), 4)
        self.min_chars = max(int(base / 4), 2)

    def update_reference(self, ref_audio: str, ref_text: str):
        self.ref = self.wrapper.preprocess_reference(ref_audio, ref_text)
        self._update_char_budgets()

    def _warm_up(self):
        self.wrapper.generate("Warm-up text for the model.", ref=self.ref,
                              nfe_step=self.nfe_step, return_numpy=True)

    def generate_stream(self, text: str, send):
        """Synthesize ``text``; call ``send(bytes)`` per float32 chunk, then END."""
        batches = chunk_text(text, max_chars=self.max_chars)
        if self.first_package and batches:
            batches = chunk_text(batches[0], max_chars=self.few_chars) + batches[1:]
            batches = chunk_text(batches[0], max_chars=self.min_chars) + batches[1:]
            self.first_package = False

        if self.file_writer_thread is not None:
            self.file_writer_thread.stop()
        if self.output_file:
            self.file_writer_thread = AudioFileWriterThread(self.output_file, self.sampling_rate)
            self.file_writer_thread.start()

        for batch in batches:
            wave = self.wrapper.generate(batch, ref=self.ref, nfe_step=self.nfe_step,
                                         return_numpy=True)
            for j in range(0, len(wave), self.chunk_size):
                piece = wave[j : j + self.chunk_size]
                if len(piece):
                    send(struct.pack(f"{len(piece)}f", *piece.tolist()))
                    if self.file_writer_thread is not None:
                        self.file_writer_thread.add_chunk(piece)
        send(b"END")
        if self.file_writer_thread is not None:
            self.file_writer_thread.stop()
            self.file_writer_thread = None


def handle_client(conn: socket.socket, processor: TTSStreamingProcessor):
    try:
        with conn:
            while True:
                data = conn.recv(1024)
                if not data:
                    break
                text = data.decode("utf-8").strip()
                if not text:
                    continue
                processor.generate_stream(text, conn.sendall)
    except Exception:
        traceback.print_exc()


def start_server(host: str, port: int, processor: TTSStreamingProcessor):
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind((host, port))
        s.listen()
        print(f"socket TTS server listening on {host}:{port}")
        while True:
            conn, _ = s.accept()
            threading.Thread(target=handle_client, args=(conn, processor), daemon=True).start()


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=9998)
    ap.add_argument("--ckpt_file", default=None)
    ap.add_argument("--vocab_file", default=None)
    ap.add_argument("--ref_audio", default=None)
    ap.add_argument("--ref_text", default="")
    ap.add_argument("--model", default="F5TTS_v1_Base")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--scan-layers", action="store_true",
                    help="serve the scan-over-layers model form (fast cold start)")
    args = ap.parse_args()

    if args.smoke:
        from eraxvif5tts_tpu.configs import ArchConfig, ModelConfig

        cfg = ModelConfig(arch=ArchConfig(dim=64, depth=2, heads=2, dim_head=32,
                                          text_dim=32, conv_layers=1, dropout=0.0,
                                          scan_layers=args.scan_layers))
        vocab = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.,!?-")}
        wrapper = F5TTSWrapper(model_cfg=cfg, vocab_char_map=vocab, nfe_step=4,
                               duration_buckets=(128, 256), text_buckets=(128,))
        t = np.arange(24000 // 2) / 24000.0
        wav = (0.2 * np.sin(2 * np.pi * 150 * t)).astype(np.float32)
        state = wrapper.preprocess_reference(ref_audio=wav, ref_sample_rate=24000,
                                             ref_text="xin chao cac ban")
        processor = TTSStreamingProcessor(wrapper, ref_state=state, nfe_step=4,
                                          output_file=None)
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
            ckpt_path=args.ckpt_file, vocab_file=args.vocab_file)
        processor = TTSStreamingProcessor(wrapper, ref_audio=args.ref_audio,
                                          ref_text=args.ref_text)
    start_server(args.host, args.port, processor)


if __name__ == "__main__":
    main()
