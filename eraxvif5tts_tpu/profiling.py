"""Tracing / profiling utilities (SURVEY.md §5: replaces the reference's ad-hoc
wall-clock prints with ``jax.profiler`` traces and explicit RTF / first-chunk
metrics)."""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/eraxvif5tts_trace"):
    """Capture a ``jax.profiler`` trace viewable in TensorBoard/Perfetto."""
    import jax

    with jax.profiler.trace(log_dir):
        yield log_dir


def force_sync(x) -> None:
    """Reliable device sync: transfer one element to host.

    ``block_until_ready`` does not reliably synchronize on tunneled platforms
    (observed on the axon v5e tunnel); a tiny host transfer always does.
    """
    if hasattr(x, "ndim") and x.ndim > 0:
        x = x[(0,) * x.ndim]
    np.asarray(x)


@dataclass
class RTFMeter:
    """Accumulates synthesis wall-time vs audio duration (the serving KPI)."""

    sample_rate: int = 24000
    total_audio_samples: int = 0
    total_wall_seconds: float = 0.0
    chunks: list[float] = field(default_factory=list)
    first_chunk_latencies: list[float] = field(default_factory=list)
    _t0: Optional[float] = None
    _first_seen: bool = False

    def start_request(self) -> None:
        self._t0 = time.perf_counter()
        self._first_seen = False

    def record_chunk(self, n_samples: int) -> None:
        assert self._t0 is not None, "call start_request() first"
        now = time.perf_counter()
        if not self._first_seen:
            self.first_chunk_latencies.append(now - self._t0)
            self._first_seen = True
        self.total_audio_samples += n_samples

    def end_request(self) -> None:
        assert self._t0 is not None
        self.total_wall_seconds += time.perf_counter() - self._t0
        self._t0 = None

    @property
    def rtf(self) -> float:
        audio = self.total_audio_samples / self.sample_rate
        return audio / max(self.total_wall_seconds, 1e-9)

    def summary(self) -> dict:
        lat = sorted(self.first_chunk_latencies)
        return {
            "rtf": round(self.rtf, 3),
            "audio_seconds": round(self.total_audio_samples / self.sample_rate, 2),
            "wall_seconds": round(self.total_wall_seconds, 2),
            "first_chunk_p50_ms": round(1000 * lat[len(lat) // 2], 1) if lat else None,
            "requests": len(self.first_chunk_latencies),
        }

    def dump(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            json.dump(self.summary(), f, indent=2)
