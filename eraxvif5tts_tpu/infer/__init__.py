"""Inference layer: flagship wrapper API, batch/streaming synthesis, porcelain API."""

from eraxvif5tts_tpu.infer.wrapper import F5TTSWrapper, ReferenceState  # noqa: F401
