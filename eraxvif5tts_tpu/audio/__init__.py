"""Host-side audio utilities: WAV IO, resampling, silence detection.

Replaces the reference's pydub/ffmpeg + torchaudio host dependencies
(`src/f5_tts/infer/utils_infer.py:273-360`) with numpy/scipy implementations using
the same thresholds, so the serving path has no native-audio dependency.
"""

from eraxvif5tts_tpu.audio.io import read_wav, write_wav  # noqa: F401
from eraxvif5tts_tpu.audio.resample import resample  # noqa: F401
from eraxvif5tts_tpu.audio.silence import (  # noqa: F401
    clip_reference_audio,
    detect_leading_silence,
    remove_silence_edges,
    split_on_silence,
)
