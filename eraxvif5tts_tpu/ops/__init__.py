"""TPU compute ops: STFT/mel frontend, ISTFT, attention, rotary embeddings.

Everything here is a pure jittable function on static shapes. The STFT and ISTFT are
formulated as 1-D convolutions against precomputed windowed-DFT bases so XLA lowers
them onto the MXU instead of emitting FFT loops.
"""

from eraxvif5tts_tpu.ops.mel import mel_filterbank  # noqa: F401
from eraxvif5tts_tpu.ops.stft import stft_magnitude, istft, MelSpectrogram  # noqa: F401
