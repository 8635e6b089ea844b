"""Griffin-Lim mel inversion (`audio/griffin_lim.py`): audio with no trained
vocoder — roundtrip through the production mel frontend recovers the tone."""

import numpy as np

import jax
import jax.numpy as jnp

from eraxvif5tts_tpu.audio.griffin_lim import griffin_lim_mel
from eraxvif5tts_tpu.ops.stft import MelSpectrogram


def test_griffin_lim_recovers_tone():
    sr, f0 = 24000, 440.0
    t = np.arange(sr) / sr
    wav = (0.4 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    mel_spec = MelSpectrogram(n_fft=1024, hop_length=256, win_length=1024,
                              n_mel_channels=100, target_sample_rate=sr)
    mel = np.asarray(jax.jit(mel_spec.__call__)(jnp.asarray(wav[None])))[0]

    rec = griffin_lim_mel(mel, n_iter=24)
    assert np.isfinite(rec).all() and len(rec) > sr // 2
    assert np.abs(rec).max() <= 1.0

    window = rec[2048:2048 + 8192] * np.hanning(8192)
    freq = np.fft.rfftfreq(8192, 1 / sr)[np.argmax(np.abs(np.fft.rfft(window)))]
    assert abs(freq - f0) < 15.0, freq
