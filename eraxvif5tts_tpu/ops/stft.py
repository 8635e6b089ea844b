"""STFT / mel-spectrogram / ISTFT as MXU-friendly XLA ops.

The reference extracts mels through torchaudio/librosa CUDA kernels (reference
`src/f5_tts/model/modules.py:30-143`). On TPU we instead express the STFT as a single
strided 1-D convolution against a precomputed windowed-DFT basis, which XLA lowers to
an ``[n_frames, n_fft] @ [n_fft, 2*(n_fft//2+1)]`` matmul on the MXU. The ISTFT
(needed by the Vocos vocoder head, so mel -> waveform stays on-device) is the adjoint:
a per-frame inverse-rDFT matmul followed by a fully vectorized shift-and-add
overlap-add exploiting ``n_fft % hop == 0``.

Semantics parity:
- ``vocos`` path == torchaudio ``MelSpectrogram(power=1, center=True, norm=None,
  mel_scale="htk")`` then ``clamp(1e-5).log()`` (`modules.py:75-101`).
- ``bigvgan`` path == manual reflect pad of ``(n_fft - hop)//2`` with ``center=False``
  and ``sqrt(re^2+im^2+1e-9)`` magnitude, Slaney filterbank (`modules.py:30-72`).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from eraxvif5tts_tpu.ops.mel import mel_filterbank


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (matches ``torch.hann_window(periodic=True)``)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(dtype)


@functools.lru_cache(maxsize=8)
def _stft_basis(n_fft: int, win_length: int) -> np.ndarray:
    """Windowed real-DFT basis, shape ``[2 * n_bins, n_fft]`` (cos rows then -sin rows).

    ``X[k] = sum_n w[n] x[n] exp(-2i pi k n / N)`` -> real part uses cos, imaginary
    part uses -sin.
    """
    n_bins = n_fft // 2 + 1
    window = hann_window(win_length, dtype=np.float64)
    if win_length < n_fft:  # center-pad window to n_fft
        pad = (n_fft - win_length) // 2
        window = np.pad(window, (pad, n_fft - win_length - pad))
    k = np.arange(n_bins)[:, None]
    n = np.arange(n_fft)[None, :]
    angle = 2.0 * np.pi * k * n / n_fft
    basis = np.concatenate([np.cos(angle), -np.sin(angle)], axis=0) * window[None, :]
    return basis.astype(np.float32)


def _frame_conv(wav: jnp.ndarray, basis: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """Strided conv1d: wav [b, t] x basis [c, n_fft] -> [b, c, n_frames]."""
    lhs = wav[:, None, :]  # [b, 1, t]
    rhs = basis[:, None, :]  # [c, 1, n_fft]
    out = jax.lax.conv_general_dilated(
        lhs.astype(basis.dtype),
        rhs,
        window_strides=(hop_length,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out


def _reflect_pad(wav: jnp.ndarray, pad: int) -> jnp.ndarray:
    return jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")


def stft_magnitude(
    wav: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    center: bool = True,
    pad: int | None = None,
    magnitude_eps: float = 0.0,
) -> jnp.ndarray:
    """Magnitude STFT of ``wav [b, t]`` -> ``[b, n_bins, n_frames]``.

    ``center=True`` reflect-pads ``n_fft//2`` on both sides (torch.stft semantics);
    otherwise ``pad`` samples are reflect-padded (BigVGAN uses ``(n_fft-hop)//2``).
    """
    if center:
        wav = _reflect_pad(wav, n_fft // 2)
    elif pad:
        wav = _reflect_pad(wav, pad)
    basis = jnp.asarray(_stft_basis(n_fft, win_length))
    spec = _frame_conv(wav, basis, hop_length)  # [b, 2*n_bins, n_frames]
    n_bins = n_fft // 2 + 1
    re, im = spec[:, :n_bins], spec[:, n_bins:]
    power = re * re + im * im
    if magnitude_eps:
        power = power + magnitude_eps
    return jnp.sqrt(power)


@functools.lru_cache(maxsize=8)
def _istft_basis(n_fft: int) -> np.ndarray:
    """Inverse-rDFT basis ``[2 * n_bins, n_fft]`` mapping (Re, Im) rows to time samples.

    ``x[n] = (1/N) * [X[0] + 2 sum_{0<k<N/2} (Re_k cos - Im_k sin) + X[N/2] cos(pi n)]``
    """
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins)[:, None]
    n = np.arange(n_fft)[None, :]
    angle = 2.0 * np.pi * k * n / n_fft
    scale = np.full((n_bins, 1), 2.0 / n_fft)
    scale[0] = 1.0 / n_fft
    scale[-1] = 1.0 / n_fft
    cos_basis = np.cos(angle) * scale
    sin_basis = -np.sin(angle) * (2.0 / n_fft)  # k=0 and k=N/2 rows are all-zero sin anyway
    return np.concatenate([cos_basis, sin_basis], axis=0).astype(np.float32)


def _overlap_add(frames: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """Overlap-add of ``frames [b, n_frames, n_fft]`` with ``n_fft % hop == 0``.

    Splits each frame into ``r = n_fft // hop`` hop-sized pieces; piece ``m`` of frame
    ``j`` lands in output block ``j + m``. This is r shifted adds — no scatter.
    """
    b, n_frames, n_fft = frames.shape
    r = n_fft // hop_length
    assert r * hop_length == n_fft, "overlap-add requires n_fft % hop_length == 0"
    pieces = frames.reshape(b, n_frames, r, hop_length)
    n_blocks = n_frames + r - 1
    out = jnp.zeros((b, n_blocks, hop_length), frames.dtype)
    for m in range(r):
        out = out.at[:, m : m + n_frames].add(pieces[:, :, m])
    return out.reshape(b, n_blocks * hop_length)


def istft(
    real: jnp.ndarray,
    imag: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    center: bool = True,
    envelope_eps: float = 1e-11,
) -> jnp.ndarray:
    """Inverse STFT with Hann synthesis window and window-envelope normalization.

    ``real/imag``: ``[b, n_bins, n_frames]`` -> waveform ``[b, (n_frames-1)*hop]``
    (center=True trims n_fft//2 from each side, matching ``torch.istft``).
    """
    basis = jnp.asarray(_istft_basis(n_fft))
    spec = jnp.concatenate([real, imag], axis=1)  # [b, 2*n_bins, n_frames]
    frames = jnp.einsum(
        "bcn,cf->bnf", spec, basis, precision=jax.lax.Precision.HIGHEST
    )  # irfft per frame

    window = jnp.asarray(hann_window(win_length))
    if win_length < n_fft:
        p = (n_fft - win_length) // 2
        window = jnp.pad(window, (p, n_fft - win_length - p))
    frames = frames * window[None, None, :]

    wave = _overlap_add(frames, hop_length)
    n_frames = real.shape[-1]
    env_frames = jnp.broadcast_to((window * window)[None, None, :], (1, n_frames, n_fft))
    envelope = _overlap_add(env_frames, hop_length)
    wave = wave / jnp.maximum(envelope, envelope_eps)

    if center:
        half = n_fft // 2
        wave = wave[:, half : wave.shape[1] - half]
    return wave


@dataclass(frozen=True)
class MelSpectrogram:
    """Raw waveform -> log-mel frames. Jittable; all shapes static.

    Behavior parity target: reference ``MelSpec`` (`modules.py:104-143`). Output is
    ``[b, n_mels, n_frames]`` with natural-log of the 1e-5-clamped mel magnitude.
    """

    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mel_channels: int = 100
    target_sample_rate: int = 24000
    mel_spec_type: str = "vocos"  # "vocos" | "bigvgan"

    @functools.cached_property
    def _filterbank(self) -> np.ndarray:
        variant = "htk" if self.mel_spec_type == "vocos" else "slaney"
        return mel_filterbank(
            self.target_sample_rate, self.n_fft, self.n_mel_channels, variant=variant
        )

    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        if wav.ndim == 3:  # [b, 1, t] -> [b, t]
            wav = wav[:, 0, :]
        assert wav.ndim == 2, f"expected [b, t] waveform, got {wav.shape}"
        if self.mel_spec_type == "vocos":
            mag = stft_magnitude(
                wav, self.n_fft, self.hop_length, self.win_length, center=True
            )
        elif self.mel_spec_type == "bigvgan":
            mag = stft_magnitude(
                wav,
                self.n_fft,
                self.hop_length,
                self.win_length,
                center=False,
                pad=(self.n_fft - self.hop_length) // 2,
                magnitude_eps=1e-9,
            )
        else:
            raise ValueError(f"unknown mel_spec_type: {self.mel_spec_type!r}")
        fb = jnp.asarray(self._filterbank)
        mel = jnp.einsum("mf,bfn->bmn", fb, mag, precision=jax.lax.Precision.HIGHEST)
        return jnp.log(jnp.clip(mel, min=1e-5))
