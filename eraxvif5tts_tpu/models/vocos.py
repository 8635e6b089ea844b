"""Vocos vocoder (mel -> waveform), implemented natively in JAX.

The reference calls the external ``vocos`` torch package
(`src/f5_tts/infer/utils_infer.py:101-124`, ``charactr/vocos-mel-24khz``) and pays a
device->host round trip per chunk. Here the whole decoder — ConvNeXt backbone +
ISTFT head — is XLA ops, so mel -> wave stays on-device and fuses into the sampling
jit (SURVEY.md §7 step 5).

Architecture (public Vocos mel-24khz config): embed Conv1d(100->512, k7), LayerNorm,
8x ConvNeXt blocks (dim 512, intermediate 1536, layer-scale gamma), final LayerNorm,
Linear(512 -> n_fft + 2) head producing log-magnitude and phase, ISTFT (center).

``dtype`` is the compute dtype (params stay fp32, cast at use — same policy as
``models/modules.py``); the ISTFT itself always runs fp32: phase -> cos/sin is
precision-sensitive and the irfft einsum is HBM-cheap.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from eraxvif5tts_tpu.ops.stft import istft


class VocosConvNeXtBlock(nn.Module):
    """ConvNeXt-v1 block with layer-scale (no GRN — unlike the DiT text blocks)."""

    dim: int
    intermediate_dim: int
    layer_scale_init: float = 1.0 / 8.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        kernel = self.param(
            "dwconv_kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (7, 1, self.dim),
        )
        bias = self.param("dwconv_bias", nn.initializers.zeros, (self.dim,))
        x = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1,),
            padding=((3, 3),),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.dim,
        ) + bias.astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.intermediate_dim, dtype=self.dtype, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale_init), (self.dim,)
        )
        return residual + (gamma.astype(self.dtype) * x).astype(residual.dtype)


class Vocos(nn.Module):
    """Mel ``[b, n_mels, n]`` -> waveform ``[b, (n-1)*hop]`` (center ISTFT)."""

    input_channels: int = 100
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    n_fft: int = 1024
    hop_length: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        x = mel.swapaxes(1, 2).astype(self.dtype)  # [b, n, n_mels]
        embed_kernel = self.param(
            "embed_kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (7, self.input_channels, self.dim),
        )
        embed_bias = self.param("embed_bias", nn.initializers.zeros, (self.dim,))
        x = jax.lax.conv_general_dilated(
            x, embed_kernel.astype(self.dtype),
            window_strides=(1,),
            padding=((3, 3),),
            dimension_numbers=("NHC", "HIO", "NHC"),
        ) + embed_bias.astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        for i in range(self.num_layers):
            x = VocosConvNeXtBlock(
                self.dim, self.intermediate_dim,
                layer_scale_init=1.0 / self.num_layers,
                dtype=self.dtype,
                name=f"convnext_{i}",
            )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="final_layer_norm")(x)
        x = nn.Dense(self.n_fft + 2, dtype=self.dtype, name="head_out")(x)

        x = x.swapaxes(1, 2).astype(jnp.float32)  # [b, n_fft + 2, n]; ISTFT in fp32
        n_bins = self.n_fft // 2 + 1
        log_mag, phase = x[:, :n_bins], x[:, n_bins:]
        # Upstream Vocos ISTFTHead clips the *magnitude* at 1e2 (not the log-mag),
        # so the spike safeguard actually engages on out-of-distribution mels.
        mag = jnp.clip(jnp.exp(log_mag), None, 1e2)
        real = mag * jnp.cos(phase)
        imag = mag * jnp.sin(phase)
        return istft(real, imag, self.n_fft, self.hop_length, self.n_fft, center=True)


def decode_mel(vocoder: Vocos, params, mel: jnp.ndarray) -> jnp.ndarray:
    """Convenience jittable decode: ``mel [b, n_mels, n]`` -> wave."""
    return vocoder.apply({"params": params}, mel)
