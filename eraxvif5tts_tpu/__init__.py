"""EraXviF5TTS-TPU: a TPU-native (JAX/XLA/Pallas/pjit) zero-shot voice-cloning TTS framework.

A from-scratch rebuild of the capabilities of hungkq-1724/EraXviF5TTS (an F5-TTS fork
specialized for Vietnamese voice cloning) designed TPU-first:

- Flow-matching DiT over mel frames; Euler ODE sampler as one ``lax.scan`` jit region
  with classifier-free guidance folded into the batch axis.
- Mel/STFT frontend and the Vocos ISTFT vocoder head as on-device XLA convolutions /
  matmuls (MXU-friendly), so text -> waveform never leaves the chip.
- Data-parallel / tensor-parallel training via ``jax.sharding.Mesh`` + ``pjit``;
  gradient reduction is an XLA ``psum`` over ICI.
- Static duration buckets everywhere instead of dynamic shapes.

Reference behavior map: see SURVEY.md at the repo root; parity citations to the
reference sources live in each module docstring.
"""

__version__ = "0.1.0"

from eraxvif5tts_tpu.configs import ModelConfig, MelSpecConfig  # noqa: F401
