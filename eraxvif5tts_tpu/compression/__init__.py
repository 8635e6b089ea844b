"""Checkpoint surgery toolkit: torch<->JAX conversion, pruning, inspection."""

from eraxvif5tts_tpu.compression.convert import (  # noqa: F401
    dit_params_from_torch,
    dit_params_to_torch,
    load_state_dict,
    normalize_reference_state_dict,
    vocos_params_from_torch,
)
