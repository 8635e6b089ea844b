"""Model zoo: DiT / UNetT / MMDiT backbones, CFM wrapper, duration predictor, Vocos."""

from eraxvif5tts_tpu.models.dit import DiT  # noqa: F401
from eraxvif5tts_tpu.models.unett import UNetT  # noqa: F401
from eraxvif5tts_tpu.models.mmdit import MMDiT  # noqa: F401
from eraxvif5tts_tpu.models.cfm import CFM, SamplingConfig  # noqa: F401
from eraxvif5tts_tpu.models.vocos import Vocos  # noqa: F401
from eraxvif5tts_tpu.models.duration import DurationPredictor  # noqa: F401


def build_backbone(config, text_num_embeds: int, compute_dtype=None):
    """Resolve ``config.backbone`` -> flax module (the TPU equivalent of
    ``hydra.utils.get_class`` resolution at reference `f5tts_wrapper.py:134`)."""
    import jax.numpy as jnp

    cls = {"DiT": DiT, "UNetT": UNetT, "MMDiT": MMDiT}.get(config.backbone)
    if cls is None:
        raise ValueError(f"unknown backbone {config.backbone!r}")
    return cls(
        arch=config.arch,
        text_num_embeds=text_num_embeds,
        mel_dim=config.mel_spec.n_mel_channels,
        compute_dtype=compute_dtype if compute_dtype is not None else jnp.float32,
    )
