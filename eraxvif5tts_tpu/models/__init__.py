"""Model zoo: DiT / UNetT / MMDiT backbones, CFM wrapper, duration predictor, Vocos."""

from eraxvif5tts_tpu.models.dit import DiT  # noqa: F401
from eraxvif5tts_tpu.models.cfm import CFM, SamplingConfig  # noqa: F401
