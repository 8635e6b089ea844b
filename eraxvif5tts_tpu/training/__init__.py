"""Training: sharded train step, optimizer schedule, EMA, Orbax checkpointing,
frame-budget batching, duration-predictor curriculum, distillation."""

from eraxvif5tts_tpu.training.trainer import Trainer, TrainState, make_optimizer  # noqa: F401
