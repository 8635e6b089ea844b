"""End-to-end training sanity: a tiny model overfitting one batch must reduce the
flow-matching loss (the closest thing to the reference's listen-to-the-samples QA,
SURVEY.md §4, runnable in CI)."""

import numpy as np
import pytest

import jax

from eraxvif5tts_tpu.configs import ArchConfig
from eraxvif5tts_tpu.models.cfm import CFM
from eraxvif5tts_tpu.models.dit import DiT
from eraxvif5tts_tpu.training.trainer import Trainer, make_optimizer


def test_overfit_single_batch_loss_decreases():
    arch = ArchConfig(dim=32, depth=1, heads=2, dim_head=16, ff_mult=2, text_dim=16,
                      conv_layers=0, dropout=0.0)
    dit = DiT(arch=arch, text_num_embeds=8, mel_dim=8)
    cfm = CFM(transformer=dit, frac_lengths_mask=(0.7, 0.71),
              audio_drop_prob=0.0, cond_drop_prob=0.0)
    trainer = Trainer(cfm=cfm,
                      optimizer=make_optimizer(learning_rate=3e-3,
                                               num_warmup_updates=1,
                                               total_updates=200))
    state = trainer.init_state(jax.random.key(0))
    rng = np.random.default_rng(0)
    batch = {
        "mel": rng.standard_normal((8, 16, 8)).astype(np.float32),
        "text": np.tile(np.asarray([[1, 2, 3, 4]], np.int32), (8, 1)),
        "lens": np.full((8,), 16, np.int32),
    }
    losses = []
    for i in range(30):
        # fixed rng -> fixed noise/time/span: the model can actually overfit
        state, metrics = trainer.train_step(state, batch, jax.random.key(7))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    # robust decrease check: mean of last 5 well below mean of first 5
    assert np.mean(losses[-5:]) < 0.5 * np.mean(losses[:5]), losses[::5]
