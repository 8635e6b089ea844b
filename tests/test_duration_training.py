"""Two-phase duration-predictor curriculum inside the Trainer (reference
`trainer.py:240-300, 829-1079` semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eraxvif5tts_tpu.configs import ArchConfig
from eraxvif5tts_tpu.models.cfm import CFM
from eraxvif5tts_tpu.models.dit import DiT
from eraxvif5tts_tpu.models.duration import DurationPredictor
from eraxvif5tts_tpu.training.dataset import Sample, collate
from eraxvif5tts_tpu.training.trainer import Trainer, make_optimizer

ARCH = ArchConfig(dim=32, depth=1, heads=2, dim_head=16, ff_mult=2, text_dim=16,
                  conv_layers=0, dropout=0.0)
MEL = 8


def _batch(b=2, n=16, np_ids=5):
    rng = np.random.default_rng(0)
    return {
        "mel": rng.standard_normal((b, n, MEL)).astype(np.float32),
        "text": np.tile(np.asarray([[1, 2, 3, -1]], np.int32), (b, 1)),
        "lens": np.full((b,), n, np.int32),
        "phoneme": np.tile(np.asarray([[1, 2, 3, 2, 0]], np.int32), (b, 1)),
    }


def _trainer(focus_updates=2):
    dit = DiT(arch=ARCH, text_num_embeds=8, mel_dim=MEL)
    return Trainer(
        cfm=CFM(transformer=dit),
        optimizer=make_optimizer(total_updates=100),
        duration_predictor=DurationPredictor(vocab_size=16, d_model=16, d_filter=16),
        duration_focus_updates=focus_updates,
        ema_update_after_step=0, ema_update_every=1,
    )


def test_duration_focus_phase_freezes_main_model():
    trainer = _trainer(focus_updates=100)  # stay in phase 1
    state = trainer.init_state(jax.random.key(0))
    params0 = jax.tree.map(np.asarray, state.params)
    dur0 = jax.tree.map(np.asarray, state.dur_pred_params)
    state, metrics = trainer.train_step(state, _batch(), jax.random.key(1))
    assert {"loss", "cfm_loss", "duration_loss", "duration_mae"} <= set(metrics)
    assert np.isfinite(float(metrics["loss"]))
    # phase 1: main model frozen, duration predictor moves
    main_delta = sum(
        float(np.abs(np.asarray(a) - b).sum())
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(params0))
    )
    dur_delta = sum(
        float(np.abs(np.asarray(a) - b).sum())
        for a, b in zip(jax.tree.leaves(state.dur_pred_params), jax.tree.leaves(dur0))
    )
    assert main_delta == 0.0
    assert dur_delta > 0.0
    # frozen align copy untouched
    np.testing.assert_array_equal(
        np.asarray(state.dur_align_params["embed"]["embedding"]),
        np.asarray(dur0["embed"]["embedding"]),
    )


def test_phase2_unfreezes_main_model():
    trainer = _trainer(focus_updates=1)
    state = trainer.init_state(jax.random.key(0))
    state, _ = trainer.train_step(state, _batch(), jax.random.key(1))  # phase 1
    params1 = jax.tree.map(np.asarray, state.params)
    state, _ = trainer.train_step(state, _batch(), jax.random.key(2))  # -> phase 2
    assert trainer.alignment_manager.phase == 2
    main_delta = sum(
        float(np.abs(np.asarray(a) - b).sum())
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(params1))
    )
    assert main_delta > 0.0


def test_collate_emits_phoneme_ids():
    vocab = {c: i for i, c in enumerate(" abc")}
    phoneme_map: dict = {}
    samples = [
        Sample(text="ab", duration_frames=10, mel=np.ones((10, 4), np.float32),
               phoneme="a b ab"),
        Sample(text="c", duration_frames=8, mel=np.ones((8, 4), np.float32),
               phoneme="c"),
    ]
    out = collate(samples, vocab, frame_buckets=(16,), text_buckets=(8,),
                  phoneme_map=phoneme_map)
    assert out["phoneme"].shape == (2, 8)
    assert out["phoneme"][0, 0] == phoneme_map["a"]
    assert out["phoneme"][1, 1] == 0  # padding
    assert len(phoneme_map) == 4  # a, b, ab, c


def test_alignment_viz_dump(tmp_path):
    """train() writes the periodic alignment JSON snapshot when duration
    training is active (reference `trainer.py:1272-1277`)."""
    import json
    import os

    trainer = _trainer(focus_updates=100)
    trainer.checkpoint_dir = str(tmp_path)
    state = trainer.init_state(jax.random.key(0))
    batches = [_batch() for _ in range(5)]  # dump cadence is log_every * 5
    trainer.train(state, batches, jax.random.key(1), log_every=1,
                  save_per_updates=0)
    files = os.listdir(tmp_path / "alignments")
    assert files, "no alignment viz dumped"
    viz = json.loads((tmp_path / "alignments" / files[0]).read_text())
    assert viz["samples"] and viz["samples"][0]["durations"]
    assert viz["samples"][0]["mel_len"] == 16
    assert viz["coverage"] is not None
