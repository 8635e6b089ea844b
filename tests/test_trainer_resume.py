"""Trainer round-2 behaviors: real gradient accumulation, NaN-skip, mid-epoch
interrupt/resume bit-exactness, duration-state checkpoint restore, adaptive
duration weight (reference `trainer.py:1196-1206, 1230-1280`, `distil_reload.py:1126`)."""

import itertools

import numpy as np

import jax
import jax.numpy as jnp
import optax

from eraxvif5tts_tpu.configs import ArchConfig
from eraxvif5tts_tpu.models.cfm import CFM
from eraxvif5tts_tpu.models.dit import DiT
from eraxvif5tts_tpu.models.duration import DurationPredictor
from eraxvif5tts_tpu.training.trainer import (
    Trainer,
    TrainState,
    alignment_quality_metrics,
    make_optimizer,
)

ARCH = ArchConfig(dim=32, depth=1, heads=2, dim_head=16, ff_mult=2, text_dim=16,
                  conv_layers=0, dropout=0.0)
MEL = 8


def _cfm():
    return CFM(transformer=DiT(arch=ARCH, text_num_embeds=8, mel_dim=MEL))


def _batch(seed=0, b=2, n=16):
    rng = np.random.default_rng(seed)
    return {
        "mel": rng.standard_normal((b, n, MEL)).astype(np.float32),
        "text": np.asarray([[1, 2, -1], [3, 1, -1]], np.int32),
        "lens": np.full((b,), n, np.int32),
    }


def _tree_np(tree):
    return jax.tree.map(np.asarray, tree)


def _tree_allclose(a, b, **kw):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), **kw)


# ---------------------------------------------------------------------------
# gradient accumulation


def test_grad_accumulation_matches_mean_gradient_update():
    """k=4 accumulation == one base-optimizer update on the mean of the 4
    micro-gradients (the accelerate-accumulate semantics, `trainer.py:1230`)."""
    cfm = _cfm()
    base_opt = make_optimizer(total_updates=100, num_warmup_updates=1)
    trainer = Trainer(cfm=cfm, optimizer=base_opt, grad_accumulation_steps=4,
                      ema_update_after_step=0, ema_update_every=1)
    state = trainer.init_state(jax.random.key(0))
    params0 = _tree_np(state.params)

    batches = [_batch(seed=i) for i in range(4)]
    rngs = [jax.random.key(10 + i) for i in range(4)]

    for i in range(4):
        state, metrics = trainer.train_step(state, batches[i], rngs[i])
        if i < 3:
            # mid-accumulation: no update applied, params and step unchanged
            assert int(state.step) == 0
            assert float(metrics["applied"]) == 0.0
            _tree_allclose(state.params, params0)
    assert int(state.step) == 1
    assert float(metrics["applied"]) == 1.0

    # manual mean-gradient update through the *unwrapped* optimizer
    def loss_fn(params, batch, rng):
        loss, _, _ = cfm.loss(params, jnp.asarray(batch["mel"]),
                              jnp.asarray(batch["text"]), jnp.asarray(batch["lens"]),
                              rng)
        return loss

    grad_fn = jax.jit(jax.grad(loss_fn))
    p0 = jax.tree.map(jnp.asarray, params0)
    grads = [grad_fn(p0, b, r) for b, r in zip(batches, rngs)]
    mean_grads = jax.tree.map(lambda *g: sum(g) / len(g), *grads)
    opt_state = base_opt.init(p0)
    updates, _ = base_opt.update(mean_grads, opt_state, p0)
    want = optax.apply_updates(p0, updates)
    _tree_allclose(state.params, want, rtol=1e-5, atol=1e-7)


def test_nan_batch_is_skipped():
    cfm = _cfm()
    trainer = Trainer(cfm=cfm, optimizer=make_optimizer(total_updates=100),
                      ema_update_after_step=0, ema_update_every=1)
    state = trainer.init_state(jax.random.key(0))
    params0 = _tree_np(state.params)

    bad = _batch(seed=0)
    bad["mel"][0, 0, 0] = np.nan
    state, metrics = trainer.train_step(state, bad, jax.random.key(1))
    assert int(state.step) == 0
    assert float(metrics["applied"]) == 0.0
    _tree_allclose(state.params, params0)
    assert np.all(np.isfinite(np.asarray(jax.tree.leaves(state.ema_params)[0])))

    state, metrics = trainer.train_step(state, _batch(seed=1), jax.random.key(2))
    assert int(state.step) == 1 and float(metrics["applied"]) == 1.0


def test_nan_microbatch_skipped_inside_accumulation():
    cfm = _cfm()
    trainer = Trainer(cfm=cfm, optimizer=make_optimizer(total_updates=100),
                      grad_accumulation_steps=2)
    state = trainer.init_state(jax.random.key(0))
    bad = _batch(seed=0)
    bad["mel"][:] = np.nan
    state, m = trainer.train_step(state, bad, jax.random.key(1))
    assert int(state.step) == 0 and float(m["applied"]) == 0.0
    # the NaN micro-batch was not counted into the mean: two more good batches
    # are needed before the update applies
    state, m = trainer.train_step(state, _batch(seed=1), jax.random.key(2))
    assert int(state.step) == 0
    state, m = trainer.train_step(state, _batch(seed=2), jax.random.key(3))
    assert int(state.step) == 1
    assert np.all(np.isfinite(np.asarray(jax.tree.leaves(state.params)[0])))


# ---------------------------------------------------------------------------
# mid-epoch interrupt/resume


def _epoch_batches(epoch, n=3):
    return [_batch(seed=100 * epoch + i) for i in range(n)]


def test_interrupt_resume_reproduces_loss_trajectory(tmp_path):
    """Kill after 2 batches of epoch 0, resume from the checkpoint: the remaining
    losses and the final params are bit-identical to the uninterrupted run."""
    def new_trainer(ckpt_dir):
        return Trainer(cfm=_cfm(), optimizer=make_optimizer(total_updates=100),
                       checkpoint_dir=str(ckpt_dir))

    rng = jax.random.key(42)
    losses_full = {}

    def log_full(step, scalars):
        losses_full[step] = scalars["loss"]

    t_full = new_trainer(tmp_path / "full")
    s_full = t_full.init_state(jax.random.key(0))
    s_full = t_full.train(s_full, rng=rng, epoch_iter=_epoch_batches, epochs=2,
                          log_every=1, save_per_updates=0, log_fn=log_full)

    # interrupted run: epoch 0 stops after 2 batches, checkpoint at update 2
    t_int = new_trainer(tmp_path / "int")
    s_int = t_int.init_state(jax.random.key(0))
    s_int = t_int.train(
        s_int, rng=rng,
        epoch_iter=lambda e: itertools.islice(iter(_epoch_batches(e)), 2),
        epochs=1, log_every=1, save_per_updates=2,
    )

    ckpt = tmp_path / "int" / "model_2"
    t_res = new_trainer(tmp_path / "int")
    template = t_res.init_state(jax.random.key(0))
    restored = t_res.load_checkpoint(str(ckpt), template)
    assert t_res.resume_meta == {"epoch": 0, "batch_in_epoch": 2,
                                 "grad_accumulation_steps": 1}
    start_epoch, skip = t_res.restore_meta(t_res.resume_meta)

    losses_res = {}
    restored = t_res.train(restored, rng=rng, epoch_iter=_epoch_batches, epochs=2,
                           start_epoch=start_epoch, skip_batches=skip,
                           log_every=1, save_per_updates=0,
                           log_fn=lambda s, sc: losses_res.__setitem__(s, sc["loss"]))

    for step, loss in losses_res.items():
        assert losses_full[step] == loss, f"step {step}: {losses_full[step]} != {loss}"
    _tree_allclose(restored.params, s_full.params)
    assert int(restored.step) == int(s_full.step) == 6


# ---------------------------------------------------------------------------
# duration-predictor checkpoint restore


def test_checkpoint_restores_duration_predictor_state(tmp_path):
    trainer = Trainer(
        cfm=_cfm(), optimizer=make_optimizer(total_updates=100),
        duration_predictor=DurationPredictor(vocab_size=16, d_model=16, d_filter=16),
        duration_focus_updates=100, checkpoint_dir=str(tmp_path),
    )
    state = trainer.init_state(jax.random.key(0))
    batch = _batch(seed=0)
    batch["phoneme"] = np.asarray([[1, 2, 3, 0], [2, 1, 0, 0]], np.int32)
    state, _ = trainer.train_step(state, batch, jax.random.key(1))
    dur_after = _tree_np(state.dur_pred_params)
    path = trainer.save_checkpoint(state, meta=trainer._make_meta(0, 1))

    t2 = Trainer(
        cfm=_cfm(), optimizer=make_optimizer(total_updates=100),
        duration_predictor=DurationPredictor(vocab_size=16, d_model=16, d_filter=16),
        duration_focus_updates=100, checkpoint_dir=str(tmp_path),
    )
    template = t2.init_state(jax.random.key(7))
    restored = t2.load_checkpoint(path, template)
    assert restored.dur_pred_params is not None
    assert restored.dur_align_params is not None
    assert restored.dur_opt_state is not None
    _tree_allclose(restored.dur_pred_params, dur_after)
    assert t2.resume_meta["alignment"]["phase"] == 1
    t2.restore_meta(t2.resume_meta)
    # resumed duration step runs without crashing and keeps training the predictor
    restored, metrics = t2.train_step(restored, batch, jax.random.key(2))
    assert np.isfinite(float(metrics["duration_loss"]))


# ---------------------------------------------------------------------------
# adaptive duration weight + quality metrics


def test_alignment_quality_metrics_values():
    durations = jnp.asarray([[4.0, 4.0, 4.0, 4.0]])
    mask = jnp.asarray([[True, True, True, True]])
    mel_lens = jnp.asarray([16])
    cov, diag = alignment_quality_metrics(durations, mask, mel_lens)
    assert float(cov) == 1.0
    assert float(diag) > 0.99  # perfectly diagonal
    degenerate = jnp.asarray([[0.1, 0.1, 15.4, 0.4]])
    cov2, diag2 = alignment_quality_metrics(degenerate, mask, mel_lens)
    assert float(cov2) == 0.25
    assert float(diag2) < float(diag)


def test_adaptive_duration_weight_drives_scheduler():
    trainer = Trainer(
        cfm=_cfm(), optimizer=make_optimizer(total_updates=100),
        duration_predictor=DurationPredictor(vocab_size=16, d_model=16, d_filter=16),
        duration_focus_updates=1, use_adaptive_duration_weight=True,
    )
    state = trainer.init_state(jax.random.key(0))
    batch = _batch(seed=0)
    batch["phoneme"] = np.asarray([[1, 2, 3, 0], [2, 1, 0, 0]], np.int32)

    seen = {}
    state = trainer.train(
        state, rng=jax.random.key(1), epoch_iter=lambda e: [batch] * 3, epochs=1,
        log_every=1, save_per_updates=0,
        log_fn=lambda s, sc: seen.setdefault(s, sc),
    )
    assert trainer._dur_weight_sched is not None
    assert trainer._dur_weight_sched.phase == 2  # transitioned after focus updates
    some = next(iter(seen.values()))
    assert "duration_weight" in some and "align_diagonal" in some
    assert 0.0 < some["align_diagonal"] <= 1.0


# ---------------------------------------------------------------------------
# phoneme-map persistence across resume (round-3 fix: resume used to re-grow
# the map in the new iteration order, scrambling ids under the restored
# embedding rows — reference persists the map, `trainer.py:1367-1377`)


def test_phoneme_map_survives_resume_with_reordered_batches(tmp_path):
    from eraxvif5tts_tpu.text.phoneme import PhonemeMap, phoneme_to_indices

    pm = PhonemeMap(max_index=15)
    trainer = Trainer(
        cfm=_cfm(), optimizer=make_optimizer(total_updates=100),
        duration_predictor=DurationPredictor(vocab_size=16, d_model=16, d_filter=16),
        duration_focus_updates=100, checkpoint_dir=str(tmp_path),
        phoneme_map=pm,
    )
    state = trainer.init_state(jax.random.key(0))
    # first-process collate order: "a b" then "c d"
    phoneme_to_indices(["a", "b"], pm)
    phoneme_to_indices(["c", "d"], pm)
    original = dict(pm)
    batch = _batch(seed=0)
    batch["phoneme"] = np.asarray([[1, 2, 0, 0], [3, 4, 0, 0]], np.int32)
    state, _ = trainer.train_step(state, batch, jax.random.key(1))
    path = trainer.save_checkpoint(state, meta=trainer._make_meta(0, 1))

    # fresh process: empty map, DIFFERENT iteration order after skip_batches
    pm2 = PhonemeMap(max_index=15)
    t2 = Trainer(
        cfm=_cfm(), optimizer=make_optimizer(total_updates=100),
        duration_predictor=DurationPredictor(vocab_size=16, d_model=16, d_filter=16),
        duration_focus_updates=100, checkpoint_dir=str(tmp_path),
        phoneme_map=pm2,
    )
    template = t2.init_state(jax.random.key(7))
    t2.load_checkpoint(path, template)
    assert t2.resume_meta["phoneme_map"] == original
    t2.restore_meta(t2.resume_meta)
    assert dict(pm2) == original
    assert pm2.max_index == 15  # in-place update keeps the guard
    # resumed collate sees "c" first — it must keep its ORIGINAL index
    ids = phoneme_to_indices(["c", "a", "e"], pm2)
    assert ids == [original["c"], original["a"], 5]


def test_phoneme_map_growth_past_embedding_table_raises():
    import pytest

    from eraxvif5tts_tpu.text.phoneme import PhonemeMap, phoneme_to_indices

    pm = PhonemeMap(max_index=2)
    assert phoneme_to_indices(["x", "y"], pm) == [1, 2]
    with pytest.raises(ValueError, match="embedding table"):
        phoneme_to_indices(["z"], pm)
