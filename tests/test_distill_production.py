"""Distillation productionization: kill/resume mid-run, duration loss from
``batch['attn']``, EMA export loading straight into F5TTSWrapper (reference
`distil_reload.py:437-628, 892-921, 1103-1124`)."""

import numpy as np

import jax
import jax.numpy as jnp

from eraxvif5tts_tpu.configs import ArchConfig, ModelConfig
from eraxvif5tts_tpu.models.cfm import CFM
from eraxvif5tts_tpu.models.dit import DiT
from eraxvif5tts_tpu.models.duration import DurationPredictor
from eraxvif5tts_tpu.training.distill import DistillConfig, DistillTrainer
from eraxvif5tts_tpu.training.trainer import latest_checkpoint, make_optimizer

MEL = 100  # wrapper expects 100-mel models
T_ARCH = ArchConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, text_dim=16,
                    conv_layers=1, dropout=0.0)
S_ARCH = ArchConfig(dim=32, depth=1, heads=2, dim_head=16, ff_mult=2, text_dim=16,
                    conv_layers=1, dropout=0.0)
VOCAB_CHARS = list(" abcdefghij.")


def _setup(tmp_path, duration=False):
    teacher = DiT(arch=T_ARCH, text_num_embeds=len(VOCAB_CHARS), mel_dim=MEL)
    student = DiT(arch=S_ARCH, text_num_embeds=len(VOCAB_CHARS), mel_dim=MEL)
    x = jnp.zeros((1, 8, MEL))
    t_params = jax.jit(teacher.init)(
        jax.random.key(0), x, x, jnp.zeros((1, 4), jnp.int32), jnp.zeros((1,))
    )["params"]
    dp = DurationPredictor(vocab_size=len(VOCAB_CHARS) + 2, d_model=16,
                           d_filter=16) if duration else None
    trainer = DistillTrainer(
        student_cfm=CFM(transformer=student), teacher_transformer=teacher,
        optimizer=make_optimizer(total_updates=100, num_warmup_updates=1,
                                 decay_type="cosine"),
        config=DistillConfig(duration_loss_weight=0.5),
        checkpoint_dir=str(tmp_path), ema_update_after_step=0, ema_update_every=1,
        duration_predictor=dp,
    )
    return trainer, t_params


def _batch(seed=0, b=2, n=16):
    rng = np.random.default_rng(seed)
    return {
        "mel": rng.standard_normal((b, n, MEL)).astype(np.float32),
        "text": np.asarray([[1, 2, -1], [3, 1, -1]], np.int32),
        "lens": np.full((b,), n, np.int32),
    }


def test_distill_kill_and_resume_matches_uninterrupted(tmp_path):
    rng = jax.random.key(7)
    batches = [_batch(seed=i) for i in range(4)]

    # uninterrupted run
    t_full, t_params = _setup(tmp_path / "full")
    s = t_full.init_state(jax.random.key(1))
    for i, b in enumerate(batches):
        s, _ = t_full.train_step(s, t_params, b, jax.random.fold_in(rng, i))
    full_params = jax.tree.map(np.asarray, s.params)

    # killed after 2 steps, checkpointed, resumed in a NEW trainer
    t_a, _ = _setup(tmp_path / "int")
    s2 = t_a.init_state(jax.random.key(1))
    for i in range(2):
        s2, _ = t_a.train_step(s2, t_params, batches[i], jax.random.fold_in(rng, i))
    t_a.save_checkpoint(s2, meta={"epoch": 0, "batch_in_epoch": 2})

    t_b, t_params_b = _setup(tmp_path / "int")
    template = t_b.init_state(jax.random.key(1))
    ckpt = latest_checkpoint(str(tmp_path / "int"))
    restored = t_b.load_checkpoint(ckpt, template)
    assert t_b.resume_meta["batch_in_epoch"] == 2
    assert int(restored.step) == 2
    for i in range(2, 4):
        restored, _ = t_b.train_step(restored, t_params_b, batches[i],
                                     jax.random.fold_in(rng, i))
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(full_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_distill_duration_loss_from_attn(tmp_path):
    trainer, t_params = _setup(tmp_path, duration=True)
    state = trainer.init_state(jax.random.key(1))
    dur0 = jax.tree.map(np.asarray, state.dur_pred_params)
    batch = _batch()
    nt, T = batch["text"].shape[1], batch["mel"].shape[1]
    attn = np.zeros((2, nt, T), np.float32)
    attn[:, 0, :8] = 1.0
    attn[:, 1, 8:16] = 1.0
    batch["attn"] = attn
    state, metrics = trainer.train_step(state, t_params, batch, jax.random.key(2))
    assert np.isfinite(float(metrics["duration_loss"]))
    delta = sum(float(np.abs(np.asarray(a) - b).sum())
                for a, b in zip(jax.tree.leaves(state.dur_pred_params),
                                jax.tree.leaves(dur0)))
    assert delta > 0.0
    # checkpoint round-trips the dur predictor state
    path = trainer.save_checkpoint(state, meta={"epoch": 0, "batch_in_epoch": 1})
    restored = trainer.load_checkpoint(path, trainer.init_state(jax.random.key(9)))
    for a, b in zip(jax.tree.leaves(restored.dur_pred_params),
                    jax.tree.leaves(state.dur_pred_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_distilled_student_loads_into_wrapper(tmp_path):
    from eraxvif5tts_tpu.infer.wrapper import F5TTSWrapper

    trainer, t_params = _setup(tmp_path)
    state = trainer.init_state(jax.random.key(1))
    state, _ = trainer.train_step(state, t_params, _batch(), jax.random.key(2))
    path = trainer.export_student_torch(
        state, str(tmp_path / "student.safetensors"), depth=S_ARCH.depth,
        conv_layers=S_ARCH.conv_layers,
    )
    vocab = {c: i for i, c in enumerate(VOCAB_CHARS)}
    cfg = ModelConfig(arch=S_ARCH)
    w = F5TTSWrapper(model_cfg=cfg, ckpt_path=path, vocab_char_map=vocab,
                     nfe_step=2, duration_buckets=(64,), text_buckets=(64,))
    # exported EMA weights survived the round trip
    np.testing.assert_allclose(
        np.asarray(w.params["block_0"]["attn"]["to_q"]["kernel"]),
        np.asarray(state.ema_params["block_0"]["attn"]["to_q"]["kernel"]),
        rtol=1e-6, atol=1e-7,
    )
    t = np.arange(24000 // 4) / 24000
    ref = w.preprocess_reference(
        ref_audio=(0.2 * np.sin(2 * np.pi * 150 * t)).astype(np.float32),
        ref_sample_rate=24000, ref_text="abc def",
    )
    wave = w.generate("hi.", ref=ref, nfe_step=2, seed=0, return_numpy=True,
                      use_pinyin=False)
    assert len(wave) > 0 and np.isfinite(wave).all()
