"""End-to-end CLI training drive: duration-predictor curriculum wired from the
entry point (reference `finetune_cli.py:349-361`), per-save sample artifacts
(`trainer.py:1387-1419`), reference-format predictor checkpoint round-trip
(`trainer.py:1367-1377`), and the xavier scratch init (`finetune_cli.py:26-97`)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eraxvif5tts_tpu.configs import (
    ArchConfig,
    CkptConfig,
    DatasetConfig,
    MelSpecConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from eraxvif5tts_tpu.models.duration import (
    DurationPredictor,
    duration_params_from_torch,
    duration_params_to_torch,
    load_duration_predictor,
    predict_duration_frames,
    save_duration_predictor,
)
from eraxvif5tts_tpu.training.cli import _run_training, build_sampler, build_trainer
from eraxvif5tts_tpu.training.dataset import CustomDataset
from eraxvif5tts_tpu.training.scratch_init import init_weights_tts

MEL = 8
VOCAB = {c: i for i, c in enumerate(" abcdefgh")}


def _tiny_cfg(tmp_path, **ckpt_kw):
    return TrainConfig(
        model=ModelConfig(
            name="tiny", tokenizer="char",
            arch=ArchConfig(dim=32, depth=1, heads=2, dim_head=16, ff_mult=2,
                            text_dim=16, conv_layers=0, dropout=0.0),
            mel_spec=MelSpecConfig(n_mel_channels=MEL),
        ),
        optim=OptimConfig(epochs=1, learning_rate=1e-4, num_warmup_updates=1,
                          grad_accumulation_steps=1),
        datasets=DatasetConfig(name="tiny", batch_size_per_gpu=64, max_samples=2),
        ckpts=CkptConfig(save_per_updates=2, last_per_updates=0,
                         keep_last_n_checkpoints=-1, logger=None, log_samples=True,
                         save_dir=str(tmp_path / "ckpts"), **ckpt_kw),
    )


def _tiny_dataset(n=4):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        frames = 16 + 4 * i
        rows.append({
            "text": "abc ad"[: 3 + i % 3],
            "duration": frames * 256 / 24000,
            "mel_spec": rng.standard_normal((frames, MEL)).astype(np.float32),
            "phoneme": "a b c",
        })
    return CustomDataset(rows, preprocessed_mel=True)


def test_finetune_duration_curriculum_end_to_end(tmp_path, capsys):
    cfg = _tiny_cfg(tmp_path)
    dataset = _tiny_dataset()
    sampler = build_sampler(dataset, cfg, seed=0)
    phoneme_map: dict = {}
    dur_pred = DurationPredictor(vocab_size=len(VOCAB) + 1, d_model=16, d_filter=16)
    trainer = build_trainer(cfg, vocab_size=len(VOCAB), total_updates=10,
                            duration_predictor=dur_pred, duration_focus_updates=1)
    rng = jax.random.key(0)
    state = trainer.init_state(rng)
    state = _run_training(trainer, cfg, dataset, sampler, VOCAB, state, rng,
                          phoneme_map=phoneme_map, log_every=1)

    out = capsys.readouterr().out
    assert "duration_loss=" in out and "duration_mae=" in out

    ckpt_dir = str(tmp_path / "ckpts")
    assert os.path.isdir(os.path.join(ckpt_dir, "model_last"))
    # per-save sample artifact (mel .npy; wav needs a vocoder ckpt)
    samples = os.listdir(os.path.join(ckpt_dir, "samples"))
    assert any(f.endswith(".npy") for f in samples)
    # reference-format duration predictor ckpt with embedded phoneme_map
    dp_path = os.path.join(ckpt_dir, "duration_predictor_last.pt")
    assert os.path.isfile(dp_path)
    model, params, loaded_map = load_duration_predictor(dp_path)
    assert loaded_map == phoneme_map and len(loaded_map) >= 3
    frames = predict_duration_frames(model, params, loaded_map, "abc")
    assert frames >= 0  # runs through the wrapper consumption path


def test_duration_predictor_torch_roundtrip():
    model = DurationPredictor(vocab_size=12, d_model=16, d_filter=16)
    ids = jnp.asarray([[1, 2, 3, 0]], jnp.int32)
    params = jax.jit(model.init)(jax.random.key(0), ids, ids > 0)["params"]
    sd = duration_params_to_torch(params)
    assert set(sd) == {"text_embed.weight", "conv_1.weight", "conv_1.bias",
                       "norm_1.weight", "norm_1.bias", "conv_2.weight", "conv_2.bias",
                       "norm_2.weight", "norm_2.bias", "proj.weight", "proj.bias"}
    assert sd["text_embed.weight"].shape[0] == 13  # +1 torch filler row
    params2, _ = duration_params_from_torch(sd)
    d1 = {jax.tree_util.keystr(p): v
          for p, v in jax.tree_util.tree_leaves_with_path(params)}
    d2 = {jax.tree_util.keystr(p): v
          for p, v in jax.tree_util.tree_leaves_with_path(params2)}
    assert set(d1) == set(d2)
    for key in d1:
        np.testing.assert_array_equal(np.asarray(d1[key]), np.asarray(d2[key]), err_msg=key)


def test_save_load_duration_predictor_file(tmp_path):
    pytest.importorskip("torch")
    model = DurationPredictor(vocab_size=12, d_model=16, d_filter=16)
    ids = jnp.asarray([[1, 2, 3, 0]], jnp.int32)
    params = jax.jit(model.init)(jax.random.key(0), ids, ids > 0)["params"]
    pm = {"a": 1, "b": 2}
    path = save_duration_predictor(str(tmp_path / "dp.pt"), params, pm, update=7)
    model2, params2, pm2 = load_duration_predictor(path)
    assert pm2 == pm
    assert model2.vocab_size == 12
    out1 = jax.jit(model.apply)({"params": params}, ids, ids > 0)
    out2 = jax.jit(model2.apply)({"params": params2}, ids, ids > 0)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_scratch_init_rules():
    from eraxvif5tts_tpu.models.cfm import CFM
    from eraxvif5tts_tpu.models.dit import DiT

    arch = ArchConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, text_dim=16,
                      conv_layers=1, dropout=0.0)
    cfm = CFM(transformer=DiT(arch=arch, text_num_embeds=8, mel_dim=MEL))
    params = cfm.init_params(jax.random.key(0))
    inited = init_weights_tts(params, jax.random.key(1))

    flat = {jax.tree_util.keystr(p): np.asarray(v)
            for p, v in jax.tree_util.tree_leaves_with_path(inited)}
    # AdaLN-zero + proj_out zero-init preserved (identity residual blocks)
    for key, v in flat.items():
        if "attn_norm" in key and "linear" in key:
            assert np.all(v == 0), key
        if "proj_out" in key:
            assert np.all(v == 0), key
    # embeddings ~ N(0, 0.02)
    emb = next(v for k, v in flat.items() if "embedding" in k)
    assert 0.005 < emb.std() < 0.05
    # biases zero, norm scales one
    for key, v in flat.items():
        if key.endswith("['bias']"):
            assert np.all(v == 0), key
    # attention projections changed from the flax default and are finite
    q = next(v for k, v in flat.items() if "to_q" in k and "kernel" in k)
    q0 = next(np.asarray(v) for p, v in jax.tree_util.tree_leaves_with_path(params)
              if "to_q" in jax.tree_util.keystr(p) and "kernel" in jax.tree_util.keystr(p))
    assert np.isfinite(q).all() and not np.allclose(q, q0)
    # deterministic in the seed
    again = init_weights_tts(params, jax.random.key(1))
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(again)[0]),
        np.asarray(jax.tree_util.tree_leaves(inited)[0]),
    )


def test_scratch_init_state_has_distinct_ema_buffers(tmp_path):
    """The from-scratch path must deep-copy params into ema_params /
    dur_align_params: identity-aliased trees make the donated train step hand
    one buffer to two donated args, which the TPU backend rejects
    (InvalidArgument) — invisible on CPU where donation is a no-op."""
    from eraxvif5tts_tpu.configs import ArchConfig
    from eraxvif5tts_tpu.models.cfm import CFM
    from eraxvif5tts_tpu.models.dit import DiT
    from eraxvif5tts_tpu.models.duration import DurationPredictor
    from eraxvif5tts_tpu.training.trainer import Trainer, make_optimizer

    arch = ArchConfig(dim=32, depth=1, heads=2, dim_head=16, ff_mult=2,
                      text_dim=16, conv_layers=0, dropout=0.0)
    trainer = Trainer(
        cfm=CFM(transformer=DiT(arch=arch, text_num_embeds=8, mel_dim=8)),
        optimizer=make_optimizer(total_updates=10),
        duration_predictor=DurationPredictor(vocab_size=16, d_model=16, d_filter=16),
    )
    state = trainer.init_state(jax.random.key(0))
    params = init_weights_tts(state.params, jax.random.key(2))
    dp = init_weights_tts(state.dur_pred_params, jax.random.key(3))
    # mimic the CLI from-scratch replace
    state = state.replace(params=params,
                          ema_params=jax.tree.map(jnp.copy, params),
                          dur_pred_params=dp,
                          dur_align_params=jax.tree.map(jnp.copy, dp))
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state.ema_params)):
        assert a is not b
    for a, b in zip(jax.tree.leaves(state.dur_pred_params),
                    jax.tree.leaves(state.dur_align_params)):
        assert a is not b
    # and the donated step runs
    batch = {"mel": np.zeros((2, 16, 8), np.float32),
             "text": np.asarray([[1, 2, -1], [2, 1, -1]], np.int32),
             "lens": np.asarray([16, 12], np.int32),
             "phoneme": np.asarray([[1, 2, 0], [2, 1, 0]], np.int32)}
    state, metrics = trainer.train_step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
