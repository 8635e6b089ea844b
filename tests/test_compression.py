"""Pruner + distillation tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eraxvif5tts_tpu.compression.convert import (
    dit_params_from_torch,
    dit_params_to_torch,
    infer_depth,
)
from eraxvif5tts_tpu.compression.pruner import (
    block_importance_scores,
    convert_pt_to_safetensors,
    expand_text_embedding,
    get_embedding_size,
    inspect_checkpoint,
    prune_checkpoint,
    prune_state_dict,
    select_blocks_to_keep,
    test_pruned_model as smoke_pruned_model,
)
from eraxvif5tts_tpu.configs import ArchConfig
from eraxvif5tts_tpu.models.cfm import CFM
from eraxvif5tts_tpu.models.dit import DiT
from eraxvif5tts_tpu.training.distill import (
    DistillConfig,
    DistillTrainer,
    distillation_losses,
)
from eraxvif5tts_tpu.training.trainer import make_optimizer

ARCH6 = ArchConfig(dim=32, depth=6, heads=2, dim_head=16, ff_mult=2, text_dim=16,
                   conv_layers=1, dropout=0.0)
MEL = 8


@pytest.fixture(scope="module")
def torch_layout_sd():
    dit = DiT(arch=ARCH6, text_num_embeds=8, mel_dim=MEL)
    params = jax.jit(dit.init)(
        jax.random.key(0), jnp.zeros((1, 8, MEL)), jnp.zeros((1, 8, MEL)),
        jnp.zeros((1, 4), jnp.int32), jnp.zeros((1,)),
    )["params"]
    # randomize so importance metrics have signal
    params = jax.tree.map(
        lambda p: np.asarray(jax.random.normal(jax.random.key(3), p.shape)) * 0.05, params
    )
    return dit_params_to_torch(params, depth=6, conv_layers=1)


def test_importance_scores_and_selection(torch_layout_sd):
    scores, fallback = block_importance_scores(torch_layout_sd)
    assert len(scores) == 6 and not fallback
    keep = select_blocks_to_keep(scores, 6, target_layers=4)
    assert set(keep) >= {0, 1, 4, 5}
    assert len(keep) == 4
    keep6 = select_blocks_to_keep(scores, 6, target_layers=5)
    assert len(keep6) == 5
    manual = select_blocks_to_keep(scores, 6, 3, manual_blocks=[0, 3, 5])
    assert manual == [0, 3, 5]


def test_prune_state_dict_reindexes(torch_layout_sd):
    pruned = prune_state_dict(torch_layout_sd, [0, 1, 4, 5])
    assert infer_depth(pruned) == 4
    # old block 4 -> new block 2 with same tensor
    np.testing.assert_array_equal(
        pruned["transformer.transformer_blocks.2.attn.to_q.weight"],
        torch_layout_sd["transformer.transformer_blocks.4.attn.to_q.weight"],
    )
    # non-block keys preserved
    assert "transformer.proj_out.weight" in pruned
    # pruned dict loads into a shallower model
    params = dit_params_from_torch(pruned, depth=4, conv_layers=1)
    assert "block_3" in params and "block_4" not in params


def test_prune_checkpoint_pipeline(tmp_path, torch_layout_sd):
    from eraxvif5tts_tpu.compression.pruner import save_state_dict

    src = str(tmp_path / "model.safetensors")
    save_state_dict(torch_layout_sd, src)
    out = str(tmp_path / "pruned.safetensors")
    report = prune_checkpoint(src, out, target_layers=4)
    assert len(report.blocks_to_keep) == 4
    assert report.params_after < report.params_before
    assert smoke_pruned_model(out)
    info = inspect_checkpoint(out)
    assert info["depth"] == 4


def test_pt_safetensors_conversion_and_embedding_tools(tmp_path, torch_layout_sd):
    import torch as _torch

    pt = str(tmp_path / "m.pt")
    _torch.save({k: _torch.from_numpy(np.ascontiguousarray(v))
                 for k, v in torch_layout_sd.items()}, pt)
    out = str(tmp_path / "m.safetensors")
    n = convert_pt_to_safetensors(pt, out)
    assert n == len(torch_layout_sd)
    assert get_embedding_size(out) == 9  # 8 vocab + 1 filler

    expanded = expand_text_embedding(torch_layout_sd, new_vocab_size=20)
    assert expanded["transformer.text_embed.text_embed.weight"].shape[0] == 21
    # old rows preserved
    np.testing.assert_array_equal(
        expanded["transformer.text_embed.text_embed.weight"][:9],
        torch_layout_sd["transformer.text_embed.text_embed.weight"],
    )


def test_compression_cli(tmp_path, torch_layout_sd, capsys):
    """`python -m eraxvif5tts_tpu.compression` subcommands over the library core
    (reference ships these as five standalone scripts under model_pruning/)."""
    import torch as _torch

    from eraxvif5tts_tpu.compression.__main__ import main

    pt = str(tmp_path / "m.pt")
    _torch.save({k: _torch.from_numpy(np.ascontiguousarray(v))
                 for k, v in torch_layout_sd.items()}, pt)

    out = str(tmp_path / "cli.safetensors")
    assert main(["convert", pt, out]) == 0
    assert "tensors" in capsys.readouterr().out

    assert main(["inspect", out, "--max-keys", "3"]) == 0
    report = capsys.readouterr().out
    assert '"n_tensors"' in report and '"depth": 6' in report

    assert main(["embedding-size", out]) == 0
    assert capsys.readouterr().out.strip() == "9"  # 8 vocab + 1 filler

    grown = str(tmp_path / "grown.safetensors")
    assert main(["expand-embedding", pt, grown, "--vocab-size", "20"]) == 0
    assert "9 -> 21" in capsys.readouterr().out

    assert main(["prune", pt, str(tmp_path / "pruned.safetensors"),
                 "--target-layers", "4", "--skip-test"]) == 0
    assert "kept blocks" in capsys.readouterr().out


# ---------------------------------------------------------------------------
# distillation


def test_distillation_losses_and_step():
    teacher_arch = ArchConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2,
                              text_dim=16, conv_layers=0, dropout=0.0)
    student_arch = ArchConfig(dim=32, depth=1, heads=2, dim_head=16, ff_mult=2,
                              text_dim=16, conv_layers=0, dropout=0.0)
    teacher = DiT(arch=teacher_arch, text_num_embeds=8, mel_dim=MEL)
    student = DiT(arch=student_arch, text_num_embeds=8, mel_dim=MEL)
    cfm = CFM(transformer=student)
    x = jnp.zeros((1, 8, MEL))
    t_params = jax.jit(teacher.init)(jax.random.key(0), x, x,
                                     jnp.zeros((1, 4), jnp.int32), jnp.zeros((1,)))["params"]
    trainer = DistillTrainer(
        student_cfm=cfm, teacher_transformer=teacher,
        optimizer=make_optimizer(total_updates=100),
        config=DistillConfig(spec_l1_weight=0.1),
        ema_update_after_step=0, ema_update_every=1,
    )
    state = trainer.init_state(jax.random.key(1))
    batch = {
        "mel": np.random.default_rng(0).standard_normal((2, 16, MEL)).astype(np.float32),
        "text": np.asarray([[1, 2, -1], [3, -1, -1]], np.int32),
        "lens": np.asarray([16, 12], np.int32),
    }
    state, metrics = trainer.train_step(state, t_params, batch, jax.random.key(2))
    assert int(state.step) == 1
    for key in ("loss", "student_loss", "distill_loss", "spec_l1"):
        assert np.isfinite(float(metrics[key])), key
    assert not bool(metrics["skipped"])
