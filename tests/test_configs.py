"""Shipped configs/*.yaml load through the typed config tree and agree with the
code presets of the same name (reference `configs/*.yaml` schema)."""

import glob
import os

import pytest

from eraxvif5tts_tpu.configs import PRESETS, load_model_config, load_yaml_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
YAMLS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml")))


def test_all_reference_model_names_have_a_yaml():
    names = {os.path.splitext(os.path.basename(p))[0] for p in YAMLS}
    # every named model the reference ships a training yaml for
    assert {"F5TTS_v1_Base", "F5TTS_Base", "F5TTS_Small", "E2TTS_Base",
            "E2TTS_Small", "F5TTS_v1_Pruned_12", "F5TTS_v1_Pruned_14"} <= names


@pytest.mark.parametrize("path", YAMLS, ids=[os.path.basename(p) for p in YAMLS])
def test_yaml_loads_and_matches_preset(path):
    cfg = load_yaml_config(path)
    name = os.path.splitext(os.path.basename(path))[0]
    assert cfg.model.name == name
    assert cfg.optim.learning_rate > 0 and cfg.datasets.batch_size_per_gpu > 0

    mc = load_model_config(path)
    preset = PRESETS[name]
    assert mc.backbone == preset.backbone
    for field in ("dim", "depth", "heads", "ff_mult", "text_dim",
                  "text_mask_padding", "conv_layers", "pe_attn_head"):
        assert getattr(mc.arch, field) == getattr(preset.arch, field), (name, field)


def test_resolve_remat_policy_auto_selection():
    """'auto' picks the remat policy by per-chip frame budget (BASELINE.md
    remat A/B: 'dots' +5.4% at 6x4096 but OOMs at 9x4096 on v5e)."""
    from eraxvif5tts_tpu.configs import REMAT_DOTS_MAX_FRAMES, resolve_remat_policy

    assert resolve_remat_policy("auto", 9 * 4096) == "full"
    assert resolve_remat_policy("auto", 6 * 4096) == "dots"
    assert resolve_remat_policy("auto", REMAT_DOTS_MAX_FRAMES + 1) == "full"
    assert resolve_remat_policy("auto", None) == "full"  # unknown budget
    # explicit policies pass through
    for p in ("full", "dots", "attn"):
        assert resolve_remat_policy(p, 1) == p
    with pytest.raises(ValueError):
        resolve_remat_policy("bogus", 1)


def test_build_trainer_resolves_auto_remat(capsys):
    """build_trainer resolves 'auto' from batch_size_per_gpu and logs it."""
    import dataclasses

    from eraxvif5tts_tpu.configs import ArchConfig, TrainConfig
    from eraxvif5tts_tpu.training.cli import build_trainer

    base = TrainConfig()
    small_arch = ArchConfig(dim=32, depth=1, heads=2, dim_head=16, ff_mult=2,
                            text_dim=16, conv_layers=0,
                            checkpoint_activations=True, remat_policy="auto")
    for frames, want in ((6 * 4096, "dots"), (9 * 4096, "full")):
        cfg = dataclasses.replace(
            base,
            model=dataclasses.replace(base.model, arch=small_arch),
            datasets=dataclasses.replace(base.datasets,
                                         batch_size_per_gpu=frames),
        )
        trainer = build_trainer(cfg, vocab_size=8, total_updates=10)
        assert trainer.cfm.transformer.arch.remat_policy == want
        assert f"-> {want!r}" in capsys.readouterr().out


def test_mu_dtype_bfloat16_moments():
    """optim.mu_dtype="bfloat16" stores the AdamW first moment in bf16 (the
    multi-chip HBM headroom knob); invalid values are loudly rejected."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from eraxvif5tts_tpu.configs import ArchConfig, TrainConfig
    from eraxvif5tts_tpu.training.cli import build_trainer

    base = TrainConfig()
    small_arch = ArchConfig(dim=32, depth=1, heads=2, dim_head=16, ff_mult=2,
                            text_dim=16, conv_layers=0, dropout=0.0)
    cfg = dataclasses.replace(
        base,
        model=dataclasses.replace(base.model, arch=small_arch),
        optim=dataclasses.replace(base.optim, mu_dtype="bfloat16"),
    )
    trainer = build_trainer(cfg, vocab_size=8, total_updates=10)
    state = trainer.init_state(jax.random.key(0))
    mu_dtypes = {x.dtype for x in jax.tree.leaves(state.opt_state[1][0].mu)}
    assert mu_dtypes == {jnp.dtype(jnp.bfloat16)}, mu_dtypes
    nu_dtypes = {x.dtype for x in jax.tree.leaves(state.opt_state[1][0].nu)}
    assert jnp.dtype(jnp.float32) in nu_dtypes

    batch = {
        "mel": np.random.default_rng(0).standard_normal((2, 64, 100)).astype(np.float32),
        "text": np.asarray([[1, 2, 3], [2, 3, -1]], np.int32),
        "lens": np.asarray([64, 48], np.int32),
    }
    state, metrics = trainer.train_step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))

    bad = dataclasses.replace(cfg, optim=dataclasses.replace(cfg.optim,
                                                             mu_dtype="fp8"))
    with pytest.raises(ValueError, match="mu_dtype"):
        build_trainer(bad, vocab_size=8, total_updates=10)


def test_mmdit_preset_builds_and_samples():
    """F5TTS_v1_MMDiT: flagship-dim dual-stream backbone is servable through
    the same CFM interface (tiny-dim twin to keep this CPU-cheap)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from eraxvif5tts_tpu.configs import PRESETS
    from eraxvif5tts_tpu.models import build_backbone
    from eraxvif5tts_tpu.models.cfm import CFM

    preset = PRESETS["F5TTS_v1_MMDiT"]
    assert preset.backbone == "MMDiT"
    assert (preset.arch.dim, preset.arch.depth, preset.arch.heads) == (1024, 22, 16)

    tiny = dataclasses.replace(preset, arch=dataclasses.replace(
        preset.arch, dim=64, depth=2, heads=2, dim_head=32))
    mmdit = build_backbone(tiny, text_num_embeds=20)
    cfm = CFM.build(mmdit, tiny.mel_spec)
    params = cfm.init_params(jax.random.key(0))
    cond = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16, 100)),
                       jnp.float32)
    text = jnp.asarray([[1, 2, 3, -1]], jnp.int32)
    out = cfm.sample(params, cond, text, jnp.asarray([32]), jnp.asarray([16]),
                     jax.random.key(1), steps=2, max_duration=64)
    assert np.isfinite(np.asarray(out)).all()
