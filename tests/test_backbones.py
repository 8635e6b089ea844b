"""UNetT / MMDiT backbone tests: shapes, zero-init invariants, CFM integration,
importer round-trips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eraxvif5tts_tpu.compression.convert import (
    backbone_params_from_torch,
    backbone_params_to_torch,
)
from eraxvif5tts_tpu.configs import ArchConfig, ModelConfig, PRESETS
from eraxvif5tts_tpu.models import CFM, MMDiT, UNetT, build_backbone

MEL = 8
ARCH_U = ArchConfig(dim=32, depth=4, heads=2, dim_head=16, ff_mult=2, text_dim=None,
                    conv_layers=0, dropout=0.0)
ARCH_M = ArchConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, dropout=0.0)


def _inputs(b=2, n=12, nt=4):
    rng = np.random.default_rng(0)
    return (
        jnp.asarray(rng.standard_normal((b, n, MEL)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((b, n, MEL)).astype(np.float32)),
        jnp.asarray([[1, 2, 3, -1], [2, -1, -1, -1]], jnp.int32),
        jnp.asarray([0.3, 0.7]),
    )


def test_unett_forward_shapes_and_time_token():
    m = UNetT(arch=ARCH_U, text_num_embeds=8, mel_dim=MEL)
    x, cond, text, time = _inputs()
    params = jax.jit(m.init)(jax.random.key(0), x, cond, text, time)["params"]
    out = jax.jit(m.apply)({"params": params}, x, cond, text, time)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # odd depth must fail
    with pytest.raises(AssertionError):
        bad = UNetT(arch=ArchConfig(dim=32, depth=3, heads=2, dim_head=16,
                                    text_dim=None, conv_layers=0), text_num_embeds=8,
                    mel_dim=MEL)
        jax.eval_shape(bad.init, jax.random.key(0), x, cond, text, time)


def test_unett_masked_forward():
    m = UNetT(arch=ARCH_U, text_num_embeds=8, mel_dim=MEL)
    x, cond, text, time = _inputs()
    mask = jnp.asarray([[True] * 12, [True] * 8 + [False] * 4])
    params = jax.jit(m.init)(jax.random.key(0), x, cond, text, time)["params"]
    out = jax.jit(m.apply)({"params": params}, x, cond, text, time, mask=mask)
    assert out.shape == x.shape


def test_mmdit_zero_init_output_is_zero():
    m = MMDiT(arch=ARCH_M, text_num_embeds=8, mel_dim=MEL)
    x, cond, text, time = _inputs()
    params = jax.jit(m.init)(jax.random.key(0), x, cond, text, time)["params"]
    out = jax.jit(m.apply)({"params": params}, x, cond, text, time)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_mmdit_cfg_batched_drops():
    m = MMDiT(arch=ARCH_M, text_num_embeds=8, mel_dim=MEL)
    x, cond, text, time = _inputs()
    params = jax.jit(m.init)(jax.random.key(1), x, cond, text, time)["params"]
    params = jax.tree.map(
        lambda p: jax.random.normal(jax.random.key(5), p.shape) * 0.02, params
    )
    apply = jax.jit(lambda *a, **k: m.apply({"params": params}, *a, **k))
    p_cond = apply(x, cond, text, time, drop_audio_cond=False, drop_text=False)
    p_unc = apply(x, cond, text, time, drop_audio_cond=True, drop_text=True)
    flags = jnp.asarray([False, False, True, True])
    p2 = apply(jnp.concatenate([x, x]), jnp.concatenate([cond, cond]),
               jnp.concatenate([text, text]), jnp.concatenate([time, time]),
               drop_audio_cond=flags, drop_text=flags)
    np.testing.assert_allclose(np.asarray(p2[:2]), np.asarray(p_cond), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p2[2:]), np.asarray(p_unc), rtol=2e-4, atol=1e-5)


def test_cfm_sample_works_with_unett():
    m = UNetT(arch=ARCH_U, text_num_embeds=8, mel_dim=MEL)
    cfm = CFM(transformer=m)
    params = cfm.init_params(jax.random.key(0))
    cond = jax.random.normal(jax.random.key(1), (1, 8, MEL))
    text = jnp.asarray([[1, 2, -1]], jnp.int32)
    out = cfm.sample(params, cond, text, jnp.asarray([16]), jnp.asarray([8]),
                     jax.random.key(2), steps=2, max_duration=32)
    assert out.shape == (1, 32, MEL)
    assert np.isfinite(np.asarray(out)).all()


def test_cfm_sample_works_with_mmdit():
    m = MMDiT(arch=ARCH_M, text_num_embeds=8, mel_dim=MEL)
    cfm = CFM(transformer=m)
    params = cfm.init_params(jax.random.key(0))
    cond = jax.random.normal(jax.random.key(1), (1, 8, MEL))
    text = jnp.asarray([[1, 2, -1]], jnp.int32)
    out = cfm.sample(params, cond, text, jnp.asarray([16]), jnp.asarray([8]),
                     jax.random.key(2), steps=2, max_duration=32)
    assert out.shape == (1, 32, MEL)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("backbone,arch", [
    ("UNetT", ARCH_U),
    ("MMDiT", ARCH_M),
])
def test_backbone_importer_roundtrip(backbone, arch):
    cfg = ModelConfig(backbone=backbone, arch=arch)
    m = build_backbone(
        ModelConfig(backbone=backbone, arch=arch,
                    mel_spec=cfg.mel_spec), text_num_embeds=8
    )
    # shrink mel for test
    m = type(m)(arch=arch, text_num_embeds=8, mel_dim=MEL)
    x, cond, text, time = _inputs()
    params = jax.jit(m.init)(jax.random.key(0), x, cond, text, time)["params"]
    sd = backbone_params_to_torch(params, backbone, depth=arch.depth,
                                  conv_layers=arch.conv_layers)
    params2 = backbone_params_from_torch(sd, backbone, depth=arch.depth,
                                         conv_layers=arch.conv_layers)
    flat1 = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_leaves_with_path(params)}
    flat2 = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_leaves_with_path(params2)}
    assert set(flat1) == set(flat2), set(flat1) ^ set(flat2)
    for k in flat1:
        np.testing.assert_array_equal(np.asarray(flat1[k]), np.asarray(flat2[k]), err_msg=k)


def test_e2tts_preset_builds():
    cfg = PRESETS["E2TTS_Small"]
    m = build_backbone(cfg, text_num_embeds=8)
    assert isinstance(m, UNetT)
    shapes = jax.eval_shape(
        m.init, jax.random.key(0),
        jnp.zeros((1, 8, 100)), jnp.zeros((1, 8, 100)),
        jnp.zeros((1, 4), jnp.int32), jnp.zeros((1,)),
    )
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert n > 50e6  # E2TTS_Small ~ 150M


def test_joint_order_permutation_equivalence():
    """The property the round-5 text-first reorder relies on: attention over
    [text|audio] with a prefix mask equals attention over [audio|text] with
    the equivalent (non-prefix) mask, outputs permuted back."""
    from eraxvif5tts_tpu.ops.attention import dot_product_attention

    rng = np.random.default_rng(0)
    b, nt, n, h, d = 2, 3, 12, 2, 16
    cq, ck, cv = (jnp.asarray(rng.standard_normal((b, nt, h, d)), jnp.float32)
                  for _ in range(3))
    q, k, v = (jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
               for _ in range(3))
    amask = jnp.asarray([[True] * 8 + [False] * 4] * b)

    # text-first (current implementation): prefix mask
    kv_tf = jnp.pad(amask, ((0, 0), (nt, 0)), constant_values=True)
    out_tf = dot_product_attention(
        jnp.concatenate([cq, q], 1), jnp.concatenate([ck, k], 1),
        jnp.concatenate([cv, v], 1), key_valid=kv_tf, prefix_key_mask=True)

    # audio-first (reference order, `modules.py:560-566`): suffix-True mask
    kv_af = jnp.pad(amask, ((0, 0), (0, nt)), constant_values=True)
    out_af = dot_product_attention(
        jnp.concatenate([q, cq], 1), jnp.concatenate([k, ck], 1),
        jnp.concatenate([v, cv], 1), key_valid=kv_af)

    np.testing.assert_allclose(np.asarray(out_tf[:, :nt]),
                               np.asarray(out_af[:, n:]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_tf[:, nt:]),
                               np.asarray(out_af[:, :n]), rtol=1e-5, atol=1e-6)


def test_mmdit_mask_padding_invariance():
    """Padded-audio masked forward vs truncated-audio forward on the valid
    frames. NOT exact: the audio ConvPositionEmbedding runs unmasked (parity
    with reference `mmdit.py:67-80`), leaking ~1e-3-scale signal across the
    padding boundary at 0.02-scale weights — the tolerance documents that
    pre-existing leak; a mask-placement bug after the round-5 text-first
    reorder would blow past it by orders of magnitude."""
    m = MMDiT(arch=ARCH_M, text_num_embeds=8, mel_dim=MEL)
    x, cond, text, time = _inputs()
    params = jax.jit(m.init)(jax.random.key(1), x, cond, text, time)["params"]
    params = jax.tree.map(
        lambda p: jax.random.normal(jax.random.key(5), p.shape) * 0.02, params
    )
    n_valid = 8
    mask = jnp.asarray([[True] * n_valid + [False] * (x.shape[1] - n_valid)] * x.shape[0])
    apply = jax.jit(lambda *a, **k: m.apply({"params": params}, *a, **k))
    out_padded = apply(x, cond, text, time, mask=mask)
    out_trunc = apply(x[:, :n_valid], cond[:, :n_valid], text, time,
                      mask=jnp.ones((x.shape[0], n_valid), bool))
    np.testing.assert_allclose(np.asarray(out_padded[:, :n_valid]),
                               np.asarray(out_trunc), atol=5e-3)
