"""Model-core tests: module numerics vs formulas, zero-init invariant, CFG batching
equivalence, param-count parity with the reference (SURVEY.md §4 levels 1-2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eraxvif5tts_tpu.configs import ArchConfig, PRESETS
from eraxvif5tts_tpu.models.cfm import CFM, sway_time_grid
from eraxvif5tts_tpu.models.dit import DiT
from eraxvif5tts_tpu.models.modules import GRN, AdaLayerNorm, AdaLayerNormFinal, TimestepEmbedding
from eraxvif5tts_tpu.ops.attention import attention_reference, dot_product_attention
from eraxvif5tts_tpu.ops.rotary import abs_pos_embedding_table, apply_rotary, rotary_freqs

TINY = ArchConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, text_dim=32,
                  conv_layers=1, dropout=0.0)


def tiny_dit():
    return DiT(arch=TINY, text_num_embeds=10, mel_dim=8)


# ---------------------------------------------------------------------------
# ops


def test_rotary_matches_manual_interleaved():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 2, 6, 8)).astype(np.float32)  # [b, h, n, d]
    freqs = np.asarray(rotary_freqs(6, 8))
    got = np.asarray(apply_rotary(jnp.asarray(x), jnp.asarray(freqs)))
    inv = 1.0 / (10000.0 ** (np.arange(0, 8, 2) / 8))
    want = np.empty_like(x)
    for n in range(6):
        for i in range(4):
            c, s = np.cos(n * inv[i]), np.sin(n * inv[i])
            x0, x1 = x[..., n, 2 * i], x[..., n, 2 * i + 1]
            want[..., n, 2 * i] = x0 * c - x1 * s
            want[..., n, 2 * i + 1] = x1 * c + x0 * s
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_abs_pos_table_cos_sin_blocks():
    table = abs_pos_embedding_table(8, max_pos=16)
    assert table.shape == (16, 8)
    np.testing.assert_allclose(table[0], [1, 1, 1, 1, 0, 0, 0, 0], atol=1e-7)
    inv = 1.0 / (10000.0 ** (np.arange(0, 8, 2)[:4] / 8))
    np.testing.assert_allclose(table[3, :4], np.cos(3 * inv), rtol=1e-6)
    np.testing.assert_allclose(table[3, 4:], np.sin(3 * inv), rtol=1e-6)


def test_attention_fused_matches_reference_einsum():
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.standard_normal((2, 10, 2, 16)).astype(np.float32)) for _ in range(3))
    key_valid = jnp.asarray(np.array([[True] * 10, [True] * 6 + [False] * 4]))
    got = dot_product_attention(q, k, v, key_valid=key_valid)
    want = attention_reference(q, k, v, key_valid=key_valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_grn_matches_formula():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 5, 4)).astype(np.float32)
    grn = GRN(4)
    params = jax.jit(grn.init)(jax.random.key(0), jnp.asarray(x))
    got = np.asarray(jax.jit(grn.apply)(params, jnp.asarray(x)))
    gx = np.linalg.norm(x, axis=1, keepdims=True)
    nx = gx / (gx.mean(axis=-1, keepdims=True) + 1e-6)
    want = 0.0 * (x * nx) + 0.0 + x  # gamma=beta=0 at init -> identity
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_adaln_zero_init_is_plain_layernorm():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 5, 8)).astype(np.float32)
    emb = rng.standard_normal((2, 8)).astype(np.float32)
    mod = AdaLayerNorm(8)
    params = jax.jit(mod.init)(jax.random.key(0), jnp.asarray(x), jnp.asarray(emb))
    out, gate_msa, *_ = jax.jit(mod.apply)(params, jnp.asarray(x), jnp.asarray(emb))
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out), (x - mu) / np.sqrt(var + 1e-6), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gate_msa), 0.0)


def test_timestep_embedding_shapes():
    mod = TimestepEmbedding(16)
    t = jnp.asarray([0.0, 0.5])
    params = jax.jit(mod.init)(jax.random.key(0), t)
    out = jax.jit(mod.apply)(params, t)
    assert out.shape == (2, 16)


# ---------------------------------------------------------------------------
# DiT


def test_dit_zero_init_output_is_zero():
    """proj_out is zero-initialized (`dit.py:162-172`) -> fresh model predicts 0."""
    dit = tiny_dit()
    rng = jax.random.key(0)
    x = jnp.ones((2, 12, 8))
    cond = jnp.ones((2, 12, 8)) * 0.5
    text = jnp.asarray([[1, 2, -1], [3, -1, -1]], jnp.int32)
    time = jnp.asarray([0.1, 0.9])
    params = jax.jit(dit.init)(rng, x, cond, text, time)["params"]
    out = jax.jit(dit.apply)({"params": params}, x, cond, text, time)
    assert out.shape == (2, 12, 8)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_dit_cfg_doubled_batch_equals_two_calls():
    dit = tiny_dit()
    rng = jax.random.key(1)
    b, n = 2, 12
    x = jax.random.normal(jax.random.key(2), (b, n, 8))
    cond = jax.random.normal(jax.random.key(3), (b, n, 8))
    text = jnp.asarray([[1, 2, 3, -1], [4, 5, -1, -1]], jnp.int32)
    time = jnp.asarray([0.3, 0.3])
    params = jax.jit(dit.init)(rng, x, cond, text, time)["params"]
    # randomize proj_out so outputs are nonzero
    params = jax.tree.map(lambda p: jax.random.normal(jax.random.key(9), p.shape) * 0.02, params)

    apply = jax.jit(lambda *a, **k: dit.apply({"params": params}, *a, **k))
    pred_cond = apply(x, cond, text, time, drop_audio_cond=False, drop_text=False)
    pred_uncond = apply(x, cond, text, time, drop_audio_cond=True, drop_text=True)

    x2 = jnp.concatenate([x, x])
    cond2 = jnp.concatenate([cond, cond])
    text2 = jnp.concatenate([text, text])
    time2 = jnp.concatenate([time, time])
    flags = jnp.asarray([False] * b + [True] * b)
    pred2 = apply(x2, cond2, text2, time2, drop_audio_cond=flags, drop_text=flags)

    np.testing.assert_allclose(np.asarray(pred2[:b]), np.asarray(pred_cond), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pred2[b:]), np.asarray(pred_uncond), rtol=2e-4, atol=1e-5)


def test_dit_text_curtail_and_pad():
    dit = tiny_dit()
    x = jnp.zeros((1, 4, 8))
    text_long = jnp.asarray([[1, 2, 3, 4, 5, 6]], jnp.int32)  # longer than seq_len
    params = jax.jit(dit.init)(jax.random.key(0), x, x, text_long, jnp.asarray([0.5]))["params"]
    out = jax.jit(dit.apply)({"params": params}, x, x, text_long, jnp.asarray([0.5]))
    assert out.shape == (1, 4, 8)


def test_param_count_parity_f5tts_v1_base():
    """Structural parity: F5TTS_Base DiT ~= 335.8M params (BASELINE.md, reference
    `scripts/count_params_gflops.py:22-24` with text_num_embeds=256)."""
    cfg = PRESETS["F5TTS_v1_Base"]
    dit = DiT(arch=cfg.arch, text_num_embeds=256, mel_dim=100)
    shapes = jax.eval_shape(
        dit.init,
        jax.random.key(0),
        jnp.zeros((1, 8, 100)),
        jnp.zeros((1, 8, 100)),
        jnp.zeros((1, 4), jnp.int32),
        jnp.zeros((1,)),
    )
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 330e6 < n_params < 342e6, f"got {n_params/1e6:.1f}M params"


# ---------------------------------------------------------------------------
# CFM


def test_sway_time_grid():
    t = np.asarray(sway_time_grid(4, -1.0))
    # s=-1: t' = t - (cos(pi t/2) - 1 + t) = 1 - cos(pi t / 2)
    lin = np.linspace(0, 1, 5)
    np.testing.assert_allclose(t, 1 - np.cos(np.pi / 2 * lin), rtol=1e-5, atol=1e-6)
    assert t[0] == 0.0 and abs(t[-1] - 1.0) < 1e-6


def test_cfm_loss_runs_and_is_finite():
    dit = tiny_dit()
    cfm = CFM(transformer=dit)
    params = jax.jit(dit.init)(
        jax.random.key(0),
        jnp.zeros((1, 16, 100)) if False else jnp.zeros((1, 16, 8)),
        jnp.zeros((1, 16, 8)),
        jnp.zeros((1, 4), jnp.int32),
        jnp.zeros((1,)),
    )["params"]
    mel = jax.random.normal(jax.random.key(1), (2, 16, 8))
    text = jnp.asarray([[1, 2, 3, -1], [2, 3, -1, -1]], jnp.int32)
    lens = jnp.asarray([16, 10])
    loss, cond, pred = jax.jit(cfm.loss, static_argnames=('deterministic',))(params, mel, text, lens, jax.random.key(2), deterministic=True)
    assert np.isfinite(float(loss))
    assert cond.shape == mel.shape and pred.shape == mel.shape


def test_cfm_sample_shapes_and_prompt_pasteback():
    dit = tiny_dit()
    cfm = CFM(transformer=dit)
    params = jax.jit(dit.init)(
        jax.random.key(0),
        jnp.zeros((1, 16, 8)),
        jnp.zeros((1, 16, 8)),
        jnp.zeros((1, 4), jnp.int32),
        jnp.zeros((1,)),
    )["params"]
    b, n_cond, max_dur = 2, 10, 32
    cond = jax.random.normal(jax.random.key(1), (b, n_cond, 8))
    text = jnp.asarray([[1, 2, 3, -1], [2, 3, -1, -1]], jnp.int32)
    lens = jnp.asarray([10, 6])
    duration = jnp.asarray([20, 16])
    out = cfm.sample(
        params, cond, text, duration, lens, jax.random.key(2),
        steps=2, max_duration=max_dur,
    )
    out = np.asarray(out)
    assert out.shape == (b, max_dur, 8)
    # prompt region pasted back
    np.testing.assert_allclose(out[0, :10], np.asarray(cond[0, :10]), rtol=1e-5)
    np.testing.assert_allclose(out[1, :6], np.asarray(cond[1, :6]), rtol=1e-5)
    # beyond duration: zeros
    np.testing.assert_allclose(out[0, 20:], 0.0)
    np.testing.assert_allclose(out[1, 16:], 0.0)
    # generated region nonzero
    assert np.abs(out[0, 10:20]).max() > 0


def test_cfm_sample_batch_invariance():
    """Same sample in batch of 1 vs batch of 2 -> identical mel (seeded-noise parity
    semantics, reference `cfm.py:176-183`)."""
    dit = tiny_dit()
    cfm = CFM(transformer=dit)
    params = jax.jit(dit.init)(
        jax.random.key(0),
        jnp.zeros((1, 16, 8)),
        jnp.zeros((1, 16, 8)),
        jnp.zeros((1, 4), jnp.int32),
        jnp.zeros((1,)),
    )["params"]
    cond = jax.random.normal(jax.random.key(1), (1, 10, 8))
    text = jnp.asarray([[1, 2, 3, -1]], jnp.int32)
    lens = jnp.asarray([10])
    duration = jnp.asarray([20])
    key = jax.random.key(7)
    out1 = cfm.sample(params, cond, text, duration, lens, key, steps=2, max_duration=32)

    cond2 = jnp.concatenate([cond, cond * 0.5])
    text2 = jnp.concatenate([text, text])
    out2 = cfm.sample(
        params, cond2, text2, jnp.asarray([20, 24]), jnp.asarray([10, 10]), key,
        steps=2, max_duration=32,
    )
    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]), rtol=1e-4, atol=1e-5)


def test_remat_policies_preserve_gradients():
    """checkpoint_activations with remat_policy full/dots/attn must give the SAME
    loss and gradients as the unrematerialized model (remat only changes what
    the backward recomputes vs saves)."""
    import dataclasses

    from eraxvif5tts_tpu.configs import ArchConfig

    mel = jax.random.normal(jax.random.key(1), (2, 16, 8))
    text = jnp.asarray([[1, 2, 3, -1], [2, 3, -1, -1]], jnp.int32)
    lens = jnp.asarray([16, 10])

    def grads_for(arch):
        dit = DiT(arch=arch, text_num_embeds=10, mel_dim=8)
        cfm = CFM(transformer=dit)
        params = jax.jit(dit.init)(
            jax.random.key(0), jnp.zeros((1, 16, 8)), jnp.zeros((1, 16, 8)),
            jnp.zeros((1, 4), jnp.int32), jnp.zeros((1,)),
        )["params"]

        def loss_fn(p):
            loss, _, _ = cfm.loss(p, mel, text, lens, jax.random.key(2),
                                  deterministic=True)
            return loss

        l, g = jax.jit(jax.value_and_grad(loss_fn))(params)
        return float(l), g

    base_arch = ArchConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2,
                           text_dim=32, conv_layers=1, dropout=0.0)
    l0, g0 = grads_for(base_arch)
    for policy in ("full", "dots", "attn"):
        arch = dataclasses.replace(base_arch, checkpoint_activations=True,
                                   remat_policy=policy)
        l1, g1 = grads_for(arch)
        assert abs(l0 - l1) < 1e-5, (policy, l0, l1)
        flat0 = jax.tree_util.tree_leaves(g0)
        flat1 = jax.tree_util.tree_leaves(g1)
        for a, b in zip(flat0, flat1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)

    with pytest.raises(ValueError, match="remat_policy"):
        bad = dataclasses.replace(base_arch, checkpoint_activations=True,
                                  remat_policy="bogus")
        grads_for(bad)


def test_cfm_sample_no_ref_audio_and_t_start():
    """no_ref_audio zeroes the conditioning entirely (`cfm.py:143-144`); t_start
    integrates from an intermediate time (the duplicate_test/t_inter corner,
    `cfm.py:188-195`). Both must produce finite output and differ from the
    conditioned full-trajectory sample."""
    dit = tiny_dit()
    cfm = CFM(transformer=dit)
    params = jax.jit(dit.init)(
        jax.random.key(0),
        jnp.zeros((1, 16, 8)),
        jnp.zeros((1, 16, 8)),
        jnp.zeros((1, 4), jnp.int32),
        jnp.zeros((1,)),
    )["params"]
    # perturb away from AdaLN-zero init: a freshly-initialized DiT predicts an
    # identically-zero flow (zero-init gates + output proj), which would make
    # every time grid produce the same trajectory
    leaves, treedef = jax.tree.flatten(params)
    rngs = jax.random.split(jax.random.key(99), len(leaves))
    params = jax.tree.unflatten(treedef, [
        l + 0.05 * jax.random.normal(r, l.shape, l.dtype)
        for l, r in zip(leaves, rngs)
    ])
    cond = jax.random.normal(jax.random.key(1), (1, 10, 8))
    text = jnp.asarray([[1, 2, 3, -1]], jnp.int32)
    lens, duration, key = jnp.asarray([10]), jnp.asarray([20]), jax.random.key(7)

    base = np.asarray(cfm.sample(params, cond, text, duration, lens, key,
                                 steps=2, max_duration=32))
    noref = np.asarray(cfm.sample(params, cond, text, duration, lens, key,
                                  steps=2, max_duration=32, no_ref_audio=True))
    assert np.isfinite(noref).all()
    # prompt region pastes back the ZEROED cond under no_ref_audio
    np.testing.assert_allclose(noref[0, :10], 0.0)
    assert np.abs(noref[0, 10:20]).max() > 0

    tinter = np.asarray(cfm.sample(params, cond, text, duration, lens, key,
                                   steps=2, max_duration=32, t_start=0.1))
    assert np.isfinite(tinter).all()
    assert np.abs(tinter[0, 10:20] - base[0, 10:20]).max() > 1e-6

    # full duplicate_test parity (`cfm.py:188-195`): y0 blends toward the
    # caller-supplied intermediate state when t_inter_cond is passed
    inter_state = jax.random.normal(jax.random.key(11), (1, 32, 8))
    blended = np.asarray(cfm.sample(params, cond, text, duration, lens, key,
                                    steps=2, max_duration=32, t_start=0.4,
                                    t_inter_cond=inter_state))
    assert np.isfinite(blended).all()
    plain = np.asarray(cfm.sample(params, cond, text, duration, lens, key,
                                  steps=2, max_duration=32, t_start=0.4))
    assert np.abs(blended[0, 10:20] - plain[0, 10:20]).max() > 1e-6
