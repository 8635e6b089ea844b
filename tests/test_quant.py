"""Int8 W8A8 serving path (`ops/quant.py`): quantized matmul correctness,
param-tree transform, and end-to-end DiT output tolerance vs the fp path."""

import numpy as np

import jax
import jax.numpy as jnp

from eraxvif5tts_tpu.configs import ArchConfig
from eraxvif5tts_tpu.models.dit import DiT
from eraxvif5tts_tpu.ops.quant import int8_matmul, quantize_params, quantize_weight

ARCH = ArchConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, text_dim=32,
                  conv_layers=1, dropout=0.0)


def test_int8_matmul_close_to_fp():
    k1, k2 = jax.random.split(jax.random.key(0))
    x = jax.random.normal(k1, (64, 128))
    w = jax.random.normal(k2, (128, 96)) * 0.05
    w_q, s = quantize_weight(w)
    assert w_q.dtype == jnp.int8 and s.shape == (96,)
    y = np.asarray(int8_matmul(x, w_q, s, out_dtype=jnp.float32))
    ref = np.asarray(x @ w)
    # error budget: int8 weights (~0.4% rel) + per-token int8 activations
    denom = np.abs(ref).max()
    assert np.abs(y - ref).max() / denom < 0.03


def test_quantize_params_targets_only_block_matmuls():
    dit = DiT(arch=ARCH, text_num_embeds=8, mel_dim=8)
    x = jnp.zeros((1, 16, 8))
    cond = jnp.zeros((1, 16, 8))
    text = jnp.zeros((1, 4), jnp.int32)
    t = jnp.zeros((1,))
    fb = jnp.zeros((1,), bool)
    params = jax.jit(dit.init)(jax.random.key(0), x, cond, text, t, fb, fb)["params"]
    qparams = quantize_params(params)
    blk = qparams["block_0"]["attn"]["to_q"]
    assert "kernel_q" in blk and blk["kernel_q"].dtype == jnp.int8
    assert "kernel" not in blk
    # non-targeted Denses untouched
    assert "kernel" in qparams["block_0"]["attn_norm"]["linear"]
    assert "kernel" in qparams["proj_out"]


def test_quantized_dit_matches_fp_within_tolerance():
    import dataclasses

    fp = DiT(arch=ARCH, text_num_embeds=8, mel_dim=8)
    qt = DiT(arch=dataclasses.replace(ARCH, quantized=True),
             text_num_embeds=8, mel_dim=8)
    b, n = 2, 32
    x = jax.random.normal(jax.random.key(1), (b, n, 8))
    cond = jax.random.normal(jax.random.key(2), (b, n, 8)) * 0.1
    text = jnp.zeros((b, 8), jnp.int32).at[:, :5].set(jnp.arange(1, 6))
    t = jnp.full((b,), 0.4)
    fb = jnp.zeros((b,), bool)
    mask = jnp.ones((b, n), bool)

    params = jax.jit(fp.init)(jax.random.key(0), x, cond, text, t, fb, fb)["params"]
    te = fp.apply({"params": params}, text, n, fb, method="embed_text")
    out_fp = fp.apply({"params": params}, x, cond, te, t, fb, mask, method="run")
    out_q = qt.apply({"params": quantize_params(params)}, x, cond, te, t, fb,
                     mask, method="run")
    a, bq = np.asarray(out_fp), np.asarray(out_q)
    denom = np.abs(a).max() + 1e-6
    rel = np.abs(a - bq).max() / denom
    assert rel < 0.08, rel  # W8A8 on 2 layers: a few percent of full scale
    assert np.isfinite(bq).all()


def test_quantized_unett_matches_fp_within_tolerance():
    """arch.quantized threads through UNetT's Attention/FeedForward (same
    to_q/k/v/out + project_* names the DiT blocks use)."""
    import dataclasses

    from eraxvif5tts_tpu.configs import ArchConfig
    from eraxvif5tts_tpu.models import UNetT

    arch = ArchConfig(dim=32, depth=4, heads=2, dim_head=16, ff_mult=2,
                      text_dim=None, conv_layers=0, dropout=0.0)
    fp = UNetT(arch=arch, text_num_embeds=8, mel_dim=8)
    qt = UNetT(arch=dataclasses.replace(arch, quantized=True),
               text_num_embeds=8, mel_dim=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 8)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((2, 12, 8)).astype(np.float32)) * 0.1
    text = jnp.asarray([[1, 2, 3, -1], [2, -1, -1, -1]], jnp.int32)
    t = jnp.asarray([0.3, 0.7])
    params = jax.jit(fp.init)(jax.random.key(0), x, cond, text, t)["params"]
    out_fp = np.asarray(fp.apply({"params": params}, x, cond, text, t))
    out_q = np.asarray(qt.apply({"params": quantize_params(params)},
                                x, cond, text, t))
    rel = np.abs(out_fp - out_q).max() / (np.abs(out_fp).max() + 1e-6)
    assert rel < 0.08, rel
    assert np.isfinite(out_q).all()


def test_quantized_mmdit_matches_fp_within_tolerance():
    """MMDiT's joint attention additionally quantizes the *_c text-stream
    projections (`ops/quant._QUANT_SUFFIXES`)."""
    import dataclasses

    from eraxvif5tts_tpu.configs import ArchConfig
    from eraxvif5tts_tpu.models import MMDiT

    arch = ArchConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2,
                      dropout=0.0)
    fp = MMDiT(arch=arch, text_num_embeds=8, mel_dim=8)
    qt = MMDiT(arch=dataclasses.replace(arch, quantized=True),
               text_num_embeds=8, mel_dim=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 8)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((2, 12, 8)).astype(np.float32)) * 0.1
    text = jnp.asarray([[1, 2, 3, -1], [2, -1, -1, -1]], jnp.int32)
    t = jnp.asarray([0.3, 0.7])
    params = jax.jit(fp.init)(jax.random.key(0), x, cond, text, t)["params"]
    # proj_out (and the AdaLN gates) are zero-init; perturb them so block
    # outputs actually reach the output and the comparison is non-vacuous
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.key(9), p.shape, p.dtype)
        if p.ndim >= 1 else p,
        params,
    )
    qparams = quantize_params(params)
    # every joint-attention projection (incl. the text-stream *_c ones) got int8
    blk = qparams["block_0"]["attn"]
    for name in ("to_q", "to_v_c", "to_out_c"):
        assert "kernel_q" in blk[name], name
    out_fp = np.asarray(fp.apply({"params": params}, x, cond, text, t))
    out_q = np.asarray(qt.apply({"params": qparams}, x, cond, text, t))
    assert np.abs(out_fp).max() > 1e-3  # non-vacuous
    rel = np.abs(out_fp - out_q).max() / (np.abs(out_fp).max() + 1e-6)
    assert rel < 0.08, rel
    assert np.isfinite(out_q).all()


def test_int8_quality_gate_hard_error_path(monkeypatch):
    """`int8_validate=True` runs `quant_divergence` (int8 vs bf16 over the same
    weights, fixed prompt/seed) and refuses to serve when the divergence bound
    is exceeded (`infer/wrapper.py`; no reference counterpart — the reference
    has no quantized path, so the gate guards against silent breakage)."""
    import pytest

    from eraxvif5tts_tpu.configs import ModelConfig
    from eraxvif5tts_tpu.infer.wrapper import F5TTSWrapper
    from eraxvif5tts_tpu.ops import quant

    cfg = ModelConfig(arch=ARCH)
    vocab = {c: i for i, c in enumerate(" abcdefgh")}

    # impossible bound -> the gate must refuse to serve
    monkeypatch.setattr(quant, "INT8_REL_MSE_THRESHOLD", -1.0)
    with pytest.raises(ValueError, match="quality gate failed"):
        F5TTSWrapper(model_cfg=cfg, vocab_char_map=vocab,
                     compute_dtype="int8", int8_validate=True)

    # permissive bound -> serves; same compiled programs, so this is cheap
    monkeypatch.setattr(quant, "INT8_REL_MSE_THRESHOLD", float("inf"))
    w = F5TTSWrapper(model_cfg=cfg, vocab_char_map=vocab,
                     compute_dtype="int8", int8_validate=True)
    assert w.params is not None


def test_quant_divergence_gate_runs_for_unett():
    """The int8 quality gate (`int8_validate=True`) must work for every
    backbone that can serve int8 — drive it with a tiny UNetT."""
    import dataclasses

    from eraxvif5tts_tpu.configs import ArchConfig
    from eraxvif5tts_tpu.models import UNetT
    from eraxvif5tts_tpu.models.cfm import CFM
    from eraxvif5tts_tpu.ops.quant import quant_divergence

    arch = ArchConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2,
                      text_dim=None, conv_layers=0, dropout=0.0)
    fp_tf = UNetT(arch=arch, text_num_embeds=32, mel_dim=100)
    q_tf = UNetT(arch=dataclasses.replace(arch, quantized=True),
                 text_num_embeds=32, mel_dim=100)
    cfm_fp, cfm_q = CFM(transformer=fp_tf), CFM(transformer=q_tf)
    params = cfm_fp.init_params(jax.random.key(0))
    params = jax.tree.map(
        lambda p: p + 0.02 * jax.random.normal(jax.random.key(5), p.shape, p.dtype),
        params)
    # max_duration must exceed prompt_frames+64 or the scored region is empty
    rep = quant_divergence(cfm_fp, params, cfm_q, quantize_params(params),
                           steps=2, max_duration=256)
    assert rep["passes_gate"], rep
    assert np.isfinite(rep["lsd_db"]) and rep["forward_rel_mse"] < 5e-2


def test_int8_ff_fused_matches_reference():
    """The one-kernel FF (interpret mode) equals its jnp surrogate exactly."""
    from eraxvif5tts_tpu.ops.quant_ff import int8_ff_fused, int8_ff_reference

    rng = np.random.default_rng(7)
    b, m, k, n, k2 = 2, 128, 256, 512, 256
    x = jnp.asarray(rng.standard_normal((b, m, k)), jnp.float32)
    w1, s1 = quantize_weight(jnp.asarray(rng.standard_normal((k, n)) * 0.05))
    w2, s2 = quantize_weight(jnp.asarray(rng.standard_normal((n, k2)) * 0.05))
    b1 = jnp.asarray(0.1 * rng.standard_normal((n,)), jnp.float32)
    b2 = jnp.asarray(0.1 * rng.standard_normal((k2,)), jnp.float32)

    got = int8_ff_fused(x, w1, s1, b1, w2, s2, b2, interpret=True)
    want = int8_ff_reference(x, w1, s1, b1, w2, s2, b2, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_int8_ff_fused_close_to_two_quantdense():
    """Same quantization grid as the QuantDense->gelu->QuantDense path; the
    only divergence is the fp32 (vs bf16) hidden activation."""
    import flax.linen as nn

    from eraxvif5tts_tpu.ops.quant import QuantDense
    from eraxvif5tts_tpu.ops.quant_ff import int8_ff_fused

    rng = np.random.default_rng(8)
    b, m, k, n = 2, 128, 256, 512
    x = jnp.asarray(rng.standard_normal((b, m, k)), jnp.float32)
    w1, s1 = quantize_weight(jnp.asarray(rng.standard_normal((k, n)) * 0.05))
    w2, s2 = quantize_weight(jnp.asarray(rng.standard_normal((n, k)) * 0.05))
    b1 = jnp.zeros((n,), jnp.float32)
    b2 = jnp.zeros((k,), jnp.float32)

    fused = np.asarray(
        int8_ff_fused(x, w1, s1, b1, w2, s2, b2, interpret=True), np.float32)

    d1 = QuantDense(n, dtype=jnp.float32)
    h = d1.apply({"params": {"kernel_q": w1, "kernel_scale": s1,
                             "bias": b1}}, x)
    h = nn.gelu(h, approximate=True)
    d2 = QuantDense(k, dtype=jnp.float32)
    unfused = np.asarray(d2.apply({"params": {"kernel_q": w2,
                                              "kernel_scale": s2,
                                              "bias": b2}}, h))
    denom = np.abs(unfused).max()
    assert np.abs(fused - unfused).max() / denom < 0.02


def test_feedforward_int8_fused_path_matches_unfused(monkeypatch):
    """FeedForward(quantized=True) routes through int8_ff_fused when the gate
    admits the shape; the checkpoint tree and outputs match the QuantDense
    branch."""
    from eraxvif5tts_tpu.models.modules import FeedForward
    from eraxvif5tts_tpu.ops import fused_matmul as fm
    from eraxvif5tts_tpu.ops import quant_ff

    ff = FeedForward(dim=128, mult=2, dropout=0.0, dtype=jnp.float32,
                     quantized=True)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 64, 128)), jnp.float32)
    params = jax.jit(ff.init)(jax.random.key(0), x)["params"]
    # structured weights so the comparison is non-trivial
    params = jax.tree.map(
        lambda p: (jnp.asarray(
            rng.integers(-127, 128, p.shape), jnp.int8) if p.dtype == jnp.int8
            else jnp.asarray(0.01 + 0.01 * rng.standard_normal(p.shape),
                             p.dtype)),
        params)

    assert not quant_ff.use_int8_ff(64, 128, 256, 128)  # CPU: gate off
    unfused = np.asarray(ff.apply({"params": params}, x))
    monkeypatch.setattr(fm, "_FORCE_FOR_TESTS", True)
    assert quant_ff.use_int8_ff(64, 128, 256, 128)
    fused = np.asarray(ff.apply({"params": params}, x))
    denom = max(np.abs(unfused).max(), 1e-6)
    assert np.abs(fused - unfused).max() / denom < 0.02
