"""Fused serving kernels (`ops/fused_matmul.py`): numerics parity with the
unfused XLA path and param-tree stability of the fused DiTBlock branch.

The reference computes the same DiT-block algebra as separate torch ops
(`src/f5_tts/model/modules.py:610-641`); here the AdaLN modulate / gate /
residual elementwise passes fold into the four projections, so these tests
pin the fused branch to the unfused one exactly (fp32, interpret mode on CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eraxvif5tts_tpu.models.modules import DiTBlock
from eraxvif5tts_tpu.ops import fused_matmul as fm
from eraxvif5tts_tpu.ops.rotary import rotary_freqs


def _ln(x, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps)


def test_ln_mod_matmul_matches_xla():
    rng = np.random.default_rng(0)
    b, m, k, n = 2, 64, 128, 384
    x = jnp.asarray(rng.standard_normal((b, m, k)), jnp.float32)
    scale = jnp.asarray(0.1 * rng.standard_normal((b, k)), jnp.float32)
    shift = jnp.asarray(0.1 * rng.standard_normal((b, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)) / np.sqrt(k), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal((n,)), jnp.float32)

    got = fm.ln_mod_matmul(x, scale, shift, w, bias, interpret=True)
    normed = _ln(x) * (1.0 + scale[:, None]) + shift[:, None]
    want = normed @ w + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    got_gelu = fm.ln_mod_matmul(x, scale, shift, w, bias,
                                activation="gelu_tanh", interpret=True)
    want_gelu = jax.nn.gelu(want, approximate=True)
    np.testing.assert_allclose(np.asarray(got_gelu), np.asarray(want_gelu),
                               rtol=2e-5, atol=2e-5)


def test_matmul_gate_res_masked_rows():
    rng = np.random.default_rng(1)
    b, m, k, n = 2, 64, 128, 256
    h = jnp.asarray(rng.standard_normal((b, m, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)) / np.sqrt(k), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal((n,)), jnp.float32)
    gate = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((b, m, n)), jnp.float32)
    lens = jnp.asarray([64, 40], jnp.int32)

    got = fm.matmul_gate_res(h, w, bias, gate, res, lens=lens,
                             mask_rows=True, interpret=True)
    update = gate[:, None, :] * (h @ w + bias)
    rows = jnp.arange(m)[None, :, None]
    want = res + jnp.where(rows < lens[:, None, None], update, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # unmasked variant: every row updated
    got_full = fm.matmul_gate_res(h, w, bias, gate, res, interpret=True)
    np.testing.assert_allclose(np.asarray(got_full), np.asarray(res + update),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("with_mask", [False, True])
def test_dit_block_fused_matches_unfused(monkeypatch, with_mask):
    """End-to-end DiTBlock: fused branch == unfused branch on the same params,
    including padded-row passthrough and rotary."""
    dim, heads, dim_head, ff_mult = 128, 2, 64, 2
    b, n = 2, 64
    block = DiTBlock(dim=dim, heads=heads, dim_head=dim_head, ff_mult=ff_mult,
                     dropout=0.0, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((b, n, dim)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((b, dim)), jnp.float32)
    rope = rotary_freqs(n, dim_head)
    mask = (jnp.arange(n)[None, :] < jnp.asarray([[n], [n - 24]])) if with_mask else None

    assert not fm.dit_block_fusion_ok(n, dim, heads * dim_head,
                                      dim * ff_mult, jnp.float32)
    params = block.init(jax.random.PRNGKey(0), x, t, mask=mask, rope=rope)
    want = block.apply(params, x, t, mask=mask, rope=rope)

    monkeypatch.setattr(fm, "_FORCE_FOR_TESTS", True)
    assert fm.dit_block_fusion_ok(n, dim, heads * dim_head,
                                  dim * ff_mult, jnp.float32)
    # identical checkpoint tree whichever branch traced at init
    params_fused = block.init(jax.random.PRNGKey(0), x, t, mask=mask, rope=rope)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_fused)
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(params_fused),
    ):
        assert pa == pb and la.shape == lb.shape

    got = block.apply(params, x, t, mask=mask, rope=rope)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_fusion_gate_rejects_unaligned_and_oversized():
    assert not fm.use_fused_serving(63, 128, 384, jnp.bfloat16)   # m % 8
    assert not fm.use_fused_serving(64, 120, 384, jnp.bfloat16)   # k % 128
    assert not fm.use_fused_serving(64, 128, 200, jnp.bfloat16)   # n % 128
    # big shapes must fall back rather than blow the VMEM budget
    assert fm._pick_bn(2048, 4096, 2048, 2) is None


def test_ln_mod_matmul_grad_matches_reference():
    """The custom_jvp tangent path: grad of the fused kernel == grad of the
    plain jnp formula (the pallas_call itself has no differentiation rule)."""
    rng = np.random.default_rng(3)
    b, m, k, n = 2, 16, 128, 128
    x = jnp.asarray(rng.standard_normal((b, m, k)), jnp.float32)
    scale = jnp.asarray(0.1 * rng.standard_normal((b, k)), jnp.float32)
    shift = jnp.asarray(0.1 * rng.standard_normal((b, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)) / np.sqrt(k), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal((n,)), jnp.float32)

    def fused(x_, w_):
        return jnp.sum(fm.ln_mod_matmul(x_, scale, shift, w_, bias,
                                        activation="gelu_tanh",
                                        interpret=True) ** 2)

    def ref(x_, w_):
        normed = _ln(x_) * (1.0 + scale[:, None]) + shift[:, None]
        return jnp.sum(jax.nn.gelu(normed @ w_ + bias, approximate=True) ** 2)

    gx, gw = jax.grad(fused, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=2e-4, atol=2e-4)


def test_dit_block_fused_traces_under_grad(monkeypatch):
    """Differentiating through a deterministic fused-branch forward must trace
    (frozen-teacher distillation, grad-over-deterministic callers) and agree
    with the unfused branch's gradient."""
    dim, heads, dim_head, ff_mult = 128, 2, 64, 2
    b, n = 2, 64
    block = DiTBlock(dim=dim, heads=heads, dim_head=dim_head, ff_mult=ff_mult,
                     dropout=0.0, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((b, n, dim)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((b, dim)), jnp.float32)
    rope = rotary_freqs(n, dim_head)
    params = block.init(jax.random.PRNGKey(0), x, t, rope=rope)

    def loss(p, x_):
        return jnp.sum(block.apply(p, x_, t, rope=rope) ** 2)

    want = jax.grad(loss, argnums=1)(params, x)
    monkeypatch.setattr(fm, "_FORCE_FOR_TESTS", True)
    got = jax.grad(loss, argnums=1)(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_ln_mod_matmul_rms_matches_xrmsnorm():
    """norm="rms" + scale=g-1 reproduces UNetT's XRMSNorm -> dense exactly
    (the serving fusion folds the pre-FF RMSNorm into project_in)."""
    rng = np.random.default_rng(5)
    b, m, k, n = 2, 16, 128, 256
    x = jnp.asarray(rng.standard_normal((b, m, k)), jnp.float32)
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal((k,)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)) / np.sqrt(k), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal((n,)), jnp.float32)

    scale = jnp.broadcast_to(g[None, :] - 1.0, (b, k))
    got = fm.ln_mod_matmul(x, scale, jnp.zeros_like(scale), w, bias,
                           interpret=True, norm="rms", eps=1e-12)

    # XRMSNorm reference (models/unett.py): normalize(x) * sqrt(d) * g
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    normed = x / jnp.maximum(norm, 1e-12) * (k ** 0.5) * g
    want = normed @ w + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_unett_fused_ff_matches_unfused(monkeypatch):
    """UNetT's fused pre-FF RMSNorm+GELU path is numerically the unfused one."""
    from eraxvif5tts_tpu.configs import ArchConfig
    from eraxvif5tts_tpu.models.unett import UNetT

    arch = ArchConfig(dim=128, depth=2, heads=2, dim_head=64, ff_mult=2,
                      text_dim=None, conv_layers=0, dropout=0.0)
    model = UNetT(arch=arch, text_num_embeds=8, mel_dim=8)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 15, 8)).astype(np.float32))
    cond = 0.1 * jnp.asarray(rng.standard_normal((2, 15, 8)).astype(np.float32))
    text = jnp.asarray([[1, 2, 3, -1], [2, -1, -1, -1]], jnp.int32)
    t = jnp.asarray([0.3, 0.7])
    params = jax.jit(model.init)(jax.random.key(0), x, cond, text, t)["params"]

    unfused = np.asarray(model.apply({"params": params}, x, cond, text, t))
    assert not fm.use_fused_serving(16, 128, 256, jnp.float32)
    monkeypatch.setattr(fm, "_FORCE_FOR_TESTS", True)
    assert fm.use_fused_serving(16, 128, 256, jnp.float32)  # seq 15 + time tok
    fused = np.asarray(model.apply({"params": params}, x, cond, text, t))
    np.testing.assert_allclose(fused, unfused, rtol=2e-4, atol=2e-4)
