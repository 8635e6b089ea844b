"""Flash training attention with in-kernel position-hash dropout
(`ops/train_attention.py`), exercised in interpret mode against a dense oracle
that uses the *same* hash mask — the dropout path is exactly checkable, not
just statistically (reference semantics: SDPA dropout_p, `modules.py:490`)."""

import numpy as np

import jax
import jax.numpy as jnp

from eraxvif5tts_tpu.ops.train_attention import (
    dense_reference,
    dropout_keep_mask,
    train_attention,
)

B, N, H, D = 2, 256, 4, 64


def _inputs():
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(k1, (B, N, H, D))
    k = jax.random.normal(k2, (B, N, H, D))
    v = jax.random.normal(k3, (B, N, H, D))
    lens = jnp.asarray([N, 150])
    mask = jnp.arange(N)[None, :] < lens[:, None]
    return q, k, v, mask


def test_fwd_matches_dense_no_dropout():
    q, k, v, mask = _inputs()
    out = train_attention(q, k, v, key_valid=mask, interpret=True)
    ref = dense_reference(q, k, v, key_valid=mask)
    diff = np.abs(np.asarray(out - ref)) * np.asarray(mask)[:, :, None, None]
    assert diff.max() < 2e-6


def test_fwd_and_grads_match_dense_with_dropout():
    q, k, v, mask = _inputs()
    rng = jax.random.key(7)
    # the kernel mixes both 32-bit key words through independent fmix rounds;
    # derive the oracle seed the same way
    from eraxvif5tts_tpu.ops.train_attention import _fmix32

    kd = jax.random.key_data(rng).reshape(-1)
    seed = int(np.int32(np.uint32(
        _fmix32(kd[0].astype(jnp.uint32))
        ^ _fmix32(kd[-1].astype(jnp.uint32) + jnp.uint32(0x9E3779B9))
    )))

    out = train_attention(q, k, v, key_valid=mask, dropout_rate=0.1,
                          dropout_rng=rng, interpret=True)
    ref = dense_reference(q, k, v, key_valid=mask, dropout_rate=0.1, seed=seed)
    diff = np.abs(np.asarray(out - ref)) * np.asarray(mask)[:, :, None, None]
    assert diff.max() < 2e-6

    def loss_k(q, k, v):
        o = train_attention(q, k, v, key_valid=mask, dropout_rate=0.1,
                            dropout_rng=rng, interpret=True)
        return jnp.sum(jnp.where(mask[:, :, None, None], o, 0.0) ** 2)

    def loss_d(q, k, v):
        o = dense_reference(q, k, v, key_valid=mask, dropout_rate=0.1, seed=seed)
        return jnp.sum(jnp.where(mask[:, :, None, None], o, 0.0) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_d, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    # padded keys receive zero dk/dv
    assert np.abs(np.asarray(gk[1])[1, 150:]).max() == 0.0
    assert np.abs(np.asarray(gk[2])[1, 150:]).max() == 0.0


def test_hash_mask_block_invariance_and_rate():
    """The mask depends only on (seed, positions) — any block decomposition
    reproduces the same bits (what makes bwd regeneration sound) — and keeps
    ~keep of the elements."""
    whole = dropout_keep_mask(9, 1, 3, 0, 0, 256, 256, 256, 0.9)
    block = dropout_keep_mask(9, 1, 3, 128, 64, 64, 128, 256, 0.9)
    np.testing.assert_array_equal(np.asarray(whole)[128:192, 64:192],
                                  np.asarray(block))
    frac = float(np.mean(np.asarray(whole)))
    assert 0.88 < frac < 0.92

    # different (seed | batch | head) decorrelate
    for other in (dropout_keep_mask(10, 1, 3, 0, 0, 256, 256, 256, 0.9),
                  dropout_keep_mask(9, 2, 3, 0, 0, 256, 256, 256, 0.9),
                  dropout_keep_mask(9, 1, 4, 0, 0, 256, 256, 256, 0.9)):
        agree = float(np.mean(np.asarray(whole) == np.asarray(other)))
        assert agree < 0.85  # ~0.82 expected for independent keep=0.9 masks


def test_seed_determinism():
    q, k, v, mask = _inputs()
    rng = jax.random.key(3)
    a = train_attention(q, k, v, key_valid=mask, dropout_rate=0.2,
                        dropout_rng=rng, interpret=True)
    b = train_attention(q, k, v, key_valid=mask, dropout_rate=0.2,
                        dropout_rng=rng, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = train_attention(q, k, v, key_valid=mask, dropout_rate=0.2,
                        dropout_rng=jax.random.key(4), interpret=True)
    assert np.abs(np.asarray(a - c)).max() > 1e-3


def test_bwd_blocks_override_grads_identical():
    """bwd_blocks overrides the backward kernels' block layout without
    changing results: grads are identical to the default layout (the
    position-hash dropout mask depends only on absolute positions)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from eraxvif5tts_tpu.ops.train_attention import train_attention

    b, n, h, d = 2, 256, 2, 64
    kq, kk, kv = jax.random.split(jax.random.key(3), 3)
    q = jax.random.normal(kq, (b, n, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, n, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, n, h, d), jnp.float32)
    mask = jnp.arange(n)[None, :] < jnp.asarray([n, n - 128])[:, None]
    rng = jax.random.key(9)

    def grads(cfg):
        def loss(args):
            q_, k_, v_ = args
            o = train_attention(q_, k_, v_, key_valid=mask, dropout_rate=0.1,
                                dropout_rng=rng, interpret=True,
                                bwd_blocks=cfg)
            return jnp.sum(o.astype(jnp.float32) ** 2)
        return jax.grad(loss)((q, k, v))

    g_def = grads(None)
    g_alt = grads((128, 256, 128, 256))
    for a, b_ in zip(g_def, g_alt):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=0, atol=2e-4)


def test_bwd_default_blocks_calibration():
    """The backward default block layout follows the round-5 TPU sweep: at the
    training length the dq kernel's key block narrows to 256; short and
    non-divisible lengths keep the square _block(n) layout."""
    from eraxvif5tts_tpu.ops.train_attention import _block, _bwd_default_blocks

    assert _bwd_default_blocks(4096) == (512, 256, 512, 512)
    assert _bwd_default_blocks(2048) == (512, 256, 512, 512)
    # short sequences: square layout unchanged
    assert _bwd_default_blocks(1024) == (512, 512, 512, 512)
    assert _bwd_default_blocks(256) == (256, 256, 256, 256)
    # lengths where 256 does not divide n fall back to square _block(n)
    n = 2688  # 21*128: divisible by 128/384, not by 256
    b = _block(n)
    assert _bwd_default_blocks(n) == (b, b, b, b)


def test_dtype_gate_fp32_long_n():
    """float32 operands at n=4096 measured 21.2 MB scoped VMEM on v5e (limit
    16 MB, compile failure); the gate must refuse them and keep bf16 + short
    fp32 lengths (the production bf16 recipe and every CPU-interpret test)."""
    from eraxvif5tts_tpu.ops.train_attention import can_use_train_kernel

    assert can_use_train_kernel(4096, 64, jnp.bfloat16)
    assert not can_use_train_kernel(4096, 64, jnp.float32)
    assert can_use_train_kernel(3072, 64, jnp.float32)
    assert can_use_train_kernel(4096, 64)  # dtype unknown: shape-only gate
    assert not can_use_train_kernel(4100, 64, jnp.bfloat16)
