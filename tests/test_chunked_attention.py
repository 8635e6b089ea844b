"""Chunked online-softmax training attention (flash-style, in-kernel dropout) vs
the einsum reference (SDPA dropout semantics, reference `modules.py:490,582`)."""

import numpy as np

import jax
import jax.numpy as jnp

from eraxvif5tts_tpu.ops.attention import (
    attention_reference,
    chunked_dot_product_attention,
)


def _qkv(b=2, n=512, h=2, d=16, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((b, n, h, d)).astype(np.float32))
    return mk(), mk(), mk()


def test_chunked_matches_reference_no_dropout():
    q, k, v = _qkv(n=512)
    mask = jnp.asarray(np.array([[True] * 512, [True] * 300 + [False] * 212]))
    got = jax.jit(lambda *a: chunked_dot_product_attention(
        *a, key_valid=mask, query_chunk_size=128, key_chunk_size=128))(q, k, v)
    want = attention_reference(q, k, v, key_valid=mask)
    # padded-query rows are garbage in both (zeroed by the caller); compare valid
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got[1, :300]), np.asarray(want[1, :300]),
                               rtol=2e-5, atol=2e-5)


def test_chunked_single_chunk_and_dense_fallback():
    # n <= chunk cap: single chunk
    q, k, v = _qkv(n=48)
    got = chunked_dot_product_attention(q, k, v)
    want = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
    # ragged n > cap that no block divides: dense fallback path
    q, k, v = _qkv(n=600)
    got = chunked_dot_product_attention(q, k, v, query_chunk_size=512)
    want = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_chunked_dropout_deterministic_and_unbiased():
    q, k, v = _qkv(n=256)
    key = jax.random.key(3)
    f = jax.jit(lambda rng: chunked_dot_product_attention(
        q, k, v, dropout_rate=0.5, dropout_rng=rng,
        query_chunk_size=128, key_chunk_size=128))
    out1, out2 = f(key), f(key)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = f(jax.random.key(4))
    assert not np.allclose(np.asarray(out1), np.asarray(out3))
    # unbiased in expectation: averaging over many keys approaches no-dropout
    outs = np.mean([np.asarray(f(jax.random.key(i))) for i in range(64)], axis=0)
    want = np.asarray(attention_reference(q, k, v))
    assert np.abs(outs - want).mean() < 0.15 * np.abs(want).mean() + 0.05


def test_chunked_attention_grads_finite_with_padding():
    q, k, v = _qkv(b=1, n=256)
    mask = jnp.asarray(np.array([[True] * 100 + [False] * 156]))

    def loss(q, k, v):
        out = chunked_dot_product_attention(
            q, k, v, key_valid=mask, dropout_rate=0.1,
            dropout_rng=jax.random.key(0), query_chunk_size=128, key_chunk_size=128)
        out = jnp.where(mask[..., None, None], out, 0.0)
        return jnp.sum(jnp.square(out))

    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    # fully-padded key columns get zero gradient
    gk = np.asarray(grads[1])
    assert np.abs(gk[0, 100:]).max() == 0.0


def test_serving_attention_kernel_matches_reference():
    """One-shot serving kernel (interpret mode): exact softmax attention with
    contiguous-prefix key masking, NaN-free on fully-masked rows."""
    from eraxvif5tts_tpu.ops.serving_attention import _blocks, serving_attention

    b, n, h, d = 2, 256, 4, 64
    k1, k2, k3 = jax.random.split(jax.random.key(7), 3)
    q = jax.random.normal(k1, (b, n, h, d))
    k = jax.random.normal(k2, (b, n, h, d))
    v = jax.random.normal(k3, (b, n, h, d))

    out = serving_attention(q, k, v, None, interpret=True)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)

    lens = jnp.asarray([200, 131])
    mask = jnp.arange(n)[None, :] < lens[:, None]
    out = serving_attention(q, k, v, lens, interpret=True)
    ref = attention_reference(q, k, v, key_valid=mask)
    diff = np.abs(np.asarray(out - ref)) * np.asarray(mask)[:, :, None, None]
    assert diff.max() < 2e-6
    assert np.isfinite(np.asarray(out)).all()

    # zero valid keys must not produce NaN (padded batch rows)
    out0 = serving_attention(q, k, v, jnp.asarray([0, n]), interpret=True)
    assert np.isfinite(np.asarray(out0)).all()

    # block chooser: q block always divides n, head block always divides h
    for nn in (256, 384, 512, 768, 1024, 1536, 2048, 3072, 4096):
        hb, bq = _blocks(nn, 16)
        assert nn % bq == 0 and 16 % hb == 0
        assert hb * bq * nn <= 1024 * 1024 * 4  # logits tile cap


def test_serving_attention_headloop_fused_rope():
    """Headloop variant with in-kernel rotary == rotate-then-attend reference."""
    from eraxvif5tts_tpu.ops.rotary import apply_rotary, rotary_freqs
    from eraxvif5tts_tpu.ops.serving_attention import (
        _headloop_blocks,
        serving_attention,
    )

    b, n, h, d = 2, 256, 4, 64
    k1, k2, k3 = jax.random.split(jax.random.key(11), 3)
    q = jax.random.normal(k1, (b, n, h, d))
    k = jax.random.normal(k2, (b, n, h, d))
    v = jax.random.normal(k3, (b, n, h, d))
    lens = jnp.asarray([256, 140])
    mask = jnp.arange(n)[None, :] < lens[:, None]
    rope = rotary_freqs(n, d)

    qr = apply_rotary(q.swapaxes(1, 2), rope).swapaxes(1, 2)
    kr = apply_rotary(k.swapaxes(1, 2), rope).swapaxes(1, 2)
    ref = attention_reference(qr, kr, v, key_valid=mask)

    for blocks in (None, (4, 128), (2, 256)):
        for variant in ("headloop", "headloop_pre"):
            out = serving_attention(q, k, v, lens, rope=rope, interpret=True,
                                    variant=variant, blocks=blocks)
            diff = (np.abs(np.asarray(out - ref))
                    * np.asarray(mask)[:, :, None, None])
            assert diff.max() < 1e-5, (variant, blocks, diff.max())

    # chooser: valid divisors and bounded VMEM (calibrated double-buffer model)
    # at every serving bucket
    from eraxvif5tts_tpu.infer.utils import DURATION_BUCKETS

    for nn in DURATION_BUCKETS:
        for hh in (16, 12, 8):
            hb, bq = _headloop_blocks(nn, hh, 64)
            assert nn % bq == 0 and hh % hb == 0
            kv = hb * nn * 64 * 2 * 2
            q_blk = hb * bq * 64 * 2
            # one-shot q blocks (bq == n) are not double-buffered (extent-1
            # grid dim) and get the measured 14 MB headroom; divisor blocks
            # keep the conservative 13 MB double-buffer budget
            q_bufs = q_blk if bq == nn else 2 * q_blk
            vmem = (2 * kv + 2 * nn * 64 * 4 + bq * nn * 4 + q_bufs + q_blk
                    + 2 * bq * 64 * 4)
            limit = 14 if bq == nn else 13
            assert vmem <= limit * 1024 * 1024, (nn, hh, hb, bq, vmem)


def test_serving_attention_64_aligned_one_shot():
    """64-only-aligned sequences (n % 128 == 64) ride the one-shot fat-q block:
    interpret-mode parity with the rotate-then-attend reference, and every
    64-only duration bucket must be VMEM-feasible at flagship h=16 d=64."""
    from eraxvif5tts_tpu.infer.utils import DURATION_BUCKETS
    from eraxvif5tts_tpu.ops.rotary import apply_rotary, rotary_freqs
    from eraxvif5tts_tpu.ops.serving_attention import (
        _headloop_blocks,
        one_shot_feasible,
        serving_attention,
    )

    b, n, h, d = 2, 320, 4, 64
    assert n % 128 == 64
    k1, k2, k3 = jax.random.split(jax.random.key(13), 3)
    q = jax.random.normal(k1, (b, n, h, d))
    k = jax.random.normal(k2, (b, n, h, d))
    v = jax.random.normal(k3, (b, n, h, d))
    lens = jnp.asarray([n, 187])
    mask = jnp.arange(n)[None, :] < lens[:, None]
    rope = rotary_freqs(n, d)

    hb, bq = _headloop_blocks(n, h, d)
    assert bq == n  # no 128-multiple divides n -> one-shot block

    qr = apply_rotary(q.swapaxes(1, 2), rope).swapaxes(1, 2)
    kr = apply_rotary(k.swapaxes(1, 2), rope).swapaxes(1, 2)
    ref = attention_reference(qr, kr, v, key_valid=mask)
    out = serving_attention(q, k, v, lens, rope=rope, interpret=True,
                            variant="headloop")
    diff = np.abs(np.asarray(out - ref)) * np.asarray(mask)[:, :, None, None]
    assert diff.max() < 1e-5, diff.max()

    # ladder invariant: every 64-only bucket the wrapper can pick must be
    # one-shot feasible (else it would silently fall off the serving kernel)
    for nn in DURATION_BUCKETS:
        if nn % 128 == 64:
            assert one_shot_feasible(nn, 16, 64), nn
    # infeasible shapes are refused, not mis-blocked
    assert not one_shot_feasible(1984, 16, 64)

    # the pad-to-128 escape hatch (ERAX_SERVING_ATTN_PAD64) is exact: padded
    # keys are masked out, padded query rows sliced off, zero rope angles are
    # the identity rotation
    from eraxvif5tts_tpu.ops.serving_attention import padded_serving_attention

    out_pad = padded_serving_attention(q, k, v, lens, rope=rope, interpret=True)
    assert out_pad.shape == q.shape
    diff = np.abs(np.asarray(out_pad - ref)) * np.asarray(mask)[:, :, None, None]
    assert diff.max() < 1e-5, diff.max()
    # lens=None means "all n valid", not "all n+pad valid"
    full = padded_serving_attention(q, k, v, None, rope=rope, interpret=True)
    want = serving_attention(q, k, v, jnp.asarray([n, n]), rope=rope,
                             interpret=True)
    assert np.abs(np.asarray(full - want)).max() < 1e-6
    import pytest

    with pytest.raises(ValueError, match="no VMEM-feasible"):
        _headloop_blocks(1984, 16, 64)

def test_pad64_auto_fallback_on_mosaic_failure(monkeypatch):
    """A Mosaic/scoped-vmem compile failure at a 64-only-aligned bucket flips
    the module pad64 flag exactly once (self-heal without the env var); other
    errors and 128-aligned shapes never trigger it."""
    from eraxvif5tts_tpu.ops import attention as A

    monkeypatch.setattr(A, "_PAD64_FORCED", False)
    err = RuntimeError("Mosaic failed to compile: scoped vmem limit exceeded")
    # 128-aligned shapes can't be cured by padding -> no flip
    assert not A.maybe_force_pad64(err, 1024)
    assert not A._PAD64_FORCED
    # unrelated errors -> no flip
    assert not A.maybe_force_pad64(RuntimeError("out of host memory"), 1088)
    assert not A._PAD64_FORCED
    # the real case flips the flag, warns, and reports retry-worthy
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert A.maybe_force_pad64(err, 1088)
    assert A._PAD64_FORCED and any("pad-to-128" in str(x.message) for x in w)
    assert A._pad64_enabled()
    # once forced, a second failure is not retried again (no infinite loop)
    assert not A.maybe_force_pad64(err, 1088)


def test_wrapper_dispatch_retries_after_mosaic_failure(monkeypatch):
    """F5TTSWrapper._dispatch_sample_vocode retries the jit call once after the
    pad64 flag flips, and propagates anything else."""
    from eraxvif5tts_tpu.ops import attention as A

    monkeypatch.setattr(A, "_PAD64_FORCED", False)

    class FakeWrapper:
        calls = 0

        def _sample_vocode_jit(self, *a, **kw):
            self.calls += 1
            if self.calls == 1:
                raise RuntimeError("Mosaic lowering error: scoped vmem")
            return "pcm", "mel"

    from eraxvif5tts_tpu.infer.wrapper import F5TTSWrapper

    fw = FakeWrapper()
    out = F5TTSWrapper._dispatch_sample_vocode(fw, max_duration=1088)
    assert out == ("pcm", "mel") and fw.calls == 2 and A._PAD64_FORCED

    monkeypatch.setattr(A, "_PAD64_FORCED", False)

    class FailOther:
        def _sample_vocode_jit(self, *a, **kw):
            raise ValueError("bad input")

    import pytest

    with pytest.raises(ValueError, match="bad input"):
        F5TTSWrapper._dispatch_sample_vocode(FailOther(), max_duration=1088)
    assert not A._PAD64_FORCED
