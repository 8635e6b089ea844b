"""F5TTSWrapper end-to-end tests (tiny model, CPU): API parity semantics, audio
utilities, duration predictor."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eraxvif5tts_tpu.audio.io import read_wav, write_wav
from eraxvif5tts_tpu.audio.resample import resample
from eraxvif5tts_tpu.audio.silence import (
    clip_reference_audio,
    detect_leading_silence,
    remove_silence_edges,
)
from eraxvif5tts_tpu.configs import ArchConfig, MelSpecConfig, ModelConfig
from eraxvif5tts_tpu.infer.utils import byte_ratio_duration, cross_fade_concat, pick_bucket
from eraxvif5tts_tpu.infer.wrapper import F5TTSWrapper
from eraxvif5tts_tpu.models.duration import DurationPredictor

SR = 24000


@pytest.fixture(scope="module")
def tiny_wrapper():
    cfg = ModelConfig(
        name="tiny",
        arch=ArchConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, text_dim=32,
                        conv_layers=1, dropout=0.0),
        mel_spec=MelSpecConfig(),
    )
    chars = list(" abcdefghijklmnopqrstuvwxyz.,!?")
    vocab = {c: i for i, c in enumerate(chars)}
    return F5TTSWrapper(model_cfg=cfg, vocab_char_map=vocab, nfe_step=2,
                        duration_buckets=(64, 128), text_buckets=(64, 128))


def _make_ref_audio():
    t = np.arange(SR // 4) / SR  # 0.25 s of tone (small: CPU compiles are slow)
    return (0.2 * np.sin(2 * np.pi * 180 * t)).astype(np.float32)


def test_wrapper_generate_end_to_end(tiny_wrapper):
    w = tiny_wrapper
    ref = w.preprocess_reference(ref_audio=_make_ref_audio(), ref_sample_rate=SR,
                                 ref_text="hello there")
    assert ref.text.endswith(". ")
    assert ref.n_frames > 15
    wave = w.generate("this is a test sentence.", nfe_step=2, seed=0,
                      return_numpy=True, use_pinyin=False)
    assert wave.ndim == 1 and len(wave) > 0
    assert np.isfinite(wave).all()
    assert w.get_current_audio_length() == pytest.approx(len(wave) / SR)


def test_wrapper_seed_determinism(tiny_wrapper):
    w = tiny_wrapper
    w.preprocess_reference(ref_audio=_make_ref_audio(), ref_sample_rate=SR,
                           ref_text="hello there")
    a = w.generate("same text.", nfe_step=2, seed=42, return_numpy=True, use_pinyin=False)
    b = w.generate("same text.", nfe_step=2, seed=42, return_numpy=True, use_pinyin=False)
    np.testing.assert_array_equal(a, b)


def test_wrapper_per_request_reference_state(tiny_wrapper):
    """References are immutable values -> no shared-state race (SURVEY.md §5)."""
    w = tiny_wrapper
    ref1 = w.preprocess_reference(ref_audio=_make_ref_audio(), ref_sample_rate=SR,
                                  ref_text="voice one")
    ref2 = w.preprocess_reference(ref_audio=_make_ref_audio() * 0.5,
                                  ref_sample_rate=SR, ref_text="voice two")
    out1 = w.generate("hi.", ref=ref1, nfe_step=2, seed=1, return_numpy=True, use_pinyin=False)
    assert w.ref is ref2  # stored state untouched by per-call ref
    assert len(out1) > 0


def test_wrapper_output_file(tiny_wrapper, tmp_path):
    w = tiny_wrapper
    w.preprocess_reference(ref_audio=_make_ref_audio(), ref_sample_rate=SR,
                           ref_text="hello there")
    path = str(tmp_path / "out.wav")
    result = w.generate("write me to disk.", output_path=path, nfe_step=2, seed=0,
                        use_pinyin=False)
    assert result == path
    wav, sr = read_wav(path)
    assert sr == SR and wav.shape[1] > 0


# ---------------------------------------------------------------------------
# infer utils


def test_pick_bucket():
    assert pick_bucket(1) == 256
    assert pick_bucket(256) == 256
    assert pick_bucket(257) == 320  # 64-step ladder through 1600
    assert pick_bucket(1035) == 1088
    assert pick_bucket(1601) == 1664  # 128-steps 1664..2048
    assert pick_bucket(1665) == 1792
    assert pick_bucket(99999) == 4096


def test_byte_ratio_duration():
    # ref 100 frames, ref text 10 bytes, gen 20 bytes, speed 1 -> 100 + 200
    assert byte_ratio_duration(100, "a" * 10, "b" * 20, 1.0) == 300
    assert byte_ratio_duration(100, "a" * 10, "b" * 20, 2.0) == 200
    assert byte_ratio_duration(100, "a", "b", 1.0, fix_duration=2.0) == int(2.0 * 24000 / 256)


def test_cross_fade_concat():
    a = np.ones(1000, np.float32)
    b = np.zeros(1000, np.float32)
    out = cross_fade_concat([a, b], SR, cross_fade_duration=1000 / SR)
    assert len(out) == 1000  # full overlap
    out2 = cross_fade_concat([a, b], SR, cross_fade_duration=0)
    assert len(out2) == 2000
    out3 = cross_fade_concat([a, b], SR, cross_fade_duration=100 / SR)
    assert len(out3) == 2000 - 100


# ---------------------------------------------------------------------------
# audio utils


def test_wav_roundtrip(tmp_path):
    wav = (np.sin(np.linspace(0, 100, 2400)) * 0.5).astype(np.float32)
    path = str(tmp_path / "x.wav")
    write_wav(path, wav, SR)
    back, sr = read_wav(path)
    assert sr == SR
    np.testing.assert_allclose(back[0], wav, atol=1e-4)


def test_resample():
    wav = np.sin(2 * np.pi * 100 * np.arange(16000) / 16000).astype(np.float32)
    out = resample(wav, 16000, 24000)
    assert len(out) == 24000
    # energy preserved approximately
    assert abs(np.std(out) - np.std(wav)) < 0.05


def test_silence_edges_and_leading():
    sr = 1000
    wav = np.concatenate([np.zeros(500), 0.5 * np.ones(1000), np.zeros(500)]).astype(np.float32)
    lead = detect_leading_silence(wav, sr)
    assert 400 <= lead <= 510
    trimmed = remove_silence_edges(wav, sr)
    assert 950 <= len(trimmed) <= 1100


def test_clip_reference_audio_budget():
    sr = 1000
    # 20 s of loud audio with a silence gap at 8 s
    loud = 0.5 * np.ones(8 * sr, np.float32)
    gap = np.zeros(2 * sr, np.float32)
    wav = np.concatenate([loud, gap, 0.5 * np.ones(10 * sr, np.float32)])
    out = clip_reference_audio(wav, sr)
    assert len(out) <= 12 * sr + sr  # within budget (+50ms pad and keep_silence slack)


# ---------------------------------------------------------------------------
# duration predictor


def test_duration_predictor_shapes():
    dp = DurationPredictor(vocab_size=10)
    ids = jnp.asarray([[1, 2, 3, 0, 0]])
    mask = ids > 0
    params = jax.jit(dp.init)(jax.random.key(0), ids, mask)["params"]
    logw = jax.jit(dp.apply)({"params": params}, ids, mask)
    assert logw.shape == (1, 5)
    assert np.all(np.asarray(logw)[0, 3:] == 0.0)  # masked positions zero


def test_generate_batch(tiny_wrapper):
    w = tiny_wrapper
    ref = w.preprocess_reference(ref_audio=_make_ref_audio(), ref_sample_rate=SR,
                                 ref_text="hello there")
    waves = w.generate_batch(["first utterance.", "a much longer second utterance here."],
                             ref=ref, nfe_step=2, seed=3, use_pinyin=False)
    assert len(waves) == 2
    assert all(np.isfinite(wv).all() and len(wv) > 0 for wv in waves)
    assert len(waves[1]) > len(waves[0])  # longer text -> longer audio
    # batched result matches the single-utterance path for the same seed
    solo = w.generate("first utterance.", ref=ref, nfe_step=2, seed=3,
                      return_numpy=True, use_pinyin=False)
    # same duration heuristic -> same length (values differ only via batch padding)
    assert abs(len(solo) - len(waves[0])) <= w.hop_length


def test_unett_wrapper_aligned_buckets():
    """UNetT wrappers use 128k-1 mel buckets so the packed time token lands the
    transformer on a 128-aligned sequence (serving-kernel dispatch)."""
    cfg = ModelConfig(
        name="tiny-e2",
        backbone="UNetT",
        arch=ArchConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2,
                        text_dim=None, conv_layers=0, dropout=0.0,
                        text_mask_padding=False, pe_attn_head=1),
        mel_spec=MelSpecConfig(),
    )
    vocab = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.,!?")}
    w = F5TTSWrapper(model_cfg=cfg, vocab_char_map=vocab, nfe_step=2)
    assert w.duration_buckets[0] % 128 == 127
    w.preprocess_reference(ref_audio=_make_ref_audio(), ref_sample_rate=SR,
                           ref_text="hello there")
    wave = w.generate("a short test.", nfe_step=2, seed=0, return_numpy=True,
                      use_pinyin=False)
    assert wave.ndim == 1 and len(wave) > 0
    assert np.isfinite(wave).all()


def test_vocode_slice_matches_full_decode(tiny_wrapper):
    """generate() only vocodes [ref_frames - margin :) of the mel; the kept
    gen-region samples must match a full-sequence decode (the margin covers the
    decoder's receptive field, `wrapper.py VOCODE_MARGIN_FRAMES`)."""
    import jax
    import jax.numpy as jnp

    from eraxvif5tts_tpu.infer.wrapper import VOCODE_MARGIN_FRAMES

    w = tiny_wrapper
    n, hop = 128, w.hop_length
    mel = jax.random.normal(jax.random.key(0), (1, n, 100)) * 0.5
    decode = jax.jit(
        lambda m: w.vocoder.apply({"params": w.vocoder_params}, m.swapaxes(1, 2))
    )
    full = np.asarray(decode(mel))
    ref_frames = 64
    vstart = ref_frames - VOCODE_MARGIN_FRAMES
    sliced = np.asarray(decode(mel[:, vstart:]))
    keep_full = full[0, ref_frames * hop :]
    keep_sliced = sliced[0, (ref_frames - vstart) * hop :]
    assert keep_full.shape == keep_sliced.shape
    scale = np.abs(keep_full).max() + 1e-9
    np.testing.assert_allclose(keep_sliced / scale, keep_full / scale, atol=2e-5)


def test_generate_with_long_reference_uses_slice_path(tiny_wrapper):
    """A reference longer than the vocode margin exercises vocode_start > 0."""
    w = tiny_wrapper
    t = np.arange(int(SR * 0.8)) / SR  # ~75 frames > 48-frame margin
    ref_wav = (0.2 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    w.preprocess_reference(ref_audio=ref_wav, ref_sample_rate=SR,
                           ref_text="a slightly longer reference text")
    assert w.ref.n_frames > 48
    wave = w.generate("short test.", nfe_step=2, seed=3, return_numpy=True,
                      use_pinyin=False)
    assert wave.ndim == 1 and len(wave) > 0 and np.isfinite(wave).all()


def test_wrapper_bigvgan_vocoder_end_to_end():
    """vocoder_name="bigvgan" swaps the native BigVGAN generator in AND flips
    the mel frontend to the bigvgan variant (reference `f5tts_wrapper.py:91,152`
    sets mel_spec_type from vocoder_name)."""
    from eraxvif5tts_tpu.models.bigvgan import BigVGANConfig

    cfg = ModelConfig(
        name="tiny-bv",
        arch=ArchConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2,
                        text_dim=32, conv_layers=1, dropout=0.0),
        mel_spec=MelSpecConfig(),
    )
    vocab = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.,!?")}
    w = F5TTSWrapper(model_cfg=cfg, vocab_char_map=vocab, nfe_step=2,
                     vocoder_name="bigvgan",
                     vocoder_config=BigVGANConfig(upsample_initial_channel=64),
                     duration_buckets=(64, 128), text_buckets=(64, 128))
    assert w.mel_spec_type == "bigvgan"
    assert w.config.mel_spec.mel_spec_type == "bigvgan"
    w.preprocess_reference(ref_audio=_make_ref_audio(), ref_sample_rate=SR,
                           ref_text="hello there")
    wave = w.generate("bigvgan decode test.", nfe_step=2, seed=0,
                      return_numpy=True, use_pinyin=False)
    assert wave.ndim == 1 and len(wave) > 0
    assert np.isfinite(wave).all()
    with pytest.raises(ValueError, match="vocoder_name"):
        F5TTSWrapper(model_cfg=cfg, vocab_char_map=vocab, vocoder_name="hifigan")


def test_wrapper_warmup_compiles_bucket_ladder(tiny_wrapper):
    """warmup() pre-compiles every reachable (duration, text) bucket program and
    a subsequent generate() reuses them (no cold compile on the request path)."""
    w = tiny_wrapper
    ref = w.preprocess_reference(ref_audio=_make_ref_audio(), ref_sample_rate=SR,
                                 ref_text="hello there")
    warmed = w.warmup(ref, nfe_step=2)
    assert {b for b, _ in warmed} == {64, 128}
    assert all(tb in w.text_buckets for _, tb in warmed)
    # the warmed text-bucket range covers what generate() actually picks for
    # a short chunk AND a max_chars-sized chunk (derived via the pinyin token
    # count, not the old byte heuristic)
    from eraxvif5tts_tpu.text.pinyin import convert_char_to_pinyin

    max_chars, _ = w._max_chars_for(ref)
    warmed_tb = {tb for _, tb in warmed}
    for chunk in ("after warmup.", "x" * max_chars):
        expect = pick_bucket(len(convert_char_to_pinyin([ref.text + chunk])[0]),
                             w.text_buckets)
        assert expect in warmed_tb
    wave = w.generate("after warmup.", ref=ref, nfe_step=2, seed=0,
                      return_numpy=True, use_pinyin=False)
    assert len(wave) > 0 and np.isfinite(wave).all()


def test_warmup_skips_only_unreachable_buckets():
    """A long reference makes small buckets unreachable exactly below
    pick_bucket(ref_frames + 1) — the old `+ 8` slop could skip a bucket
    generate() still picks."""
    cfg = ModelConfig(
        name="tiny",
        arch=ArchConfig(dim=64, depth=1, heads=2, dim_head=32, ff_mult=2,
                        text_dim=32, conv_layers=1, dropout=0.0),
        mel_spec=MelSpecConfig(),
    )
    vocab = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.,!?")}
    w = F5TTSWrapper(model_cfg=cfg, vocab_char_map=vocab, nfe_step=2,
                     duration_buckets=(64, 128), text_buckets=(64,))
    t = np.arange(int(SR * 0.60)) / SR  # ~60 frames incl. pad: 64 still reachable
    ref = w.preprocess_reference(
        ref_audio=(0.2 * np.sin(2 * np.pi * 180 * t)).astype(np.float32),
        ref_sample_rate=SR, ref_text="hello there", clip_short=False)
    assert ref.n_frames + 1 <= 64 < ref.n_frames + 8  # the old rule's blind spot
    warmed = w.warmup(ref, nfe_step=2, text_buckets=(64,))
    assert {b for b, _ in warmed} == {64, 128}


def test_preprocess_reference_auto_transcribes_empty_ref_text(tiny_wrapper):
    """Empty ref_text routes through the cached transcribe path (reference
    `f5tts_wrapper.py:313-315`) — injected fake backend, md5 cache hit."""
    calls = []

    def fake_asr(path):
        calls.append(path)
        return "transcribed words"

    w = tiny_wrapper
    audio = _make_ref_audio()
    ref = w.preprocess_reference(ref_audio=audio, ref_sample_rate=SR,
                                 ref_text="", transcribe_fn=fake_asr)
    assert ref.text == "transcribed words. "
    assert len(calls) == 1
    # same clip again: served from the md5 cache, no second ASR call
    ref2 = w.preprocess_reference(ref_audio=audio, ref_sample_rate=SR,
                                  ref_text="  ", transcribe_fn=fake_asr)
    assert ref2.text == "transcribed words. " and len(calls) == 1


def test_preprocess_reference_empty_ref_text_no_backend_raises(tiny_wrapper):
    """No ASR backend -> loud, actionable error instead of silently serving
    zero reference bytes."""
    def broken_asr(path):
        raise ImportError("no whisper weights on this host")

    with pytest.raises(RuntimeError, match="pass ref_text explicitly"):
        tiny_wrapper.preprocess_reference(
            ref_audio=_make_ref_audio() * 0.7, ref_sample_rate=SR,
            ref_text="", transcribe_fn=broken_asr)


def test_byte_ratio_duration_rejects_empty_ref_text():
    with pytest.raises(ValueError, match="non-empty ref_text"):
        byte_ratio_duration(100, "", "some generated text", 1.0)
