"""Frontend golden tests: STFT/mel vs an independent numpy reference, tokenizer quirks,
chunking (SURVEY.md §4 test pyramid, level 1)."""

import numpy as np
import pytest

import jax.numpy as jnp

from eraxvif5tts_tpu.ops.mel import mel_filterbank
from eraxvif5tts_tpu.ops.stft import MelSpectrogram, hann_window, istft, stft_magnitude
from eraxvif5tts_tpu.text.chunk import chunk_text
from eraxvif5tts_tpu.text.tokenizer import get_tokenizer, list_str_to_bytes, list_str_to_idx


# ---------------------------------------------------------------------------
# Independent numpy STFT reference (np.fft based, not the conv formulation)


def np_stft_mag(wav, n_fft, hop, win_length, center, pad=0, eps=0.0):
    window = hann_window(win_length, dtype=np.float64)
    if center:
        wav = np.pad(wav, (n_fft // 2, n_fft // 2), mode="reflect")
    elif pad:
        wav = np.pad(wav, (pad, pad), mode="reflect")
    n_frames = (len(wav) - n_fft) // hop + 1
    frames = np.stack([wav[i * hop : i * hop + n_fft] for i in range(n_frames)])
    spec = np.fft.rfft(frames * window, axis=-1)
    return np.sqrt(np.abs(spec).astype(np.float64) ** 2 + eps).T  # [n_bins, n_frames]


def test_stft_magnitude_matches_numpy_fft_center():
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(24000 // 4).astype(np.float32)
    got = np.asarray(stft_magnitude(jnp.asarray(wav[None]), 1024, 256, 1024, center=True))[0]
    want = np_stft_mag(wav, 1024, 256, 1024, center=True)
    assert got.shape == want.shape == (513, len(wav) // 256 + 1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_stft_magnitude_bigvgan_padding():
    rng = np.random.default_rng(1)
    wav = rng.standard_normal(4096).astype(np.float32)
    got = np.asarray(
        stft_magnitude(jnp.asarray(wav[None]), 1024, 256, 1024, center=False, pad=384,
                       magnitude_eps=1e-9)
    )[0]
    want = np_stft_mag(wav, 1024, 256, 1024, center=False, pad=384, eps=1e-9)
    assert got.shape == want.shape == (513, 4096 // 256)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_mel_filterbank_htk_properties():
    fb = mel_filterbank(24000, 1024, 100, variant="htk")
    assert fb.shape == (100, 513)
    assert fb.min() >= 0.0
    # HTK, norm=None: wide (high-frequency) filters peak near 1.0; narrow low-frequency
    # filters can fall between FFT bins and peak lower.
    assert fb[50:].max(axis=1).min() > 0.5
    assert fb.max() <= 1.0 + 1e-6
    # Triangle centers non-decreasing (low-frequency filters are ~1 bin wide and can tie)
    centers = fb.argmax(axis=1)
    assert np.all(np.diff(centers) >= 0)
    assert centers[-1] > centers[0]


def test_mel_filterbank_slaney_normalization():
    fb = mel_filterbank(24000, 1024, 100, variant="slaney")
    # Slaney norm: filter areas (vs Hz) roughly equal; peak values much less than 1
    assert fb.max() < 0.1
    # Low-frequency filters linear-spaced: first few centers nearly evenly spaced
    centers = fb.argmax(axis=1)
    diffs = np.diff(centers[:10])
    assert diffs.max() - diffs.min() <= 2


def test_melspec_shapes_and_log_clamp():
    mel = MelSpectrogram()
    wav = jnp.zeros((2, 24000))
    out = np.asarray(mel(wav))
    assert out.shape == (2, 100, 24000 // 256 + 1)
    # log(clamp(0, 1e-5)) == log(1e-5)
    np.testing.assert_allclose(out, np.log(1e-5), rtol=1e-5)


def test_melspec_matches_numpy_pipeline():
    rng = np.random.default_rng(2)
    wav = rng.standard_normal(6000).astype(np.float32) * 0.1
    mel = MelSpectrogram()
    got = np.asarray(mel(jnp.asarray(wav[None])))[0]
    mag = np_stft_mag(wav, 1024, 256, 1024, center=True)
    fb = mel_filterbank(24000, 1024, 100, variant="htk").astype(np.float64)
    want = np.log(np.clip(fb @ mag, 1e-5, None))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_istft_roundtrip():
    """ISTFT(STFT(x)) == x away from the edges (COLA holds for hann, hop=n_fft/4)."""
    rng = np.random.default_rng(3)
    wav = rng.standard_normal(4096).astype(np.float32)
    window = hann_window(1024, dtype=np.float64)
    padded = np.pad(wav, (512, 512), mode="reflect")
    n_frames = (len(padded) - 1024) // 256 + 1
    frames = np.stack([padded[i * 256 : i * 256 + 1024] for i in range(n_frames)])
    spec = np.fft.rfft(frames * window, axis=-1).T  # [bins, frames]
    out = np.asarray(
        istft(
            jnp.asarray(np.real(spec), dtype=jnp.float32)[None],
            jnp.asarray(np.imag(spec), dtype=jnp.float32)[None],
            1024, 256, 1024, center=True,
        )
    )[0]
    assert out.shape == (4096,)
    np.testing.assert_allclose(out[512:-512], wav[512:-512], rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# Tokenizer


def test_vocab_leading_space_and_dedup(tmp_path):
    vocab = tmp_path / "vocab.txt"
    vocab.write_text(" \na\nb\n a \nc\n", encoding="utf-8")
    char_map, size = get_tokenizer(str(vocab), "custom")
    # line 0 " " kept as space token; line 3 " a " strips to "a" (duplicate, ignored)
    assert char_map == {" ": 0, "a": 1, "b": 2, "c": 3}
    assert size == 4


def test_list_str_to_idx_padding_and_unknown(tmp_path):
    vocab = tmp_path / "vocab.txt"
    vocab.write_text(" \nx\ny\n", encoding="utf-8")
    char_map, _ = get_tokenizer(str(vocab), "custom")
    ids = list_str_to_idx(["xy", "x!"], char_map)
    np.testing.assert_array_equal(ids, [[1, 2], [1, 0]])  # '!' unknown -> 0
    ids = list_str_to_idx([["x", "y", " "], ["y"]], char_map)
    np.testing.assert_array_equal(ids, [[1, 2, 0], [2, -1, -1]])
    ids = list_str_to_idx(["x"], char_map, pad_to=5)
    assert ids.shape == (1, 5) and ids[0, 0] == 1 and ids[0, -1] == -1


def test_list_str_to_bytes():
    ids = list_str_to_bytes(["ab", "a"])
    np.testing.assert_array_equal(ids, [[97, 98], [97, -1]])


# ---------------------------------------------------------------------------
# chunk_text


def test_chunk_text_packs_sentences():
    text = "Hello there. This is a test. Short. " * 3
    chunks = chunk_text(text, max_chars=40)
    assert all(len(c.encode("utf-8")) <= 45 for c in chunks)
    rebuilt = " ".join(chunks)
    for sentence in ["Hello there.", "This is a test.", "Short."]:
        assert sentence in rebuilt


def test_chunk_text_single_short():
    assert chunk_text("xin chào", max_chars=135) == ["xin chào"]


def test_chunk_text_cjk_punct():
    chunks = chunk_text("你好。我很好。", max_chars=9)
    assert chunks == ["你好。", "我很好。"]


def test_chunk_text_hard_splits_oversized_pieces():
    """A piece with no sentence punctuation that exceeds max_chars is split at
    whitespace, and an unbreakable overlong word at character boundaries, so
    every chunk fits the static text buckets (the reference's dynamic shapes
    never need this; erroring would be worse than an extra boundary)."""
    # unbreakable 300-char word -> ceil(300/40) chunks, nothing lost
    chunks = chunk_text("a" * 300, max_chars=40, hard_max=40)
    assert all(len(c.encode("utf-8")) <= 40 for c in chunks)
    assert "".join(chunks) == "a" * 300

    # long whitespace-only-separable run splits at word boundaries
    text = "word " * 30
    chunks = chunk_text(text.strip(), max_chars=24, hard_max=24)
    assert all(len(c.encode("utf-8")) <= 24 for c in chunks)
    assert " ".join(chunks).split() == text.split()

    # multibyte chars are never cut mid-codepoint
    chunks = chunk_text("你" * 50, max_chars=10, hard_max=10)
    assert all(len(c.encode("utf-8")) <= 10 for c in chunks)
    assert "".join(chunks) == "你" * 50

    # normal sentence-packed input is unchanged by the post-pass
    assert chunk_text("xin chao", max_chars=135, hard_max=135) == ["xin chao"]
    # without hard_max, reference semantics: oversized sentences stay whole
    assert chunk_text("a" * 300, max_chars=40) == ["a" * 300]
