"""Dataset preparation + project-management tests."""

import json
import os

import numpy as np
import pytest

from eraxvif5tts_tpu.audio.io import write_wav
from eraxvif5tts_tpu.training.dataset import load_dataset
from eraxvif5tts_tpu.training.prepare import (
    build_vocab,
    prepare_csv_wavs,
    repetition_found,
    wav_duration_seconds,
)
from eraxvif5tts_tpu.training.project import (
    prune_checkpoint_to_ema,
    system_stats,
    vocab_check,
    vocab_extend,
)

SR = 24000


@pytest.fixture()
def dataset_dir(tmp_path):
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rows = []
    for i, text in enumerate(["xin chao", "toi la robot", "hello world"]):
        dur = 0.5 + 0.25 * i
        wav = 0.1 * np.sin(np.linspace(0, 100, int(SR * dur))).astype(np.float32)
        path = str(wav_dir / f"{i}.wav")
        write_wav(path, wav, SR)
        rows.append(f"{path}|{text}")
    # one too-short sample to be filtered
    short = str(wav_dir / "short.wav")
    write_wav(short, np.zeros(int(SR * 0.1), np.float32), SR)
    rows.append(f"{short}|too short")
    (tmp_path / "metadata.csv").write_text("\n".join(rows) + "\n", encoding="utf-8")
    return tmp_path


def test_prepare_csv_wavs_outputs(dataset_dir, tmp_path):
    out = tmp_path / "out"
    summary = prepare_csv_wavs(str(dataset_dir), str(out), use_pinyin=False)
    assert summary["samples"] == 3 and summary["skipped"] == 1
    assert os.path.isfile(out / "duration.json")
    assert os.path.isfile(out / "vocab.txt")
    durations = json.load(open(out / "duration.json"))["duration"]
    assert len(durations) == 3
    vocab_lines = (out / "vocab.txt").read_text(encoding="utf-8").splitlines()
    assert vocab_lines[0] == " "  # leading space token

    # loadable by the dataset pipeline
    ds = load_dataset(str(out.name), dataset_type="CustomDataset",
                      data_dir=str(out.parent))
    assert len(ds) == 3
    assert ds.frame_length(0) > 0
    sample = ds[0]
    assert sample.audio_path and sample.text == "xin chao"


def test_repetition_found():
    assert repetition_found("ababababababababababababab", length=2, tolerance=10)
    assert not repetition_found("a normal sentence with words", length=2, tolerance=10)


def test_build_vocab_space_first():
    vocab = build_vocab([["b", "a", " "], ["c"]])
    assert vocab[0] == " " and vocab[1:] == ["a", "b", "c"]


def test_vocab_check_and_extend(dataset_dir, tmp_path):
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text(" \nx\ni\nn\nc\nh\na\no\n", encoding="utf-8")
    missing = vocab_check(str(dataset_dir / "metadata.csv"), str(vocab_file),
                          use_pinyin=False)
    assert "t" in missing and "w" in missing
    new_size = vocab_extend(str(vocab_file), missing)
    assert new_size == 8 + len(missing)
    again = vocab_check(str(dataset_dir / "metadata.csv"), str(vocab_file),
                        use_pinyin=False)
    assert again == []


def test_prune_to_ema(tmp_path):
    import torch

    sd = {
        "ema_model.transformer.proj_out.weight": torch.ones(2, 2),
        "ema_model.transformer.proj_out.bias": torch.zeros(2),
        "initted": torch.tensor(True),
        "step": torch.tensor(5),
    }
    src = str(tmp_path / "full.pt")
    torch.save({"ema_model_state_dict": sd}, src)
    out = str(tmp_path / "ema.safetensors")
    n = prune_checkpoint_to_ema(src, out)
    assert n == 2
    from safetensors.numpy import load_file

    kept = load_file(out)
    assert set(kept) == {"transformer.proj_out.weight", "transformer.proj_out.bias"}


def test_system_stats():
    stats = system_stats()
    assert "loadavg" in stats or "devices" in stats


def test_prepare_libritts_layout(tmp_path):
    """LibriTTS tree ({subset}/{speaker}/{chapter}/*.wav + .normalized.txt)
    -> arrow/duration/vocab triple, length filters applied."""
    from eraxvif5tts_tpu.training.prepare_corpora import prepare_libritts

    chap = tmp_path / "corpus" / "train-clean-100" / "19" / "198"
    chap.mkdir(parents=True)
    for i, (text, dur) in enumerate([("hello there", 0.6), ("general", 0.8),
                                     ("too short", 0.1)]):
        wav = 0.1 * np.sin(np.linspace(0, 60, int(SR * dur))).astype(np.float32)
        write_wav(str(chap / f"u{i}.wav"), wav, SR)
        (chap / f"u{i}.normalized.txt").write_text(text, encoding="utf-8")
    # wav without transcript -> skipped
    write_wav(str(chap / "orphan.wav"), np.zeros(SR, np.float32), SR)

    out = tmp_path / "out"
    summary = prepare_libritts(str(tmp_path / "corpus"), str(out),
                               subsets=("train-clean-100",))
    assert summary["samples"] == 2
    assert os.path.isfile(out / "duration.json") and os.path.isfile(out / "vocab.txt")
    ds = load_dataset(out.name, dataset_type="CustomDataset", data_dir=str(out.parent))
    assert len(ds) == 2
    assert {ds[0].text, ds[1].text} == {"hello there", "general"}


def test_prepare_emilia_filters(tmp_path):
    """Emilia jsonl rows: script filters + repetition_found + duration window
    (reference prepare_emilia.py:114-140)."""
    from eraxvif5tts_tpu.training.prepare_corpora import prepare_emilia

    zh = tmp_path / "corpus" / "ZH"
    zh.mkdir(parents=True)
    rows = [
        {"wav": "a.wav", "text": "你好世界", "duration": 2.0},          # kept
        {"wav": "b.wav", "text": "日本語がい混入", "duration": 2.0},     # filtered: い
        {"wav": "c.wav", "text": "好好好好好好好好好好好好好好", "duration": 2.0},  # repetition
        {"wav": "d.wav", "text": "太长", "duration": 99.0},             # too long
    ]
    (zh / "meta.jsonl").write_text(
        "\n".join(json.dumps(r, ensure_ascii=False) for r in rows), encoding="utf-8")

    out = tmp_path / "out"
    summary = prepare_emilia(str(tmp_path / "corpus"), str(out), languages=("ZH",))
    assert summary["samples"] == 1
    vocab = set((out / "vocab.txt").read_text(encoding="utf-8").splitlines())
    # tokenized through convert_char_to_pinyin (pinyin syllables, or raw chars
    # under the offline char fallback) — either way the kept row's chars survive
    assert any(v.startswith("ni") for v in vocab) or "你" in vocab
    assert not any("い" in v for v in vocab)  # filtered row contributed nothing


def test_prepare_phonemes_jsonl(tmp_path):
    """Parity with reference preprocess_phoneme.py: last |-field is the text,
    first is the audio path; tail fixups; <2-phoneme lines skipped."""
    import json

    from eraxvif5tts_tpu.training.prepare import prepare_phonemes

    meta = tmp_path / "metadata.csv"
    meta.write_text(
        "a.wav|xin chao the gioi\n"
        "b.wav|speaker1|mot cau khac .\n"
        "c.wav|x\n",  # 1 phoneme after fixups -> skipped
        encoding="utf-8",
    )
    out = tmp_path / "phonemes.jsonl"
    summary = prepare_phonemes(str(meta), str(out), normalize_fn=lambda s: s.upper())
    assert summary["written"] == 2 and summary["skipped"] == 1
    rows = [json.loads(l) for l in out.read_text(encoding="utf-8").splitlines()]
    assert rows[0]["audio"] == "a.wav"
    assert rows[0]["text"] == "XIN CHAO THE GIOI"  # normalize_fn applied
    assert rows[1]["audio"] == "b.wav"
    # char-fallback phonemizer: trailing bare "." dropped (reference fixup)
    assert rows[1]["phonemes"][-1] != "."
    assert all(len(r["phonemes"]) >= 2 for r in rows)
