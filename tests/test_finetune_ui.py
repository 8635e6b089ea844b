"""Headless drive of every finetune-UI callback (`training/finetune_gradio.py`
ui_* functions over `training/project.py`), covering the reference app's tab
surface (`src/f5_tts/train/finetune_gradio.py:61-1644`) without gradio."""

import json
import os
import time

import numpy as np
import pytest

from eraxvif5tts_tpu.audio.io import write_wav
from eraxvif5tts_tpu.training import finetune_gradio as ui
from eraxvif5tts_tpu.training.project import (
    DEFAULT_SETTINGS,
    ProjectStore,
    TrainingProcess,
    calculate_train,
    random_metadata_sample,
    settings_to_cli_args,
    vocab_count,
)

SR = 24000


@pytest.fixture()
def store(tmp_path):
    return ProjectStore(str(tmp_path / "data"))


@pytest.fixture()
def project(store):
    """A created project with wavs + transcribed metadata."""
    _, name = ui.ui_create_project(store, "demo", "char")
    wav_dir = os.path.join(store.path(name), "wavs")
    for i, dur in enumerate((0.5, 0.8, 1.1)):
        wav = 0.1 * np.sin(np.linspace(0, 80, int(SR * dur))).astype(np.float32)
        write_wav(os.path.join(wav_dir, f"{i}.wav"), wav, SR)
    texts = iter(["xin chao", "toi la robot", "hello world"])
    ui.ui_transcribe(store, name, "", "vi", asr_fn=lambda p: next(texts))
    return name


def test_create_and_list_projects(store):
    projects, name = ui.ui_create_project(store, "alpha", "pinyin")
    assert name == "alpha_pinyin" and projects == ["alpha_pinyin"]
    assert os.path.isdir(os.path.join(store.path(name), "dataset"))
    with pytest.raises(ValueError):
        ui.ui_create_project(store, "   ", "pinyin")


def test_transcribe_and_random_sample(store, project):
    meta = os.path.join(store.path(project), "dataset", "metadata.csv")
    lines = open(meta, encoding="utf-8").read().splitlines()
    assert len(lines) == 3 and all("|" in l for l in lines)
    text, audio = ui.ui_random_sample(store, project, seed=0)
    assert text in ("xin chao", "toi la robot", "hello world")
    assert audio and os.path.isfile(audio)
    # empty metadata -> graceful empty
    assert random_metadata_sample(os.path.join(store.root, "nope.csv")) == ("", None)


def test_vocab_check_and_extend_roundtrip(store, project):
    proj = store.path(project)
    with open(os.path.join(proj, "vocab.txt"), "w", encoding="utf-8") as f:
        f.write(" \nx\ni\nn\nc\nh\na\no\n")
    missing, status = ui.ui_vocab_check(store, project)
    assert "t" in missing.split() and "missing" in status
    out = ui.ui_vocab_extend(store, project, missing, "", "")
    assert "vocab now" in out
    missing2, status2 = ui.ui_vocab_check(store, project)
    assert missing2 == "" and "covers" in status2
    assert vocab_count("a b  c") == 3


def test_prepare_then_auto_settings(store, project):
    summary = json.loads(ui.ui_prepare(store, project))
    assert summary["samples"] == 3
    assert os.path.isfile(os.path.join(store.path(project), "duration.json"))

    merged = ui.ui_calculate_train(store, project, dict(DEFAULT_SETTINGS))
    assert merged["epochs"] >= 1
    assert merged["batch_size_per_gpu"] > 0
    assert merged["learning_rate"] == 1e-5  # finetune default
    scratch = ui.ui_calculate_train(
        store, project, {**DEFAULT_SETTINGS, "finetune": False})
    assert scratch["learning_rate"] == pytest.approx(7.5e-5)
    # sample-type batching path
    suggested = calculate_train(
        os.path.join(store.path(project), "duration.json"),
        batch_size_type="sample")
    assert suggested["batch_size_per_gpu"] >= 1
    with pytest.raises(FileNotFoundError):
        calculate_train(os.path.join(store.root, "missing.json"))


def test_settings_save_load_roundtrip(store, project):
    values = list(ui.ui_load_settings(store, project))  # defaults
    idx = ui.SETTING_FIELDS.index("learning_rate")
    values[idx] = "3e-05"  # gradio hands strings back
    ep = ui.SETTING_FIELDS.index("epochs")
    values[ep] = "7"
    msg = ui.ui_save_settings(store, project, *values)
    assert "saved" in msg
    loaded = ui.ui_load_settings(store, project)
    assert loaded[idx] == pytest.approx(3e-5)
    assert loaded[ep] == 7 and isinstance(loaded[ep], int)
    # unknown keys rejected by the store
    with pytest.raises(ValueError):
        store.save_settings(project, {"not_a_setting": 1})


def test_settings_to_cli_args_bridge(store, project):
    s = {**DEFAULT_SETTINGS, "finetune": False, "epochs": 3,
         "file_checkpoint_train": "/tmp/ck.pt"}
    args = settings_to_cli_args(project, s, store.root)
    assert args[0] == "finetune"
    assert "--from-scratch" in args
    assert args[args.index("--pretrain") + 1] == "/tmp/ck.pt"
    assert args[args.index("--epochs") + 1] == "3"
    assert args[args.index("--dataset_name") + 1] == project


def test_training_lifecycle_and_log_tail(store, project, monkeypatch):
    """Start/stop via a stubbed TrainingProcess; log tail reads train.log."""
    launched = {}

    class FakeProc(TrainingProcess):
        def start(self, args, log_path="train.log"):
            launched["args"] = args
            launched["log"] = log_path
            with open(log_path, "w") as f:
                f.write("step 1 loss 3.14\nstep 2 loss 2.71\n")
            return 4242

        @property
        def running(self):
            return False

    proc = FakeProc()
    values = ui.ui_load_settings(store, project)
    msg = ui.ui_start_training(store, proc, project, *values)
    assert "4242" in msg
    assert launched["args"][0] == "finetune"
    assert launched["log"] == os.path.join(store.path(project), "train.log")
    # settings were persisted by start
    assert os.path.isfile(os.path.join(store.path(project), "setting.json"))
    tail = ui.ui_tail_log(store, project)
    assert "loss 2.71" in tail
    assert ui.ui_stop_training(proc) == "not running"


def test_training_process_real_subprocess(tmp_path):
    """The real TrainingProcess against a trivially-exiting module run."""
    proc = TrainingProcess()
    log = str(tmp_path / "t.log")
    pid = proc.start(["--help"], log_path=log)
    assert pid > 0
    # generous bound: `--help` still pays the package import (~12 s on this
    # 1-core box, more under a concurrent pytest/compile)
    for _ in range(600):
        if not proc.running:
            break
        time.sleep(0.1)
    assert not proc.running
    assert ui.ui_stop_training(proc) == "not running"


def test_checkpoint_listing_order(store, project):
    d = store.ckpt_dir(project)
    os.makedirs(d)
    for name in ("model_500.pt", "model_1000.pt", "model_last.pt",
                 "pretrained_base.pt", "model_500.pt.meta.json"):
        open(os.path.join(d, name), "w").close()
    got = [os.path.basename(p) for p in ui.ui_list_checkpoints(store, project)]
    assert got == ["pretrained_base.pt", "model_500.pt", "model_1000.pt",
                   "model_last.pt"]
    assert ui.ui_list_checkpoints(store, "missing_project") == []


def test_test_model_tab_infer(store, project, tmp_path):
    """Synthesis callback through an injected wrapper factory."""
    ref = str(tmp_path / "ref.wav")
    write_wav(ref, 0.05 * np.ones(SR // 2, np.float32), SR)

    class FakeTTS:
        target_sample_rate = SR  # the real F5TTSWrapper attribute name

        def preprocess_reference(self, audio, text):
            self.ref = (audio, text)

        def generate(self, text, nfe_step=32, speed=1.0):
            assert nfe_step == 8 and speed == pytest.approx(1.2)
            return np.zeros(SR, np.float32)

    sr, wav = ui.ui_test_infer(store, project, "ckpt.pt", ref, "hi", "xin chao",
                               nfe=8, speed=1.2,
                               wrapper_factory=lambda c, v: FakeTTS())
    assert sr == SR and wav.shape == (SR,)
    with pytest.raises(ValueError):
        ui.ui_test_infer(store, project, "", ref, "", "x")

    # per-save sample listing
    sdir = os.path.join(store.ckpt_dir(project), "samples")
    os.makedirs(sdir)
    write_wav(os.path.join(sdir, "update_100.wav"),
              np.zeros(100, np.float32), SR)
    assert [os.path.basename(p) for p in ui.ui_list_samples(store, project)] == [
        "update_100.wav"]


def test_prune_and_stats_callbacks(tmp_path):
    import torch

    sd = {"ema_model.transformer.x.weight": torch.ones(2, 2),
          "initted": torch.tensor(True)}
    src = str(tmp_path / "full.pt")
    torch.save({"ema_model_state_dict": sd}, src)
    out = ui.ui_prune(src, str(tmp_path / "ema.safetensors"))
    assert "kept 1 tensors" in out
    stats = json.loads(ui.ui_system_stats())
    assert isinstance(stats, dict) and stats
