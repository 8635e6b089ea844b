"""Finetuning project management: the library core behind the reference's Gradio
training UI (`src/f5_tts/train/finetune_gradio.py`, 2162 LoC of UI around these
operations). The functions are UI-agnostic; a thin gradio shim can wrap them when
gradio is installed.

Covered operations:
- batch transcription of a wav directory (`finetune_gradio.py:656`);
- metadata/arrow creation (`:765`) -> see `training/prepare.py`;
- vocab check + extension with embedding expansion (`:1020-1073`, `:1294`);
- checkpoint prune-to-EMA (`prune_checkpoint` `:994`): strip optimizer state, keep
  EMA weights only;
- training-process launch/stop via subprocess (`:363-631`);
- host/accelerator stats (`:1565-1644`).
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
from typing import Optional



def transcribe_directory(wav_dir: str, output_csv: str, language: Optional[str] = None,
                         asr_fn=None) -> int:
    """Whisper-transcribe every wav -> `metadata.csv` rows `path|text`."""
    if asr_fn is None:
        from eraxvif5tts_tpu.infer.utils_infer import transcribe

        asr_fn = lambda p: transcribe(p, language=language)  # noqa: E731
    n = 0
    with open(output_csv, "w", encoding="utf-8") as out:
        for name in sorted(os.listdir(wav_dir)):
            if not name.lower().endswith((".wav", ".flac")):
                continue
            path = os.path.join(wav_dir, name)
            text = asr_fn(path)
            out.write(f"{path}|{text}\n")
            n += 1
    return n


def vocab_check(metadata_csv: str, vocab_file: str, use_pinyin: bool = True) -> list[str]:
    """Tokens present in the dataset but missing from the vocab
    (`finetune_gradio.py:1294` ``vocab_check``)."""
    from eraxvif5tts_tpu.text.pinyin import convert_char_to_pinyin
    from eraxvif5tts_tpu.text.tokenizer import read_vocab

    vocab = read_vocab(vocab_file)
    missing: set[str] = set()
    with open(metadata_csv, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("|")
            if len(parts) < 2:
                continue
            tokens = convert_char_to_pinyin([parts[1]])[0] if use_pinyin else list(parts[1])
            missing.update(t for t in tokens if t not in vocab)
    return sorted(missing)


def vocab_extend(vocab_file: str, new_tokens: list[str], ckpt_path: Optional[str] = None,
                 output_ckpt: Optional[str] = None) -> int:
    """Append tokens to vocab.txt and expand the checkpoint's embedding table
    (`finetune_gradio.py:1020-1073`). Returns new vocab size."""
    from eraxvif5tts_tpu.text.tokenizer import read_vocab

    vocab = read_vocab(vocab_file)
    additions = [t for t in new_tokens if t and t not in vocab]
    if additions:
        with open(vocab_file, "a", encoding="utf-8") as f:
            for t in additions:
                f.write(t + "\n")
    new_size = len(vocab) + len(additions)

    if ckpt_path and output_ckpt:
        from eraxvif5tts_tpu.compression.convert import (
            load_state_dict,
            normalize_reference_state_dict,
        )
        from eraxvif5tts_tpu.compression.pruner import expand_text_embedding, save_state_dict

        sd = normalize_reference_state_dict(load_state_dict(ckpt_path))
        sd = expand_text_embedding(sd, new_size)
        save_state_dict(sd, output_ckpt)
    return new_size


def prune_checkpoint_to_ema(ckpt_path: str, output_path: str) -> int:
    """Strip optimizer/scheduler state, keep EMA weights only
    (`finetune_gradio.py:994` ``prune_checkpoint``). Returns tensor count."""
    from eraxvif5tts_tpu.compression.convert import (
        load_state_dict,
        normalize_reference_state_dict,
    )
    from eraxvif5tts_tpu.compression.pruner import save_state_dict

    sd = normalize_reference_state_dict(load_state_dict(ckpt_path), use_ema=True)
    save_state_dict(sd, output_path)
    return len(sd)


class TrainingProcess:
    """Launch/stop a training subprocess (`finetune_gradio.py:363-631`)."""

    def __init__(self):
        self.proc: Optional[subprocess.Popen] = None

    def start(self, args: list[str], log_path: str = "train.log") -> int:
        assert self.proc is None or self.proc.poll() is not None, "already running"
        log = open(log_path, "a")
        self.proc = subprocess.Popen(
            [sys.executable, "-m", "eraxvif5tts_tpu.training.cli", *args],
            stdout=log, stderr=subprocess.STDOUT,
        )
        return self.proc.pid

    def stop(self) -> bool:
        if self.proc is None or self.proc.poll() is not None:
            return False
        self.proc.send_signal(signal.SIGINT)
        try:
            self.proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            self.proc.kill()
        return True

    @property
    def running(self) -> bool:
        return self.proc is not None and self.proc.poll() is None


def system_stats() -> dict:
    """Host + accelerator utilization snapshot (`finetune_gradio.py:1565-1644`)."""
    stats: dict = {}
    try:
        la1, la5, la15 = os.getloadavg()
        stats["loadavg"] = [la1, la5, la15]
    except OSError:
        pass
    try:
        with open("/proc/meminfo") as f:
            mem = {l.split(":")[0]: l.split(":")[1].strip() for l in f}
        stats["mem_total"] = mem.get("MemTotal")
        stats["mem_available"] = mem.get("MemAvailable")
    except OSError:
        pass
    try:
        import jax

        stats["devices"] = [str(d) for d in jax.devices()]
        ms = jax.devices()[0].memory_stats() if hasattr(jax.devices()[0], "memory_stats") else None
        if ms:
            stats["device_memory"] = {k: int(v) for k, v in ms.items()
                                      if "bytes" in k}
    except Exception:
        pass
    return stats
