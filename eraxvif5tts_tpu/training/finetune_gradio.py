"""Gradio finetuning UI (reference `src/f5_tts/train/finetune_gradio.py`, 2162 LoC).

All the real work lives in UI-agnostic library modules — `training/project.py`
(transcription, vocab check/extend, prune-to-EMA, subprocess management, system
stats), `training/prepare.py` (metadata -> arrow/duration/vocab) and
`compression/pruner.py`. This module is the thin gradio shell over them; gradio is
optional.
"""

from __future__ import annotations

import json

from eraxvif5tts_tpu.training.prepare import prepare_csv_wavs
from eraxvif5tts_tpu.training.project import (
    TrainingProcess,
    prune_checkpoint_to_ema,
    system_stats,
    transcribe_directory,
    vocab_check,
    vocab_extend,
)


def build_app():
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "gradio is not installed; use the library functions in "
            "eraxvif5tts_tpu.training.project / .prepare, or the CLIs "
            "(eraxvif5tts-train / eraxvif5tts-finetune)"
        ) from e

    proc = TrainingProcess()

    with gr.Blocks(title="EraXviF5TTS-TPU finetuning") as app:
        gr.Markdown("# EraXviF5TTS-TPU — finetuning project manager")
        with gr.Tab("Transcribe"):
            wav_dir = gr.Textbox(label="Wav directory")
            out_csv = gr.Textbox(label="Output metadata.csv", value="metadata.csv")
            lang = gr.Textbox(label="Language (e.g. vi)", value="vi")
            result = gr.Textbox(label="Result")
            gr.Button("Transcribe").click(
                lambda d, o, l: f"transcribed {transcribe_directory(d, o, l)} files",
                [wav_dir, out_csv, lang], result,
            )
        with gr.Tab("Prepare dataset"):
            in_dir = gr.Textbox(label="Input dir (metadata.csv + wavs)")
            out_dir = gr.Textbox(label="Output dir")
            res2 = gr.Textbox(label="Summary")
            gr.Button("Prepare").click(
                lambda i, o: json.dumps(prepare_csv_wavs(i, o)), [in_dir, out_dir], res2
            )
        with gr.Tab("Vocab"):
            meta = gr.Textbox(label="metadata.csv")
            vocab = gr.Textbox(label="vocab.txt")
            missing_box = gr.Textbox(label="Missing tokens")
            gr.Button("Check").click(
                lambda m, v: " ".join(vocab_check(m, v)), [meta, vocab], missing_box
            )
            ckpt_in = gr.Textbox(label="Checkpoint to expand (optional)")
            ckpt_out = gr.Textbox(label="Expanded checkpoint output")
            res3 = gr.Textbox(label="Result")
            gr.Button("Extend").click(
                lambda m, v, ci, co: f"new vocab size {vocab_extend(v, vocab_check(m, v), ci or None, co or None)}",
                [meta, vocab, ckpt_in, ckpt_out], res3,
            )
        with gr.Tab("Checkpoint tools"):
            src = gr.Textbox(label="Training checkpoint (.pt)")
            dst = gr.Textbox(label="EMA-only output (.safetensors)")
            res4 = gr.Textbox(label="Result")
            gr.Button("Prune to EMA").click(
                lambda s, d: f"kept {prune_checkpoint_to_ema(s, d)} tensors", [src, dst], res4
            )
        with gr.Tab("Train"):
            train_args = gr.Textbox(label="CLI args",
                                    value="finetune --dataset_name my_dataset")
            status = gr.Textbox(label="Status")
            gr.Button("Start").click(
                lambda a: f"started pid {proc.start(a.split())}", [train_args], status
            )
            gr.Button("Stop").click(lambda: f"stopped: {proc.stop()}", [], status)
            gr.Button("Stats").click(lambda: json.dumps(system_stats()), [], status)
    return app


def main():
    build_app().launch()


if __name__ == "__main__":
    main()
