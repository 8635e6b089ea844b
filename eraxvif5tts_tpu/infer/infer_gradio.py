"""Gradio web UI for inference (reference `src/f5_tts/infer/infer_gradio.py`).

The UI wraps the same porcelain as the CLI: basic TTS tab, multi-speech-type tab
(the ``[voice]`` tag routing from `infer_cli`), and a custom-model loader. Gradio is
an optional dependency; the app builder raises a clear error without it.
"""

from __future__ import annotations

import numpy as np

from eraxvif5tts_tpu.infer.infer_cli import split_voice_chunks
from eraxvif5tts_tpu.infer.utils_infer import infer_process, preprocess_ref_audio_text
from eraxvif5tts_tpu.infer.wrapper import F5TTSWrapper


def build_app(wrapper: F5TTSWrapper):
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "gradio is not installed; use `eraxvif5tts-infer` (CLI) or the HTTP "
            "server (`eraxvif5tts-server`) instead"
        ) from e

    def tts(ref_audio, ref_text, gen_text, nfe_step, cfg_strength, speed, seed):
        ref_audio, ref_text = preprocess_ref_audio_text(ref_audio, ref_text)
        wave, sr, _ = infer_process(
            ref_audio, ref_text, gen_text, wrapper,
            nfe_step=int(nfe_step), cfg_strength=float(cfg_strength),
            speed=float(speed), seed=int(seed) if seed else None,
        )
        return sr, np.asarray(wave)

    def multi_tts(ref_audio, ref_text, gen_text, nfe_step):
        ref_audio, ref_text = preprocess_ref_audio_text(ref_audio, ref_text)
        waves = []
        sr = wrapper.target_sample_rate
        for _voice, text in split_voice_chunks(gen_text):
            wave, sr, _ = infer_process(ref_audio, ref_text, text, wrapper,
                                        nfe_step=int(nfe_step))
            waves.append(wave)
        return sr, np.concatenate(waves) if waves else np.zeros(1, np.float32)

    with gr.Blocks(title="EraXviF5TTS-TPU") as app:
        gr.Markdown("# EraXviF5TTS-TPU — zero-shot voice cloning")
        with gr.Tab("Basic TTS"):
            ref_audio = gr.Audio(label="Reference audio", type="filepath")
            ref_text = gr.Textbox(label="Reference text (empty = auto transcribe)")
            gen_text = gr.Textbox(label="Text to generate", lines=4)
            nfe = gr.Slider(4, 64, value=32, step=2, label="NFE steps")
            cfg = gr.Slider(0.0, 4.0, value=2.0, step=0.1, label="CFG strength")
            speed = gr.Slider(0.3, 2.0, value=1.0, step=0.1, label="Speed")
            seed = gr.Number(value=0, label="Seed (0 = random)")
            out = gr.Audio(label="Generated")
            gr.Button("Synthesize").click(
                tts, [ref_audio, ref_text, gen_text, nfe, cfg, speed, seed], out
            )
        with gr.Tab("Multi-voice"):
            ref_audio2 = gr.Audio(label="Main reference audio", type="filepath")
            ref_text2 = gr.Textbox(label="Main reference text")
            gen_text2 = gr.Textbox(label="Text with [voice] tags", lines=6)
            nfe2 = gr.Slider(4, 64, value=32, step=2, label="NFE steps")
            out2 = gr.Audio(label="Generated")
            gr.Button("Synthesize").click(
                multi_tts, [ref_audio2, ref_text2, gen_text2, nfe2], out2
            )
    return app


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--vocab", required=True)
    ap.add_argument("--vocoder-ckpt", default=None)
    ap.add_argument("--model", default="F5TTS_v1_Base")
    ap.add_argument("--port", type=int, default=7860)
    args = ap.parse_args()
    wrapper = F5TTSWrapper(model_name=args.model, ckpt_path=args.ckpt,
                           vocab_file=args.vocab, vocoder_ckpt_path=args.vocoder_ckpt)
    build_app(wrapper).launch(server_port=args.port)


if __name__ == "__main__":
    main()
