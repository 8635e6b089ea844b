"""Drive the flagship F5TTSWrapper on TRAINED weights — API-level quality evidence.

Every wrapper RTF benchmark runs random weights (compute is weight-independent);
this script answers "does the FLAGSHIP API path produce speech-like output from
a trained checkpoint": `F5TTSWrapper(ckpt_path=<trained flagship>)` →
`preprocess_reference` on the reference repo's real Vietnamese recording →
`generate()` of its first sentence through the production bucket ladder
(chunking, byte-ratio duration rule, CFG-doubled Euler scan, crossfade).

No trained vocoder ships offline, so the scored output is the model's mel
(`return_spectrogram=True`), rendered audible via Griffin-Lim. Metric:
Pearson correlation of the long-term-average-spectrum (LTAS, time-mean log-mel)
between the generated region and the real recording — high iff the model
reproduces the voice's spectral envelope. The SAME path with a random-init
wrapper is the null; the recording's own two halves are the ceiling.

    python scripts/wrapper_trained.py --ckpt /tmp/trained_flagship.safetensors
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

VN_WAV = "/root/reference/src/infer/update_213000_ref.wav"
VN_TEXT = ("Thậm chí không ăn thì cũng có cảm giác rất là cứng bụng, chủ yếu "
           "là cái phần rốn trở lên. Em có cảm giác khó thở, và ngủ cũng "
           "không ngon, thường bị ợ hơi rất là nhiều")
GEN_TEXT = ("Thậm chí không ăn thì cũng có cảm giác rất là cứng bụng, chủ yếu "
            "là cái phần rốn trở lên.")


def ltas_corr(mel_a: np.ndarray, mel_b: np.ndarray) -> float:
    """Pearson corr of time-averaged log-mel spectra. mel_*: [n_mels, t]."""
    a, b = mel_a.mean(axis=1), mel_b.mean(axis=1)
    a, b = a - a.mean(), b - b.mean()
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/trained_flagship.safetensors")
    ap.add_argument("--out-dir", default="benchmarks/artifacts/wrapper_trained")
    ap.add_argument("--nfe", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from convergence_real import CORPUS

    from eraxvif5tts_tpu.audio.griffin_lim import griffin_lim_mel
    from eraxvif5tts_tpu.audio.io import write_wav
    from eraxvif5tts_tpu.infer.wrapper import F5TTSWrapper

    chars = sorted({c for _, text in CORPUS for c in text})
    vocab = {c: i for i, c in enumerate(chars)}

    os.makedirs(args.out_dir, exist_ok=True)
    report = {}
    for tag, ckpt in (("trained", args.ckpt), ("random_null", None)):
        wrapper = F5TTSWrapper(
            model_name="F5TTS_v1_Base", ckpt_path=ckpt, vocab_char_map=vocab,
            compute_dtype="bfloat16", nfe_step=args.nfe,
        )
        ref = wrapper.preprocess_reference(VN_WAV, VN_TEXT)
        t0 = time.time()
        wav, mel = wrapper.generate(  # mel [n_mels, gen_frames]
            GEN_TEXT, seed=11, use_pinyin=False,
            return_numpy=True, return_spectrogram=True,
        )
        wall = time.time() - t0
        ref_mel = np.asarray(ref.mel)[0].T  # [n_mels, ref_frames]
        row = {
            "gen_frames": int(mel.shape[1]),
            "gen_seconds": round(mel.shape[1] * 256 / 24000, 2),
            "wall_s_first_call": round(wall, 1),
            "ltas_corr_vs_recording": round(ltas_corr(mel, ref_mel), 4),
            "mel_mean": round(float(mel.mean()), 3),
        }
        base = os.path.join(args.out_dir, f"gen_{tag}")
        np.save(base + ".npy", mel)
        gl = griffin_lim_mel(mel.astype(np.float32), n_iter=48, hop_length=256,
                             sample_rate=24000)
        write_wav(base + ".wav", gl, 24000)
        row["wav"] = base + ".wav"
        report[tag] = row
        print(json.dumps({tag: row}), flush=True)

    half = ref_mel.shape[1] // 2
    report["ceiling_recording_halves"] = round(
        ltas_corr(ref_mel[:, :half], ref_mel[:, half:]), 4)
    report["ref_frames"] = int(ref_mel.shape[1])
    report["gen_text"] = GEN_TEXT
    with open(os.path.join(args.out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({
        "metric": "wrapper_trained_ltas_corr",
        "value": report["trained"]["ltas_corr_vs_recording"],
        "null": report["random_null"]["ltas_corr_vs_recording"],
        "ceiling": report["ceiling_recording_halves"],
        "artifact": os.path.join(args.out_dir, "report.json"),
    }))


if __name__ == "__main__":
    main()
