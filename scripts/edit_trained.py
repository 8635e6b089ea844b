"""Speech editing on TRAINED weights — the edit_mask production path, evaluated.

Reconstruction edit: take the reference repo's real Vietnamese recording, zero a
mid-utterance span, and ask `edit_speech` (the production `edit_mask` path of
`cfm.sample`) to regenerate it with the ORIGINAL transcript. A trained model
should reproduce speech close to the real recording inside the span while the
rest stays pinned as prompt. Metric: mel L1 inside the regenerated span vs the
recording (compare to the infill numbers of `scripts/synthesize_trained.py`,
same ~2.0 target magnitude scale), plus the outside-span L1 which must be ~0
(cond paste-back). Griffin-Lim renders the edited mel audible.

    python scripts/edit_trained.py --ckpt /tmp/trained_flagship.safetensors
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

VN_WAV = "/root/reference/src/infer/update_213000_ref.wav"
VN_TEXT = ("Thậm chí không ăn thì cũng có cảm giác rất là cứng bụng, chủ yếu "
           "là cái phần rốn trở lên. Em có cảm giác khó thở, và ngủ cũng "
           "không ngon, thường bị ợ hơi rất là nhiều")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/trained_flagship.safetensors")
    ap.add_argument("--span", default="4.0:6.0", help="edit span seconds")
    ap.add_argument("--out-dir", default="benchmarks/artifacts/edit_trained")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from convergence_real import CORPUS

    from eraxvif5tts_tpu.audio.griffin_lim import griffin_lim_mel
    from eraxvif5tts_tpu.audio.io import read_wav, write_wav
    from eraxvif5tts_tpu.audio.resample import resample
    from eraxvif5tts_tpu.infer.speech_edit import edit_speech, parse_spans
    from eraxvif5tts_tpu.infer.wrapper import F5TTSWrapper

    chars = sorted({c for _, text in CORPUS for c in text})
    vocab = {c: i for i, c in enumerate(chars)}

    wrapper = F5TTSWrapper(model_name="F5TTS_v1_Base", ckpt_path=args.ckpt,
                           vocab_char_map=vocab, compute_dtype="bfloat16")
    wave, sr = read_wav(VN_WAV)
    wave = wave.mean(axis=0)
    if sr != wrapper.target_sample_rate:
        wave = resample(wave, sr, wrapper.target_sample_rate)

    spans = parse_spans(args.span)
    _, mel, edit_mask = edit_speech(
        wrapper, wave, VN_TEXT, VN_TEXT, spans, seed=3, use_pinyin=False,
        return_mel=True,
    )  # mel [n_mels, n], edit_mask [n] True = kept, False = regenerated

    n = mel.shape[1]
    ref_mel = np.asarray(
        wrapper._mel_jit(jnp.asarray(wave[None]))).swapaxes(1, 2)[0, :n].T

    edited = ~edit_mask
    span_l1 = float(np.mean(np.abs(mel[:, edited] - ref_mel[:, edited])))
    kept_l1 = float(np.mean(np.abs(mel[:, edit_mask] - ref_mel[:, edit_mask])))
    tgt_mag = float(np.mean(np.abs(ref_mel[:, edited])))

    os.makedirs(args.out_dir, exist_ok=True)
    np.save(os.path.join(args.out_dir, "edited_mel.npy"), mel)
    gl = griffin_lim_mel(mel.astype(np.float32), n_iter=48, hop_length=256,
                         sample_rate=24000)
    write_wav(os.path.join(args.out_dir, "edited.wav"), gl, 24000)

    report = {
        "ckpt": args.ckpt, "span_seconds": spans,
        "frames": n, "edited_frames": int(edited.sum()),
        "edited_span_mel_l1": round(span_l1, 4),
        "kept_region_mel_l1": round(kept_l1, 6),
        "target_mel_l1_scale": round(tgt_mag, 4),
        "wav": os.path.join(args.out_dir, "edited.wav"),
    }
    with open(os.path.join(args.out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"metric": "edit_span_mel_l1", "value": span_l1,
                      "kept_l1": kept_l1, "unit": "mel_l1",
                      "artifact": os.path.join(args.out_dir, "report.json")}))


if __name__ == "__main__":
    main()
