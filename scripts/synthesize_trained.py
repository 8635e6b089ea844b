"""Synthesize speech from a TRAINED exported checkpoint — quality artifact.

Takes a reference-schema checkpoint (e.g. what `scripts/convergence_real.py
--preset F5TTS_v1_Base --export` writes after overfitting the reference's real
recordings), pushes it through the PRODUCTION import pipeline
(`load_state_dict` -> `normalize_reference_state_dict` ->
`backbone_params_from_torch`), and infills each corpus utterance: condition on
the first half of the real recording, regenerate the second half from its
transcript with the production `cfm.sample` (bucketed, CFG-doubled batch,
Euler scan). Decodes with Griffin-Lim (no trained vocoder ships offline; the
mel .npy keeps the exact model output) and reports the generated-region mel L1
vs the ground-truth recording — the end-to-end "did training actually learn
speech" number that random-weight RTF benchmarks cannot give.

    python scripts/synthesize_trained.py --ckpt /tmp/trained_flagship.safetensors
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--preset", default="F5TTS_v1_Base")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--cfg-strength", type=float, default=2.0)
    ap.add_argument("--out-dir", default="benchmarks/artifacts/trained_synth")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from convergence_real import load_corpus

    from eraxvif5tts_tpu.audio.griffin_lim import griffin_lim_mel
    from eraxvif5tts_tpu.audio.io import write_wav
    from eraxvif5tts_tpu.compression.convert import (
        backbone_params_from_torch,
        infer_text_num_embeds,
        load_state_dict,
        normalize_reference_state_dict,
    )
    from eraxvif5tts_tpu.configs import PRESETS
    from eraxvif5tts_tpu.infer.utils import pick_bucket
    from eraxvif5tts_tpu.models import build_backbone
    from eraxvif5tts_tpu.models.cfm import CFM
    from eraxvif5tts_tpu.ops.stft import MelSpectrogram
    from eraxvif5tts_tpu.text.tokenizer import list_str_to_idx

    cfg = PRESETS[args.preset]
    mel_cfg = cfg.mel_spec
    mel_spec = MelSpectrogram(
        n_fft=mel_cfg.n_fft, hop_length=mel_cfg.hop_length,
        win_length=mel_cfg.win_length, n_mel_channels=mel_cfg.n_mel_channels,
        target_sample_rate=mel_cfg.target_sample_rate,
    )
    mel_fn = jax.jit(mel_spec.__call__)
    rows = load_corpus(mel_fn, mel_cfg.target_sample_rate, mel_cfg.hop_length)

    # the training vocab (convergence_real.py): sorted chars of the transcripts
    chars = sorted({c for r in rows for c in r["text"]})
    vocab = {c: i for i, c in enumerate(chars)}

    sd = normalize_reference_state_dict(load_state_dict(args.ckpt), use_ema=True)
    n_text = infer_text_num_embeds(sd)
    assert n_text == len(vocab), (
        f"checkpoint text vocab {n_text} != corpus vocab {len(vocab)} — was it "
        "exported by convergence_real.py on the same corpus?")
    params = backbone_params_from_torch(
        sd, backbone=cfg.backbone, depth=cfg.arch.depth,
        conv_layers=cfg.arch.conv_layers,
        qk_norm=cfg.arch.qk_norm == "rms_norm",
        long_skip=cfg.arch.long_skip_connection)
    transformer = build_backbone(cfg, text_num_embeds=len(vocab),
                                 compute_dtype=jnp.bfloat16)
    cfm = CFM.build(transformer, mel_cfg)
    params = jax.device_put(params)  # pin once: torch-import arrays are host numpy

    os.makedirs(args.out_dir, exist_ok=True)
    report = []
    for i, r in enumerate(rows):
        total = r["mel_spec"].shape[0]
        ref_len = total // 2
        bucket = pick_bucket(total)
        mel_out = cfm.sample(
            params, jnp.asarray(r["mel_spec"][None, :ref_len]),
            jnp.asarray(list_str_to_idx([list(r["text"])], vocab)),
            jnp.asarray([total]), jnp.asarray([ref_len]),
            jax.random.key(7 + i), steps=args.steps,
            cfg_strength=args.cfg_strength, max_duration=bucket,
        )
        mel_np = np.asarray(mel_out[0, :total], np.float32).T  # [n_mels, total]
        base = os.path.join(args.out_dir, f"utt{i}")
        np.save(base + ".npy", mel_np)
        wav = griffin_lim_mel(mel_np, n_iter=48, hop_length=mel_cfg.hop_length,
                              sample_rate=mel_cfg.target_sample_rate)
        write_wav(base + ".wav", wav, mel_cfg.target_sample_rate)
        gen = mel_np[:, ref_len:]
        tgt = r["mel_spec"][ref_len:].T
        mel_l1 = float(np.mean(np.abs(gen - tgt[:, : gen.shape[1]])))
        # scale context: L1 of the target against silence-level mel
        tgt_mag = float(np.mean(np.abs(tgt)))
        row = {"utt": i, "text": r["text"][:40], "frames": total,
               "infill_mel_l1": round(mel_l1, 4),
               "target_mel_l1_scale": round(tgt_mag, 4),
               "wav": base + ".wav"}
        report.append(row)
        print(json.dumps(row), flush=True)

    out = {"ckpt": args.ckpt, "steps": args.steps, "utterances": report,
           "mean_infill_mel_l1": round(
               float(np.mean([r["infill_mel_l1"] for r in report])), 4)}
    with open(os.path.join(args.out_dir, "report.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": "trained_infill_mel_l1",
                      "value": out["mean_infill_mel_l1"], "unit": "mel_l1",
                      "artifact": os.path.join(args.out_dir, "report.json")}))


if __name__ == "__main__":
    main()
