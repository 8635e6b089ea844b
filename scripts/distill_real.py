"""Full compression lifecycle on TRAINED weights — prune -> distill -> serve-able
student, with measured quality.

Takes the trained full-flagship checkpoint (`scripts/convergence_real.py
--preset F5TTS_v1_Base --export`, reference-schema safetensors), then:

1. prunes it 22 -> ``--student-depth`` layers with the production SNR pruner
   (`compression/pruner.py`: importance scoring, first2/last2 rule, re-index,
   smoke-load) — reference `model_pruning/excellent_definitive-f5tts-pruner.py`;
2. distills teacher -> pruned student on the same real corpus with the
   production `DistillTrainer` (shared CFM corruption, in-jit frozen teacher,
   alpha-mixed student/distill losses, EMA, NaN-skip) — reference
   `train/distil_reload.py`;
3. exports the student EMA to the reference torch layout
   (`export_student_torch`) and re-imports it through the production pipeline;
4. infills each utterance's second half from its transcript with the student
   (same seeds/steps as `scripts/synthesize_trained.py`, so the per-utterance
   generated-region mel L1 is directly comparable to the teacher's).

    python scripts/distill_real.py --teacher-ckpt /tmp/trained_flagship.safetensors
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--teacher-ckpt", default="/tmp/trained_flagship.safetensors")
    ap.add_argument("--student-depth", type=int, default=12)
    ap.add_argument("--updates", type=int, default=600)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--steps", type=int, default=32, help="ODE steps for eval")
    ap.add_argument("--pruned-out", default=None)
    ap.add_argument("--student-out", default=None)
    ap.add_argument("--out-dir", default="benchmarks/artifacts/distill_real")
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
    from eraxvif5tts_tpu.compression.pruner import prune_checkpoint, test_pruned_model
    from eraxvif5tts_tpu.configs import PRESETS
    from eraxvif5tts_tpu.infer.utils import pick_bucket
    from eraxvif5tts_tpu.models import build_backbone
    from eraxvif5tts_tpu.models.cfm import CFM
    from eraxvif5tts_tpu.ops.stft import MelSpectrogram
    from eraxvif5tts_tpu.text.tokenizer import list_str_to_idx
    from eraxvif5tts_tpu.training.distill import DistillConfig, DistillTrainer
    from eraxvif5tts_tpu.training.trainer import make_optimizer

    base = PRESETS["F5TTS_v1_Base"]
    mel_cfg = base.mel_spec
    mel_spec = MelSpectrogram(
        n_fft=mel_cfg.n_fft, hop_length=mel_cfg.hop_length,
        win_length=mel_cfg.win_length, n_mel_channels=mel_cfg.n_mel_channels,
        target_sample_rate=mel_cfg.target_sample_rate,
    )
    rows = load_corpus(jax.jit(mel_spec.__call__), mel_cfg.target_sample_rate,
                       mel_cfg.hop_length)
    chars = sorted({c for r in rows for c in r["text"]})
    vocab = {c: i for i, c in enumerate(chars)}

    # 1. prune the trained teacher with the production pruner
    d = args.student_depth
    pruned_path = args.pruned_out or f"/tmp/trained_pruned{d}.safetensors"
    report = prune_checkpoint(args.teacher_ckpt, pruned_path, target_layers=d)
    assert test_pruned_model(pruned_path), "pruned checkpoint failed smoke-load"
    print(json.dumps({"pruned": pruned_path, "blocks_kept": report.blocks_to_keep,
                      "params_before_m": round(report.params_before / 1e6, 1),
                      "params_after_m": round(report.params_after / 1e6, 1),
                      "snr_fallback": report.used_fallback}), flush=True)

    # 2. distill teacher -> student on the real corpus
    teacher_sd = normalize_reference_state_dict(load_state_dict(args.teacher_ckpt),
                                                use_ema=True)
    n_text = infer_text_num_embeds(teacher_sd)
    assert n_text == len(vocab), (
        f"teacher text vocab {n_text} != corpus vocab {len(vocab)} — was the "
        "checkpoint exported by convergence_real.py on this corpus?")
    teacher_cfg = base
    student_cfg = dataclasses.replace(
        base, arch=dataclasses.replace(base.arch, depth=d))
    teacher = build_backbone(teacher_cfg, text_num_embeds=n_text,
                             compute_dtype=jnp.bfloat16)
    student = build_backbone(student_cfg, text_num_embeds=n_text,
                             compute_dtype=jnp.bfloat16)
    teacher_params = jax.device_put(backbone_params_from_torch(
        teacher_sd, "DiT", depth=teacher_cfg.arch.depth,
        conv_layers=base.arch.conv_layers))
    student_sd = normalize_reference_state_dict(load_state_dict(pruned_path))
    student_params = backbone_params_from_torch(
        student_sd, "DiT", depth=d, conv_layers=base.arch.conv_layers)

    cfm = CFM.build(student, mel_cfg)
    trainer = DistillTrainer(
        student_cfm=cfm,
        teacher_transformer=teacher,
        optimizer=make_optimizer(learning_rate=args.lr, num_warmup_updates=20,
                                 total_updates=args.updates, max_grad_norm=1.0,
                                 decay_type="cosine"),
        config=DistillConfig(),
    )
    state = trainer.init_state(jax.random.key(0), params=student_params)

    max_frames = ((max(r["mel_spec"].shape[0] for r in rows) + 127) // 128) * 128
    b = len(rows)
    mel = np.zeros((b, max_frames, mel_cfg.n_mel_channels), np.float32)
    lens = np.zeros((b,), np.int32)
    for i, r in enumerate(rows):
        n = r["mel_spec"].shape[0]
        mel[i, :n] = r["mel_spec"]
        lens[i] = n
    text_ids = np.asarray(list_str_to_idx([list(r["text"]) for r in rows], vocab))
    batch = {"mel": jnp.asarray(mel), "text": jnp.asarray(text_ids),
             "lens": jnp.asarray(lens)}

    rng = jax.random.key(1)
    losses, t0 = [], time.time()
    for step in range(args.updates):
        state, metrics = trainer.train_step(state, teacher_params, batch,
                                            jax.random.fold_in(rng, step))
        if step % 25 == 0 or step == args.updates - 1:
            m = {k: round(float(v), 4) for k, v in metrics.items()
                 if k != "skipped"}
            losses.append({"update": step, **m})
            print(json.dumps(losses[-1]), flush=True)

    train_s = time.time() - t0
    # 3. export the student EMA through the reference torch layout + reimport
    student_out = args.student_out or f"/tmp/distilled_student{d}.safetensors"
    trainer.export_student_torch(state, student_out, depth=d,
                                 conv_layers=base.arch.conv_layers)
    ema_sd = normalize_reference_state_dict(load_state_dict(student_out))
    eval_params = jax.device_put(backbone_params_from_torch(
        ema_sd, "DiT", depth=d, conv_layers=base.arch.conv_layers))

    # 4. infill eval — same seeds/steps as scripts/synthesize_trained.py
    os.makedirs(args.out_dir, exist_ok=True)
    utts = []
    for i, r in enumerate(rows):
        total = r["mel_spec"].shape[0]
        ref_len = total // 2
        mel_out = cfm.sample(
            eval_params, jnp.asarray(r["mel_spec"][None, :ref_len]),
            jnp.asarray(list_str_to_idx([list(r["text"])], vocab)),
            jnp.asarray([total]), jnp.asarray([ref_len]),
            jax.random.key(7 + i), steps=args.steps, cfg_strength=2.0,
            max_duration=pick_bucket(total),
        )
        mel_np = np.asarray(mel_out[0, :total], np.float32).T
        base_path = os.path.join(args.out_dir, f"utt{i}_student{d}")
        np.save(base_path + ".npy", mel_np)
        wav = griffin_lim_mel(mel_np, n_iter=48, hop_length=mel_cfg.hop_length,
                              sample_rate=mel_cfg.target_sample_rate)
        write_wav(base_path + ".wav", wav, mel_cfg.target_sample_rate)
        gen = mel_np[:, ref_len:]
        tgt = r["mel_spec"][ref_len:].T
        row = {"utt": i, "text": r["text"][:40], "frames": total,
               "student_infill_mel_l1": round(
                   float(np.mean(np.abs(gen - tgt[:, : gen.shape[1]]))), 4)}
        utts.append(row)
        print(json.dumps(row), flush=True)

    out = {
        "teacher_ckpt": args.teacher_ckpt,
        "student_depth": d,
        "blocks_kept": report.blocks_to_keep,
        "updates": args.updates,
        "train_seconds": round(train_s, 1),
        "loss_log": losses,
        "student_export": student_out,
        "utterances": utts,
        "mean_student_infill_mel_l1": round(
            float(np.mean([u["student_infill_mel_l1"] for u in utts])), 4),
        "teacher_comparison":
            "teacher numbers (same seeds/steps): "
            "benchmarks/artifacts/trained_synth/report.json",
    }
    with open(os.path.join(args.out_dir, "report.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": "distilled_infill_mel_l1",
                      "value": out["mean_student_infill_mel_l1"],
                      "unit": "mel_l1",
                      "artifact": os.path.join(args.out_dir, "report.json")}))


if __name__ == "__main__":
    main()
