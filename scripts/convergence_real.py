"""Convergence evidence on REAL speech: overfit a small-but-real DiT on the
reference repo's example utterances (true recordings + true transcripts) and
record the loss trajectory as an artifact.

Corpus (audio + transcripts shipped with the reference, cited per file):
- `src/f5_tts/infer/examples/basic/basic_ref_en.wav` — transcript from
  `examples/basic/basic.toml`
- `src/f5_tts/infer/examples/basic/basic_ref_zh.wav` — transcript from
  `infer/speech_edit.py:83`
- `src/infer/update_213000_ref.wav` (Vietnamese flagship voice) — transcript
  from `src/infer/F5TTS_Test.ipynb`

This goes beyond the smoke-scale overfit test (`tests/test_convergence.py`):
real 24 kHz recordings, the production mel frontend, the production `Trainer`
(pjit step, EMA, NaN-skip, LR schedule), several hundred updates. Writes
`benchmarks/artifacts/convergence_real.json` with the per-update loss curve and
prints a one-line JSON summary.

Usage (TPU or CPU):  python scripts/convergence_real.py --updates 300
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

# canonical corpus + loader live in the package now (the repeatable eval
# harness `python -m eraxvif5tts_tpu.eval infill` uses the same table);
# re-exported here so sibling scripts' `from convergence_real import
# load_corpus` keeps working.
from eraxvif5tts_tpu.eval.infill import CORPUS, REF_ROOT, load_corpus  # noqa: F401,E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--updates", type=int, default=300)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--out", default="benchmarks/artifacts/convergence_real.json")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--preset", default=None,
                    help="train a full PRESETS arch (e.g. F5TTS_v1_Base) instead "
                         "of the ad-hoc --dim/--depth model — used to produce "
                         "structured trained weights for int8 gate calibration")
    ap.add_argument("--export", default=None,
                    help="after training, export the EMA weights to this "
                         ".safetensors file in the reference torch key schema "
                         "(ema_model.transformer.* via backbone_params_to_torch) "
                         "so quant_quality.py --ckpt can calibrate on them")
    ap.add_argument("--synthesize", action="store_true",
                    help="after training, infill the first utterance from its "
                         "first half and Griffin-Lim the mel to a wav artifact")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from eraxvif5tts_tpu.configs import ArchConfig, MelSpecConfig, ModelConfig
    from eraxvif5tts_tpu.models import build_backbone
    from eraxvif5tts_tpu.models.cfm import CFM
    from eraxvif5tts_tpu.ops.stft import MelSpectrogram
    from eraxvif5tts_tpu.parallel.mesh import make_mesh
    from eraxvif5tts_tpu.text.tokenizer import list_str_to_idx
    from eraxvif5tts_tpu.training.trainer import Trainer, make_optimizer

    mel_cfg = MelSpecConfig()
    mel_spec = MelSpectrogram(
        n_fft=mel_cfg.n_fft, hop_length=mel_cfg.hop_length,
        win_length=mel_cfg.win_length, n_mel_channels=mel_cfg.n_mel_channels,
        target_sample_rate=mel_cfg.target_sample_rate,
    )
    mel_fn = jax.jit(mel_spec.__call__)
    rows = load_corpus(mel_fn, mel_cfg.target_sample_rate, mel_cfg.hop_length)

    chars = sorted({c for r in rows for c in r["text"]})
    vocab = {c: i for i, c in enumerate(chars)}

    if args.preset:
        from eraxvif5tts_tpu.configs import PRESETS

        cfg = PRESETS[args.preset]
        # corpus mels above were computed with the default (vocos) frontend
        assert cfg.mel_spec == mel_cfg, (
            f"--preset {args.preset} uses a different mel frontend; corpus "
            "mels were computed with the vocos defaults")
    else:
        cfg = ModelConfig(
            arch=ArchConfig(dim=args.dim, depth=args.depth, heads=8,
                            dim_head=args.dim // 8, ff_mult=2, text_dim=128,
                            conv_layers=2, dropout=0.1),
            mel_spec=mel_cfg,
        )
    transformer = build_backbone(cfg, text_num_embeds=len(vocab))
    cfm = CFM.build(transformer, mel_cfg)
    optimizer = make_optimizer(learning_rate=args.lr, num_warmup_updates=20,
                               total_updates=args.updates, max_grad_norm=1.0)
    trainer = Trainer(cfm=cfm, optimizer=optimizer, mesh=make_mesh(n_model=1),
                      checkpoint_dir=None)

    # One static padded batch: all three utterances, every update.
    max_frames = ((max(r["mel_spec"].shape[0] for r in rows) + 127) // 128) * 128
    b = len(rows)
    mel = np.zeros((b, max_frames, mel_cfg.n_mel_channels), np.float32)
    lens = np.zeros((b,), np.int32)
    for i, r in enumerate(rows):
        n = r["mel_spec"].shape[0]
        mel[i, :n] = r["mel_spec"]
        lens[i] = n
    text_ids = list_str_to_idx([list(r["text"]) for r in rows], vocab)

    rng = jax.random.key(0)
    state = trainer.init_state(rng)
    mel_j, text_j, lens_j = jnp.asarray(mel), jnp.asarray(text_ids), jnp.asarray(lens)

    losses = []
    for step in range(args.updates):
        step_rng = jax.random.fold_in(rng, step)
        state, metrics = trainer.train_step(
            state, {"mel": mel_j, "text": text_j, "lens": lens_j}, step_rng,
        )
        loss = float(metrics["loss"])
        losses.append(loss)
        if step % 25 == 0 or step == args.updates - 1:
            print(json.dumps({"update": step, "loss": round(loss, 4)}), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)

    export_path = None
    if args.export:
        # Reference torch key schema (`ema_model.transformer.*`), so the int8
        # gate can be calibrated on structured TRAINED weights instead of a
        # noise-perturbed init: quant_quality.py --ckpt <this file>.
        from safetensors.numpy import save_file

        from eraxvif5tts_tpu.compression.convert import backbone_params_to_torch

        sd = backbone_params_to_torch(
            jax.tree.map(lambda x: np.asarray(x, np.float32), state.ema_params),
            backbone=cfg.backbone, depth=cfg.arch.depth,
            conv_layers=cfg.arch.conv_layers,
            qk_norm=cfg.arch.qk_norm == "rms_norm",
            long_skip=cfg.arch.long_skip_connection)
        os.makedirs(os.path.dirname(args.export) or ".", exist_ok=True)
        save_file({f"ema_model.{k}": v for k, v in sd.items()}, args.export)
        export_path = args.export
        print(json.dumps({"exported": export_path, "keys": len(sd)}), flush=True)

    wav_artifact = None
    if args.synthesize:
        # Infill: condition on the first half of utterance 0, regenerate the
        # rest with its own transcript; Griffin-Lim makes it audible without a
        # trained vocoder (mel.npy keeps the exact model output).
        from eraxvif5tts_tpu.audio.griffin_lim import griffin_lim_mel
        from eraxvif5tts_tpu.audio.io import write_wav
        from eraxvif5tts_tpu.infer.utils import pick_bucket

        r = rows[0]
        ref_len = r["mel_spec"].shape[0] // 2
        total = r["mel_spec"].shape[0]
        bucket = pick_bucket(total)
        mel_out = cfm.sample(
            state.ema_params, jnp.asarray(r["mel_spec"][None, :ref_len]),
            jnp.asarray(list_str_to_idx([list(r["text"])], vocab)),
            jnp.asarray([total]), jnp.asarray([ref_len]),
            jax.random.key(1), steps=32, max_duration=bucket,
        )
        mel_np = np.asarray(mel_out[0, :total]).T  # [n_mels, total]
        base = os.path.join(os.path.dirname(args.out), "convergence_sample")
        np.save(base + ".npy", mel_np)
        wav = griffin_lim_mel(mel_np, n_iter=48,
                              hop_length=mel_cfg.hop_length,
                              sample_rate=mel_cfg.target_sample_rate)
        write_wav(base + ".wav", wav, mel_cfg.target_sample_rate)
        gen = mel_np[:, ref_len:]
        tgt = r["mel_spec"][ref_len:].T
        mel_l1 = float(np.mean(np.abs(gen - tgt[:, : gen.shape[1]])))
        wav_artifact = {"wav": base + ".wav", "mel_npy": base + ".npy",
                        "infill_mel_l1": round(mel_l1, 4)}
        print(json.dumps({"synthesized": wav_artifact}), flush=True)

    first = float(np.mean(losses[:10]))
    last = float(np.mean(losses[-10:]))
    artifact = {
        "corpus": [r["text"][:40] for r in rows],
        "total_frames": int(lens.sum()),
        "model": {"dim": args.dim, "depth": args.depth, "params_m": round(
            sum(x.size for x in jax.tree.leaves(state.params)) / 1e6, 2)},
        "updates": args.updates,
        "loss_first10_mean": round(first, 4),
        "loss_last10_mean": round(last, 4),
        "loss_curve": [round(x, 5) for x in losses],
        "synthesized": wav_artifact,
        "exported": export_path,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({
        "metric": "convergence_loss_ratio",
        "value": round(last / first, 4),
        "unit": "last10/first10",
        "loss_first10_mean": round(first, 4),
        "loss_last10_mean": round(last, 4),
        "artifact": args.out,
    }))


if __name__ == "__main__":
    main()
