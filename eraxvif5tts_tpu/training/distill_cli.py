"""Distillation CLI (reference `src/f5_tts/train/distil_reload.py:630` ``main``):
teacher 22-layer checkpoint -> pruned student with combined student/distill/spec-l1
losses."""

from __future__ import annotations

import argparse
import dataclasses

import jax

from eraxvif5tts_tpu.compression.convert import (
    backbone_params_from_torch,
    infer_depth,
    infer_text_num_embeds,
    load_state_dict,
    normalize_reference_state_dict,
)
from eraxvif5tts_tpu.configs import PRESETS
from eraxvif5tts_tpu.models import CFM, build_backbone
from eraxvif5tts_tpu.text.tokenizer import get_tokenizer
from eraxvif5tts_tpu.training.cli import batch_iterator
from eraxvif5tts_tpu.training.dataset import DynamicBatchSampler, load_dataset
from eraxvif5tts_tpu.training.distill import DistillConfig, DistillTrainer
from eraxvif5tts_tpu.training.trainer import make_optimizer


def main(argv=None):
    p = argparse.ArgumentParser(prog="eraxvif5tts-distill")
    p.add_argument("--teacher_ckpt", required=True)
    p.add_argument("--student_ckpt", default=None, help="pruned init (else random)")
    p.add_argument("--student_depth", type=int, default=14)
    p.add_argument("--dataset_name", required=True)
    p.add_argument("--tokenizer", default="custom")
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--data-dir", default="./data")
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size_per_gpu", type=int, default=3200)
    p.add_argument("--max_samples", type=int, default=64)
    p.add_argument("--distill_loss_weight", type=float, default=0.5)
    p.add_argument("--distill_loss_type", default="mse", choices=["mse", "l1"])
    p.add_argument("--spec_l1_weight", type=float, default=0.0)
    p.add_argument("--checkpoint_dir", default="ckpts/distill")
    p.add_argument("--save_per_updates", type=int, default=50000)
    p.add_argument("--seed", type=int, default=666)
    args = p.parse_args(argv)

    vocab_char_map, vocab_size = get_tokenizer(
        args.tokenizer_path or args.dataset_name, args.tokenizer,
        base_data_path=args.data_dir,
    )

    teacher_sd = normalize_reference_state_dict(load_state_dict(args.teacher_ckpt))
    teacher_depth = infer_depth(teacher_sd)
    teacher_vocab = infer_text_num_embeds(teacher_sd)
    base = PRESETS["F5TTS_v1_Base"]
    teacher_cfg = dataclasses.replace(
        base, arch=dataclasses.replace(base.arch, depth=teacher_depth)
    )
    student_cfg = dataclasses.replace(
        base, arch=dataclasses.replace(base.arch, depth=args.student_depth)
    )
    teacher = build_backbone(teacher_cfg, text_num_embeds=teacher_vocab)
    student = build_backbone(student_cfg, text_num_embeds=teacher_vocab)
    teacher_params = backbone_params_from_torch(
        teacher_sd, "DiT", depth=teacher_depth, conv_layers=base.arch.conv_layers
    )

    cfm = CFM.build(student, student_cfg.mel_spec)
    dataset = load_dataset(args.dataset_name, args.tokenizer, data_dir=args.data_dir)
    frame_lengths = [dataset.frame_length(i) for i in range(len(dataset))]
    sampler = DynamicBatchSampler(frame_lengths, args.batch_size_per_gpu,
                                  max_samples=args.max_samples, random_seed=args.seed)
    total_updates = max(len(sampler) * args.epochs, 1)

    trainer = DistillTrainer(
        student_cfm=cfm,
        teacher_transformer=teacher,
        optimizer=make_optimizer(learning_rate=args.learning_rate,
                                 total_updates=total_updates),
        config=DistillConfig(
            distill_loss_weight=args.distill_loss_weight,
            distill_loss_type=args.distill_loss_type,
            spec_l1_weight=args.spec_l1_weight,
        ),
    )
    rng = jax.random.key(args.seed)
    if args.student_ckpt:
        student_sd = normalize_reference_state_dict(load_state_dict(args.student_ckpt))
        student_params = backbone_params_from_torch(
            student_sd, "DiT", depth=args.student_depth,
            conv_layers=base.arch.conv_layers,
        )
        state = trainer.init_state(rng)
        state = state.replace(params=student_params,
                              ema_params=jax.tree.map(lambda x: x, student_params))
    else:
        state = trainer.init_state(rng)

    for batch in batch_iterator(dataset, sampler, vocab_char_map, epochs=args.epochs):
        rng, step_rng = jax.random.split(rng)
        state, metrics = trainer.train_step(state, teacher_params, batch, step_rng)
        step = int(state.step)
        if step % 100 == 0:
            print(f"update {step}: " +
                  " ".join(f"{k}={float(v):.4f}" for k, v in metrics.items()))
    return state


if __name__ == "__main__":
    main()
