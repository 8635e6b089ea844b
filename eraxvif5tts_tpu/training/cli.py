"""Training entry points.

- ``train_main``: YAML-config training (reference `src/f5_tts/train/train.py:16-86`,
  hydra replaced with the typed config tree).
- ``finetune_main``: argparse finetune/from-scratch CLI with the experiment presets
  including the pruned students (reference `train/finetune_cli.py:192-498`,
  presets `:222-249`), vocab extension for pruned models (`:287-305`), optional
  duration predictor (`:349-361`).
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional

import jax

from eraxvif5tts_tpu.configs import PRESETS, TrainConfig, load_yaml_config
from eraxvif5tts_tpu.models import CFM, build_backbone
from eraxvif5tts_tpu.parallel.mesh import make_mesh
from eraxvif5tts_tpu.text.tokenizer import get_tokenizer
from eraxvif5tts_tpu.training.dataset import (
    CustomDataset,
    DynamicBatchSampler,
    collate,
    load_dataset,
)
from eraxvif5tts_tpu.training.trainer import Trainer, make_optimizer


def build_trainer(cfg: TrainConfig, vocab_size: int, total_updates: int,
                  checkpoint_dir: Optional[str] = None, n_model: int = 1) -> Trainer:
    transformer = build_backbone(cfg.model, text_num_embeds=vocab_size)
    cfm = CFM.build(transformer, cfg.model.mel_spec)
    optimizer = make_optimizer(
        learning_rate=cfg.optim.learning_rate,
        num_warmup_updates=cfg.optim.num_warmup_updates,
        total_updates=total_updates,
        max_grad_norm=cfg.optim.max_grad_norm,
    )
    return Trainer(
        cfm=cfm,
        optimizer=optimizer,
        mesh=make_mesh(n_model=n_model),
        grad_accumulation_steps=cfg.optim.grad_accumulation_steps,
        checkpoint_dir=checkpoint_dir or cfg.ckpts.save_dir,
        keep_last_n_checkpoints=cfg.ckpts.keep_last_n_checkpoints,
    )


def batch_iterator(dataset: CustomDataset, sampler: DynamicBatchSampler,
                   vocab_char_map: dict, tokenize=None, epochs: int = 1):
    for epoch in range(epochs):
        sampler.set_epoch(epoch)
        for batch_indices in sampler:
            samples = [dataset[i] for i in batch_indices]
            if any(s.mel is None for s in samples):
                continue
            yield collate(samples, vocab_char_map, tokenize=tokenize)


def train_main(argv=None):
    p = argparse.ArgumentParser(prog="eraxvif5tts-train")
    p.add_argument("config", help="YAML config (reference `configs/*.yaml` format)")
    p.add_argument("--data-dir", default="./data")
    p.add_argument("--resume", default=None, help="checkpoint dir/path to resume")
    p.add_argument("--seed", type=int, default=666)  # reference `train.py:86`
    p.add_argument("--n-model", type=int, default=1, help="tensor-parallel size")
    args = p.parse_args(argv)

    cfg = load_yaml_config(args.config)
    tokenizer_path = cfg.model.tokenizer_path or cfg.datasets.name
    vocab_char_map, vocab_size = get_tokenizer(
        tokenizer_path, cfg.model.tokenizer, base_data_path=args.data_dir
    )

    dataset = load_dataset(cfg.datasets.name, cfg.model.tokenizer,
                           data_dir=args.data_dir,
                           mel_spec_kwargs=dataclasses.asdict(cfg.model.mel_spec))
    frame_lengths = [dataset.frame_length(i) for i in range(len(dataset))]
    sampler = DynamicBatchSampler(
        frame_lengths, cfg.datasets.batch_size_per_gpu,
        max_samples=cfg.datasets.max_samples, random_seed=args.seed,
    )
    total_updates = len(sampler) * cfg.optim.epochs

    trainer = build_trainer(cfg, vocab_size, total_updates, n_model=args.n_model)
    rng = jax.random.key(args.seed)
    state = trainer.init_state(rng)
    if args.resume:
        state = trainer.load_checkpoint(args.resume, state)

    def log_fn(step, metrics):
        print(f"update {step}: " + " ".join(f"{k}={v:.4f}" for k, v in metrics.items()))

    from eraxvif5tts_tpu.text.pinyin import convert_char_to_pinyin

    def tokenize(text):
        if cfg.model.tokenizer == "pinyin":
            return convert_char_to_pinyin([text])[0] if isinstance(text, str) else text
        return list(text) if isinstance(text, str) else text

    batches = batch_iterator(dataset, sampler, vocab_char_map, tokenize=tokenize,
                             epochs=cfg.optim.epochs)
    state = trainer.train(state, batches, rng,
                          save_per_updates=cfg.ckpts.save_per_updates, log_fn=log_fn)
    trainer.save_checkpoint(state, last=True)
    return state


def finetune_main(argv=None):
    p = argparse.ArgumentParser(prog="eraxvif5tts-finetune")
    p.add_argument("--exp_name", default="F5TTS_v1_Base",
                   choices=list(PRESETS) + ["F5TTS_v1_Custom_Prune_14", "F5TTS_v1_Custom_Prune_12"])
    p.add_argument("--dataset_name", required=True)
    p.add_argument("--pretrain", default=None, help="source checkpoint (.pt/.safetensors)")
    p.add_argument("--tokenizer", default="custom", choices=["pinyin", "char", "custom"])
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--data-dir", default="./data")
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--batch_size_per_gpu", type=int, default=3200)
    p.add_argument("--batch_size_type", default="frame", choices=["frame", "sample"])
    p.add_argument("--max_samples", type=int, default=64)
    p.add_argument("--grad_accumulation_steps", type=int, default=1)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--num_warmup_updates", type=int, default=20000)
    p.add_argument("--save_per_updates", type=int, default=50000)
    p.add_argument("--keep_last_n_checkpoints", type=int, default=-1)
    p.add_argument("--finetune", action="store_true", default=True)
    p.add_argument("--from-scratch", dest="finetune", action="store_false")
    p.add_argument("--use_duration_predictor", action="store_true")
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--seed", type=int, default=666)
    args = p.parse_args(argv)

    # pruned-student presets (reference `finetune_cli.py:222-249`)
    exp = args.exp_name
    if exp == "F5TTS_v1_Custom_Prune_14":
        model_cfg = PRESETS["F5TTS_v1_Pruned_14"]
    elif exp == "F5TTS_v1_Custom_Prune_12":
        model_cfg = PRESETS["F5TTS_v1_Pruned_12"]
    else:
        model_cfg = PRESETS[exp]

    tokenizer_path = args.tokenizer_path or args.dataset_name
    vocab_char_map, vocab_size = get_tokenizer(
        tokenizer_path, args.tokenizer, base_data_path=args.data_dir
    )

    from eraxvif5tts_tpu.configs import CkptConfig, DatasetConfig, OptimConfig

    cfg = TrainConfig(
        model=dataclasses.replace(model_cfg, tokenizer=args.tokenizer,
                                  tokenizer_path=args.tokenizer_path),
        optim=OptimConfig(
            epochs=args.epochs, learning_rate=args.learning_rate,
            num_warmup_updates=args.num_warmup_updates,
            grad_accumulation_steps=args.grad_accumulation_steps,
            max_grad_norm=args.max_grad_norm,
        ),
        datasets=DatasetConfig(name=args.dataset_name,
                               batch_size_per_gpu=args.batch_size_per_gpu,
                               max_samples=args.max_samples),
        ckpts=CkptConfig(save_per_updates=args.save_per_updates,
                         keep_last_n_checkpoints=args.keep_last_n_checkpoints,
                         save_dir=args.checkpoint_dir or f"ckpts/{args.exp_name}"),
    )

    dataset = load_dataset(cfg.datasets.name, args.tokenizer, data_dir=args.data_dir,
                           mel_spec_kwargs=dataclasses.asdict(cfg.model.mel_spec))
    frame_lengths = [dataset.frame_length(i) for i in range(len(dataset))]
    sampler = DynamicBatchSampler(frame_lengths, cfg.datasets.batch_size_per_gpu,
                                  max_samples=cfg.datasets.max_samples,
                                  random_seed=args.seed)
    total_updates = max(len(sampler) * cfg.optim.epochs, 1)
    trainer = build_trainer(cfg, vocab_size, total_updates)

    rng = jax.random.key(args.seed)
    if args.finetune and args.pretrain:
        # import reference checkpoint, extending the vocab table if the dataset's
        # vocab outgrew the checkpoint (`finetune_cli.py:287-305`)
        from eraxvif5tts_tpu.compression.convert import (
            backbone_params_from_torch,
            infer_text_num_embeds,
            load_state_dict,
            normalize_reference_state_dict,
        )
        from eraxvif5tts_tpu.compression.pruner import expand_text_embedding

        sd = normalize_reference_state_dict(load_state_dict(args.pretrain))
        ckpt_vocab = infer_text_num_embeds(sd)
        if vocab_size > ckpt_vocab:
            sd = expand_text_embedding(sd, vocab_size)
        params = backbone_params_from_torch(
            sd, cfg.model.backbone, depth=cfg.model.arch.depth,
            conv_layers=cfg.model.arch.conv_layers,
        )
        state = trainer.init_state(rng, params=params)
    else:
        state = trainer.init_state(rng)

    def log_fn(step, metrics):
        print(f"update {step}: " + " ".join(f"{k}={v:.4f}" for k, v in metrics.items()))

    batches = batch_iterator(dataset, sampler, vocab_char_map, epochs=cfg.optim.epochs)
    state = trainer.train(state, batches, rng,
                          save_per_updates=cfg.ckpts.save_per_updates, log_fn=log_fn)
    trainer.save_checkpoint(state, last=True)
    return state


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "finetune":
        finetune_main(sys.argv[2:])
    else:
        train_main()
