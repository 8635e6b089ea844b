"""Batched test-set inference across hosts.

Parity with reference `src/f5_tts/eval/eval_infer_batch.py`: length-bucketed prompt
batches (one static jit shape per bucket), prompts split across processes
(``accelerator.split_between_processes`` -> ``jax.process_index`` striding,
SURVEY.md §2.7 "eval sharding"), per-utterance wav save, wall-clock RTF report.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def split_between_processes(items: list, process_index: int, process_count: int) -> list:
    return items[process_index::process_count]


def run_eval_inference(
    wrapper,
    batches,
    output_dir: str,
    nfe_step: int = 32,
    cfg_strength: float = 2.0,
    sway_sampling_coef: float = -1.0,
    seed: int = 0,
    no_ref_audio: bool = False,
) -> dict:
    """Run all prompt batches through ``cfm.sample`` + vocoder; save wavs; report RTF."""
    import jax
    import jax.numpy as jnp

    from eraxvif5tts_tpu.audio.io import write_wav
    from eraxvif5tts_tpu.infer.utils import pick_bucket
    from eraxvif5tts_tpu.text.tokenizer import list_str_to_idx

    os.makedirs(output_dir, exist_ok=True)
    sr = wrapper.target_sample_rate
    hop = wrapper.hop_length
    key = jax.random.key(seed)

    total_audio_sec = 0.0
    t0 = time.perf_counter()
    n_utts = 0
    for batch in batches:
        bucket = pick_bucket(int(batch.total_mel_lens.max()) + 1,
                             wrapper.duration_buckets)
        text_bucket = pick_bucket(max(len(t) for t in batch.final_texts),
                                  wrapper.text_buckets)
        text_ids = list_str_to_idx(batch.final_texts, wrapper.vocab_char_map,
                                   pad_to=text_bucket)
        out = wrapper.cfm.sample(
            wrapper.params,
            jnp.asarray(batch.ref_mels),
            jnp.asarray(text_ids),
            jnp.asarray(batch.total_mel_lens),
            jnp.asarray(batch.ref_mel_lens),
            key,
            steps=nfe_step,
            cfg_strength=cfg_strength,
            sway_sampling_coef=sway_sampling_coef,
            max_duration=bucket,
        )
        waves = wrapper._vocode_jit(out.swapaxes(1, 2))
        waves = np.asarray(waves)
        for i, utt in enumerate(batch.utts):
            start = int(batch.ref_mel_lens[i]) * hop
            end = int(batch.total_mel_lens[i]) * hop
            wave = waves[i, start:end]
            write_wav(os.path.join(output_dir, f"{utt}.wav"), wave, sr)
            total_audio_sec += len(wave) / sr
            n_utts += 1
    wall = time.perf_counter() - t0
    report = {
        "utterances": n_utts,
        "audio_seconds": round(total_audio_sec, 2),
        "wall_seconds": round(wall, 2),
        "rtf": round(total_audio_sec / max(wall, 1e-6), 3),
        "nfe_step": nfe_step,
    }
    with open(os.path.join(output_dir, "_eval_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    return report


def main(argv=None):
    p = argparse.ArgumentParser(prog="eraxvif5tts-eval-infer")
    p.add_argument("-n", "--model", default="F5TTS_v1_Base")
    p.add_argument("-p", "--ckpt_file", required=True)
    p.add_argument("-v", "--vocab_file", required=True)
    p.add_argument("-t", "--testset", required=True, help="seedtts metalst path")
    p.add_argument("-o", "--output_dir", default="eval_out")
    p.add_argument("--nfe_step", type=int, default=32)
    p.add_argument("--cfg_strength", type=float, default=2.0)
    p.add_argument("--sway", type=float, default=-1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--vocoder_ckpt", default=None)
    args = p.parse_args(argv)

    import jax

    from eraxvif5tts_tpu.audio.io import read_wav
    from eraxvif5tts_tpu.infer.wrapper import F5TTSWrapper
    from eraxvif5tts_tpu.eval.utils_eval import get_inference_prompt, get_seedtts_testset_metainfo
    from eraxvif5tts_tpu.text.pinyin import convert_char_to_pinyin

    wrapper = F5TTSWrapper(model_name=args.model, ckpt_path=args.ckpt_file,
                           vocab_file=args.vocab_file,
                           vocoder_ckpt_path=args.vocoder_ckpt)
    metainfo = get_seedtts_testset_metainfo(args.testset)
    metainfo = split_between_processes(metainfo, jax.process_index(), jax.process_count())

    def mel_fn(wav):
        import jax.numpy as jnp

        n = len(wav) // wrapper.hop_length * wrapper.hop_length
        mel = wrapper._mel_jit(jnp.asarray(wav[None, :n]))
        return np.asarray(mel.swapaxes(1, 2)[0, : n // wrapper.hop_length])

    batches = get_inference_prompt(
        metainfo, mel_fn=mel_fn, load_wav=read_wav,
        tokenize=lambda t: convert_char_to_pinyin([t])[0],
    )
    report = run_eval_inference(
        wrapper, batches, args.output_dir, nfe_step=args.nfe_step,
        cfg_strength=args.cfg_strength, sway_sampling_coef=args.sway, seed=args.seed,
    )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
