"""Speech editing: regenerate selected time spans of an utterance.

Parity with reference `src/f5_tts/infer/speech_edit.py:137-184`: the edit regions are
zeroed in the conditioning mel and excluded from ``cond_mask`` via ``edit_mask`` at
hop resolution, so the sampler re-synthesizes only those spans while keeping the rest
of the original audio as fixed prompt.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from eraxvif5tts_tpu.infer.utils import pick_bucket
from eraxvif5tts_tpu.infer.wrapper import F5TTSWrapper
from eraxvif5tts_tpu.text.pinyin import convert_char_to_pinyin
from eraxvif5tts_tpu.text.tokenizer import list_str_to_idx


def edit_speech(
    wrapper: F5TTSWrapper,
    audio: np.ndarray,  # [t] float at target sample rate
    original_text: str,
    target_text: str,
    edit_spans_seconds: Sequence[tuple[float, float]],
    fix_durations_seconds: Sequence[float] | None = None,
    nfe_step: int = 32,
    cfg_strength: float = 2.0,
    sway_sampling_coef: float = -1.0,
    seed: int | None = None,
    use_pinyin: bool = True,
    return_mel: bool = False,
) -> np.ndarray | tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Regenerate ``edit_spans_seconds`` of ``audio`` to match ``target_text``.

    ``fix_durations_seconds`` optionally resizes each edited span (the reference
    offsets the timeline accordingly, `speech_edit.py:137-158`).
    ``return_mel=True`` returns a 3-tuple ``(wave, mel [n_mels, n_frames],
    edit_mask [n_frames])`` instead — the model's raw output plus the frame
    mask in the repo's VALID convention: True = kept prompt frame, False =
    regenerated frame (invert it to select the edited region, as
    `scripts/edit_trained.py` does with ``~edit_mask``).
    """
    sr = wrapper.target_sample_rate
    hop = wrapper.hop_length

    audio = np.asarray(audio, dtype=np.float32).reshape(-1)
    clip_seconds = len(audio) / sr
    spans: list[tuple[float, float]] = []
    prev_end = 0.0
    for start, end in edit_spans_seconds:
        start, end = max(start, prev_end), min(end, clip_seconds)
        if end <= start:
            raise ValueError(
                f"edit span ({start:.3f}, {end:.3f}) is empty after clamping to "
                f"the {clip_seconds:.3f}s clip and the previous span's end "
                f"({prev_end:.3f}); spans must be ascending, non-overlapping and "
                "inside the clip"
            )
        spans.append((start, end))
        prev_end = end

    parts: list[np.ndarray] = []
    edit_mask_parts: list[np.ndarray] = []
    offset = 0.0
    for i, (start, end) in enumerate(spans):
        fixed = fix_durations_seconds[i] if fix_durations_seconds else end - start
        keep = audio[int(offset * sr): int(start * sr)]
        parts.append(keep)
        edit_mask_parts.append(np.ones(len(keep) // hop + 1, bool))
        span_frames = int(fixed * sr / hop)
        parts.append(np.zeros(span_frames * hop, np.float32))
        edit_mask_parts.append(np.zeros(span_frames, bool))
        offset = end
    tail = audio[int(offset * sr):]
    parts.append(tail)
    edit_mask_parts.append(np.ones(len(tail) // hop + 1, bool))

    wave = np.concatenate(parts)
    n_frames = len(wave) // hop
    wave = wave[: n_frames * hop]
    edit_mask = np.concatenate(edit_mask_parts)[:n_frames]

    mel = wrapper._mel_jit(jnp.asarray(wave[None])).swapaxes(1, 2)[:, :n_frames]

    tokens = convert_char_to_pinyin([target_text]) if use_pinyin else [list(target_text)]
    bucket = pick_bucket(n_frames + 1, wrapper.duration_buckets)
    text_ids = list_str_to_idx(tokens, wrapper.vocab_char_map,
                               pad_to=pick_bucket(len(tokens[0]), wrapper.text_buckets))

    key = jax.random.key(seed if seed is not None else 0)
    out = wrapper.cfm.sample(
        wrapper.params,
        mel,
        jnp.asarray(text_ids),
        jnp.asarray([n_frames]),
        jnp.asarray([n_frames]),
        key,
        steps=nfe_step,
        cfg_strength=cfg_strength,
        sway_sampling_coef=sway_sampling_coef,
        max_duration=bucket,
        edit_mask=jnp.asarray(edit_mask[None]),
    )
    out_wave = wrapper._vocode_jit(out.swapaxes(1, 2))
    # fetch whole buffer then trim on host (eager device slices cost ~20 ms
    # of un-jitted dispatch each through the axon tunnel)
    wave_np = np.asarray(out_wave)[0, : n_frames * hop].astype(np.float32)
    if return_mel:
        return wave_np, np.asarray(out)[0, :n_frames].T, edit_mask
    return wave_np


def parse_spans(text: str) -> list[tuple[float, float]]:
    """``"1.5:2.7,4.0:4.8"`` -> [(1.5, 2.7), (4.0, 4.8)] (CLI span syntax)."""
    spans = []
    for piece in text.split(","):
        start, _, end = piece.partition(":")
        if not _:
            raise ValueError(f"span {piece!r} must be start:end seconds")
        spans.append((float(start), float(end)))
    return spans


def main(argv=None):
    """CLI for the reference's hardcoded edit script
    (`src/f5_tts/infer/speech_edit.py` sets the clip/texts/spans as module
    constants; here they are flags)."""
    import argparse

    from eraxvif5tts_tpu.audio.io import read_wav, write_wav
    from eraxvif5tts_tpu.audio.resample import resample

    p = argparse.ArgumentParser(prog="eraxvif5tts-speech-edit")
    p.add_argument("-m", "--model", default="F5TTS_v1_Base")
    p.add_argument("-p", "--ckpt_file", default=None)
    p.add_argument("-v", "--vocab_file", default=None)
    p.add_argument("--vocoder_ckpt", default=None)
    p.add_argument("-a", "--audio", required=True, help="clip to edit (wav)")
    p.add_argument("--original_text", required=True)
    p.add_argument("--target_text", required=True)
    p.add_argument("--spans", required=True,
                   help='edit spans in seconds: "start:end[,start:end...]"')
    p.add_argument("--fix_durations", default=None,
                   help="comma-separated replacement span lengths in seconds")
    p.add_argument("--nfe_step", type=int, default=32)
    p.add_argument("--cfg_strength", type=float, default=2.0)
    p.add_argument("--sway_sampling_coef", type=float, default=-1.0)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--no_pinyin", action="store_true")
    p.add_argument("-o", "--output", default="tests/speech_edit_out.wav")
    args = p.parse_args(argv)

    wrapper = F5TTSWrapper(model_name=args.model, ckpt_path=args.ckpt_file,
                           vocab_file=args.vocab_file,
                           vocoder_ckpt_path=args.vocoder_ckpt)
    wave, sr = read_wav(args.audio)
    # read_wav returns [channels, t]; downmix BEFORE any reshape — a stereo
    # clip fed straight to edit_speech's reshape(-1) would concatenate both
    # channels and silently double the timeline under the span math
    wave = wave.mean(axis=0)
    if sr != wrapper.target_sample_rate:
        wave = resample(wave, sr, wrapper.target_sample_rate)
    fixes = ([float(x) for x in args.fix_durations.split(",")]
             if args.fix_durations else None)
    out = edit_speech(
        wrapper, wave, args.original_text, args.target_text,
        parse_spans(args.spans), fix_durations_seconds=fixes,
        nfe_step=args.nfe_step, cfg_strength=args.cfg_strength,
        sway_sampling_coef=args.sway_sampling_coef, seed=args.seed,
        use_pinyin=not args.no_pinyin,
    )
    import os

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    write_wav(args.output, out, wrapper.target_sample_rate)
    print(args.output)
    return args.output


if __name__ == "__main__":
    main()
