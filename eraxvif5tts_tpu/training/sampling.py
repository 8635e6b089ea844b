"""Per-save smoke-test sample synthesis during training.

The reference synthesizes wavs from the current batch + fixed reference prompts at
every checkpoint save (`trainer.py:397-515, 1387-1419`) — listening is its test
strategy (SURVEY.md §4). Here ``make_sample_fn`` builds the ``sample_fn(state, step)``
hook the Trainer runs after each save: it samples with the EMA params at a low NFE,
writes the mel as ``.npy`` always, and decodes to a wav when a Vocos vocoder is
available.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from eraxvif5tts_tpu.infer.utils import byte_ratio_duration, pick_bucket
from eraxvif5tts_tpu.text.tokenizer import list_str_to_idx


def make_sample_fn(
    cfm,
    vocab_char_map: dict[str, int],
    prompts: Sequence[dict],
    out_dir: str,
    vocoder=None,
    vocoder_params=None,
    steps: int = 16,
    tokenize: Optional[Callable] = None,
    use_ema: bool = True,
    sample_rate: int = 24000,
    hop_length: int = 256,
) -> Callable:
    """``prompts``: dicts with ``ref_mel`` ([n, n_mels] float array), ``ref_text``,
    ``gen_text``. Returns ``sample_fn(state, step)``."""

    def sample_fn(state, step: int) -> list[str]:
        os.makedirs(out_dir, exist_ok=True)
        params = state.ema_params if use_ema else state.params
        written = []
        for i, prompt in enumerate(prompts):
            ref_mel = np.asarray(prompt["ref_mel"], np.float32)
            ref_text, gen_text = prompt["ref_text"], prompt["gen_text"]
            full_text = ref_text + " " + gen_text
            toks = tokenize(full_text) if tokenize else list(full_text)
            ids = list_str_to_idx([toks], vocab_char_map)
            ref_len = ref_mel.shape[0]
            duration = byte_ratio_duration(ref_len, ref_text, gen_text, speed=1.0,
                                           hop_length=hop_length,
                                           sample_rate=sample_rate)
            max_dur = pick_bucket(duration)
            cond = jnp.asarray(ref_mel)[None, :max_dur]
            mel = cfm.sample(
                params, cond, jnp.asarray(ids),
                jnp.asarray([duration]), jnp.asarray([min(ref_len, max_dur)]),
                jax.random.key(step), steps=steps, max_duration=max_dur,
            )
            mel_np = np.asarray(mel)[0, min(ref_len, max_dur):duration]
            base = os.path.join(out_dir, f"update_{step}_{i}")
            np.save(base + ".npy", mel_np)
            written.append(base + ".npy")
            from eraxvif5tts_tpu.audio.io import write_wav

            if vocoder is not None and vocoder_params is not None:
                wav = np.asarray(
                    vocoder.apply({"params": vocoder_params},
                                  jnp.asarray(mel_np.T)[None])
                )[0]
                write_wav(base + ".wav", wav.astype(np.float32), sample_rate)
                written.append(base + ".wav")
            else:
                # no trained vocoder available: Griffin-Lim inversion still
                # yields an audible smoke sample (the reference can only
                # listen when external Vocos weights are present)
                from eraxvif5tts_tpu.audio.griffin_lim import griffin_lim_mel

                wav = griffin_lim_mel(mel_np.T, n_iter=32,
                                      hop_length=hop_length,
                                      sample_rate=sample_rate)
                write_wav(base + ".gl.wav", wav, sample_rate)
                written.append(base + ".gl.wav")
        return written

    return sample_fn


def prompts_from_dataset(dataset, count: int = 1) -> list[dict]:
    """Fixed reference prompts drawn from the head of the dataset: the first half of
    each sample's mel is the prompt, the sample's own text is re-generated (the
    reference's in-batch smoke sample, `trainer.py:1387-1419`)."""
    prompts = []
    for i in range(min(count, len(dataset))):
        s = dataset[i]
        if s.mel is None:
            continue
        half = max(s.mel.shape[0] // 2, 1)
        text = s.text if isinstance(s.text, str) else "".join(map(str, s.text))
        prompts.append({"ref_mel": s.mel[:half], "ref_text": text, "gen_text": text})
    return prompts
