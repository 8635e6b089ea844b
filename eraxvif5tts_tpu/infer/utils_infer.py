"""Function-level inference API, signature parity with reference
`src/f5_tts/infer/utils_infer.py`.

This is the porcelain under the CLI / socket server: ``preprocess_ref_audio_text``,
``infer_process``, ``infer_batch_process`` (with ``streaming=True`` chunk yielding),
``load_model``/``load_vocoder`` builders, plus module-level default hyperparameters
(`utils_infer.py:49-62`). Device work is delegated to :class:`F5TTSWrapper`.
"""

from __future__ import annotations

import hashlib
import tempfile
from typing import Generator, Optional

import numpy as np

from eraxvif5tts_tpu.audio.io import read_wav, write_wav
from eraxvif5tts_tpu.audio.silence import clip_reference_audio, split_on_silence
from eraxvif5tts_tpu.infer.utils import cross_fade_concat
from eraxvif5tts_tpu.infer.wrapper import F5TTSWrapper
from eraxvif5tts_tpu.text.chunk import chunk_text  # noqa: F401  (re-export parity)

# ----------------------------------------- defaults (`utils_infer.py:49-62`)
target_sample_rate = 24000
n_mel_channels = 100
hop_length = 256
win_length = 1024
n_fft = 1024
mel_spec_type = "vocos"
target_rms = 0.1
cross_fade_duration = 0.15
ode_method = "euler"
nfe_step = 32
cfg_strength = 2.0
sway_sampling_coef = -1.0
speed = 1.0
fix_duration = None
# -----------------------------------------

_ref_audio_cache: dict[str, str] = {}
_asr_pipe = None


def initialize_asr_pipeline(model_name: str = "openai/whisper-large-v3-turbo"):
    """Whisper ASR via transformers (optional; CPU torch). Reference
    `utils_infer.py:147-162`."""
    global _asr_pipe
    from transformers import pipeline

    _asr_pipe = pipeline("automatic-speech-recognition", model=model_name, device="cpu")
    return _asr_pipe


def transcribe(ref_audio: str, language: Optional[str] = None) -> str:
    global _asr_pipe
    if _asr_pipe is None:
        initialize_asr_pipeline()
    kwargs = {"task": "transcribe"}
    if language:
        kwargs["language"] = language
    return _asr_pipe(
        ref_audio, chunk_length_s=30, batch_size=128,
        generate_kwargs=kwargs, return_timestamps=False,
    )["text"].strip()


def transcribe_array_cached(wav: np.ndarray, sr: int,
                            transcribe_fn=None) -> str:
    """md5-cached transcription of an in-memory waveform.

    The array-level twin of the cache in :func:`preprocess_ref_audio_text`
    (reference `utils_infer.py:330-346`): the same reference clip is
    transcribed once per process. ``transcribe_fn(path) -> str`` may be
    injected (tests, alternative ASR backends); the default is the Whisper
    pipeline of :func:`transcribe`. Raises a loud, actionable error when no
    ASR backend can run — callers must never proceed with empty ref text.
    """
    wav = np.asarray(wav, dtype=np.float32)
    key = hashlib.md5(wav.tobytes() + str(sr).encode()).hexdigest()
    if key in _ref_audio_cache:
        return _ref_audio_cache[key]
    if transcribe_fn is None:
        transcribe_fn = transcribe
    with tempfile.NamedTemporaryFile(delete=False, suffix=".wav") as f:
        write_wav(f.name, wav, sr)
        path = f.name
    try:
        text = transcribe_fn(path).strip()
    except Exception as e:  # noqa: BLE001 — any backend failure is actionable
        raise RuntimeError(
            "reference text was empty and automatic transcription failed "
            f"({type(e).__name__}: {e}) — pass ref_text explicitly, or make "
            "the Whisper ASR backend available (transformers + "
            "openai/whisper-large-v3-turbo weights; zero-egress hosts must "
            "provide a local model via initialize_asr_pipeline)") from e
    if not text:
        raise RuntimeError(
            "automatic transcription of the reference clip returned empty "
            "text — pass ref_text explicitly")
    _ref_audio_cache[key] = text
    return text


def load_vocoder(vocoder_name: str = "vocos", is_local: bool = False,
                 local_path: str = "", **_):
    """Build a native decoder — Vocos (default) or BigVGAN — with weights from a
    local checkpoint when given (the reference downloads from HF,
    `utils_infer.py:101-139` — zero-egress environments must pass ``local_path``).

    Both return ``(vocoder, params)`` where ``vocoder`` decodes
    ``mel [b, n_mels, t]`` -> wave; BigVGAN is the functional generator from
    `models/bigvgan.py` (call as ``vocoder(params, mel)``), Vocos a flax module
    (``vocoder.apply({'params': params}, mel)``).
    """
    import jax
    import jax.numpy as jnp

    if vocoder_name == "bigvgan":
        import numpy as _np

        from eraxvif5tts_tpu.models.bigvgan import BigVGAN, load_bigvgan

        if is_local and local_path:
            return load_bigvgan(local_path)
        vocoder = BigVGAN()
        return vocoder, vocoder.init_random_params(_np.random.default_rng(0))
    if vocoder_name != "vocos":
        raise ValueError(f"unknown vocoder {vocoder_name!r} (vocos | bigvgan)")

    from eraxvif5tts_tpu.compression.convert import load_state_dict, vocos_params_from_torch
    from eraxvif5tts_tpu.models.vocos import Vocos

    vocoder = Vocos()
    if is_local and local_path:
        params = vocos_params_from_torch(load_state_dict(local_path))
    else:
        params = jax.jit(vocoder.init)(jax.random.key(0), jnp.zeros((1, 100, 8)))["params"]
    # imported leaves are host numpy; make them device-resident once
    return vocoder, jax.device_put(params)


def load_model(model_cls_name, model_cfg: dict, ckpt_path: str, vocab_file: str = "",
               use_ema: bool = True, **_) -> F5TTSWrapper:
    """Build a wrapper from an arch dict + checkpoint (reference
    `utils_infer.py:232-270`)."""
    from eraxvif5tts_tpu.configs import model_config_from_dict

    backbone = model_cls_name if isinstance(model_cls_name, str) else "DiT"
    cfg = model_config_from_dict({"backbone": backbone, "arch": dict(model_cfg)})
    return F5TTSWrapper(model_cfg=cfg, ckpt_path=ckpt_path, vocab_file=vocab_file or None,
                        use_ema=use_ema)


def preprocess_ref_audio_text(
    ref_audio_orig: str, ref_text: str, clip_short: bool = True, show_info=print,
) -> tuple[str, str]:
    """Clip/trim the reference prompt to <=12 s, transcribe if no text given, fix
    trailing punctuation. Returns (processed wav path, ref text).
    Parity: `utils_infer.py:292-360`."""
    wav, sr = read_wav(ref_audio_orig)
    wav = wav.mean(axis=0)
    wav = clip_reference_audio(wav, sr, clip_short=clip_short)

    with tempfile.NamedTemporaryFile(delete=False, suffix=".wav") as f:
        write_wav(f.name, wav, sr)
        ref_audio = f.name

    if not ref_text.strip():
        with open(ref_audio, "rb") as audio_file:
            audio_hash = hashlib.md5(audio_file.read()).hexdigest()
        if audio_hash in _ref_audio_cache:
            show_info("Using cached reference text...")
            ref_text = _ref_audio_cache[audio_hash]
        else:
            show_info("No reference text provided, transcribing reference audio...")
            ref_text = transcribe(ref_audio)
            _ref_audio_cache[audio_hash] = ref_text
    else:
        show_info("Using custom reference text...")

    if not ref_text.endswith(". ") and not ref_text.endswith("。"):
        ref_text = ref_text + " " if ref_text.endswith(".") else ref_text + ". "
    return ref_audio, ref_text


def infer_process(
    ref_audio: str,
    ref_text: str,
    gen_text: str,
    model_obj: F5TTSWrapper,
    vocoder=None,
    show_info=print,
    progress=None,
    target_rms: float = target_rms,
    cross_fade_duration: float = cross_fade_duration,
    nfe_step: int = nfe_step,
    cfg_strength: float = cfg_strength,
    sway_sampling_coef: float = sway_sampling_coef,
    speed: float = speed,
    fix_duration=None,
    seed: Optional[int] = None,
    **_,
):
    """Chunk + synthesize + cross-fade. Returns (wave, sample_rate, spectrogram).
    Parity: `utils_infer.py:366-411` (the ``max_chars`` rule lives in the wrapper).
    """
    wav, sr = read_wav(ref_audio)
    ref_state = model_obj.preprocess_reference(
        ref_audio=wav.mean(axis=0), ref_sample_rate=sr, ref_text=ref_text,
        clip_short=False,
    )
    wave, spec = model_obj.generate(
        gen_text, ref=ref_state, nfe_step=nfe_step, cfg_strength=cfg_strength,
        speed=speed, sway_sampling_coef=sway_sampling_coef, fix_duration=fix_duration,
        cross_fade_duration=cross_fade_duration, seed=seed,
        return_numpy=True, return_spectrogram=True,
    )
    return wave, model_obj.target_sample_rate, spec


def infer_batch_process(
    ref_audio: tuple[np.ndarray, int],
    ref_text: str,
    gen_text_batches: list[str],
    model_obj: F5TTSWrapper,
    vocoder=None,
    progress=None,
    target_rms: float = target_rms,
    cross_fade_duration: float = cross_fade_duration,
    nfe_step: int = nfe_step,
    cfg_strength: float = cfg_strength,
    sway_sampling_coef: float = sway_sampling_coef,
    speed: float = speed,
    fix_duration=None,
    streaming: bool = False,
    chunk_size: int = 2048,
    seed: Optional[int] = None,
    **_,
) -> Generator:
    """Per-chunk synthesis; ``streaming=True`` yields ``(wave_piece, sr)`` tuples of
    ``chunk_size`` samples, else yields one ``(wave, sr, spectrogram)``.
    Parity: `utils_infer.py:417-563`."""
    audio, sr = ref_audio
    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim == 2:
        audio = audio.mean(axis=0)
    ref_state = model_obj.preprocess_reference(
        ref_audio=audio, ref_sample_rate=sr, ref_text=ref_text, clip_short=False
    )
    sr_out = model_obj.target_sample_rate

    if streaming:
        for gen_text in gen_text_batches:
            local_speed = 0.3 if len(gen_text.encode("utf-8")) < 10 else speed
            wave = model_obj.generate(
                gen_text, ref=ref_state, nfe_step=nfe_step, cfg_strength=cfg_strength,
                speed=local_speed, sway_sampling_coef=sway_sampling_coef,
                fix_duration=fix_duration, seed=seed, return_numpy=True,
            )
            for j in range(0, len(wave), chunk_size):
                yield wave[j : j + chunk_size], sr_out
    else:
        waves, specs = [], []
        for gen_text in gen_text_batches:
            local_speed = 0.3 if len(gen_text.encode("utf-8")) < 10 else speed
            wave, spec = model_obj.generate(
                gen_text, ref=ref_state, nfe_step=nfe_step, cfg_strength=cfg_strength,
                speed=local_speed, sway_sampling_coef=sway_sampling_coef,
                fix_duration=fix_duration, seed=seed,
                return_numpy=True, return_spectrogram=True,
            )
            waves.append(wave)
            specs.append(spec)
        if waves:
            final = cross_fade_concat(waves, sr_out, cross_fade_duration)
            yield final, sr_out, np.concatenate(specs, axis=1) if specs else None
        else:
            yield None, sr_out, None


def remove_silence_for_generated_wav(filename: str) -> None:
    """Strip long silences from a generated wav in place (`utils_infer.py:569-578`)."""
    wav, sr = read_wav(filename)
    wav = wav.mean(axis=0)
    chunks = split_on_silence(wav, sr, min_silence_len=1000, silence_thresh=-50.0,
                              keep_silence=500, seek_step=10)
    merged = np.concatenate(chunks) if chunks else wav
    write_wav(filename, merged, sr)


def save_spectrogram(spectrogram: np.ndarray, path: str) -> None:
    """PNG spectrogram dump (`utils_infer.py:584-589`); matplotlib optional."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(12, 4))
        plt.imshow(spectrogram, origin="lower", aspect="auto")
        plt.colorbar()
        plt.savefig(path)
        plt.close()
    except ImportError:
        np.save(path + ".npy", spectrogram)
