"""F5TTSWrapper — the flagship zero-shot voice-cloning API.

Signature/semantics parity with the reference wrapper
(`src/f5_tts/infer/f5tts_wrapper.py:28-621`): ``__init__`` /
``preprocess_reference`` / ``generate`` / ``get_current_audio_length``, the
``max_chars = ref_bytes / ref_sec * (22 - ref_sec)`` chunking rule (`:459-461`), the
short-text speed=0.3 rule (`:473-475`), the byte-ratio duration formula (`:500-503`),
RMS normalization and cross-fade merging.

TPU-first differences:
- Reference state is an immutable ``ReferenceState`` value that can be passed
  per-call — fixing the shared-wrapper-state race the reference server has
  (SURVEY.md §5 "race detection").
- All device work (mel, DiT ODE, vocoder) runs inside jitted functions over static
  duration buckets; repeated calls hit cached executables.
- mel -> waveform happens on-device (native Vocos), no host round trip per chunk.
"""

from __future__ import annotations

import dataclasses
import os
import random as _random
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from eraxvif5tts_tpu.audio.io import read_wav, write_wav
from eraxvif5tts_tpu.audio.resample import resample
from eraxvif5tts_tpu.audio.silence import clip_reference_audio
from eraxvif5tts_tpu.compression.convert import (
    infer_depth,
    infer_text_num_embeds,
    load_state_dict,
    normalize_reference_state_dict,
    vocos_params_from_torch,
)
from eraxvif5tts_tpu.configs import PRESETS, ModelConfig, load_model_config
from eraxvif5tts_tpu.infer.utils import (
    DURATION_BUCKETS,
    TEXT_BUCKETS,
    byte_ratio_duration,
    cross_fade_concat,
    pick_bucket,
    rms_of,
)
from eraxvif5tts_tpu.models.cfm import CFM
from eraxvif5tts_tpu.models.dit import DiT
from eraxvif5tts_tpu.models.vocos import Vocos
from eraxvif5tts_tpu.text.pinyin import convert_char_to_pinyin
from eraxvif5tts_tpu.text.chunk import chunk_text
from eraxvif5tts_tpu.text.tokenizer import get_tokenizer, list_str_to_idx


# Frames of prompt-region mel kept in front of the vocoded slice so the cut
# is outside the decoder's receptive field: embed conv k7 (+-3) + 8 ConvNeXt
# dw-convs k7 (+-3 each) + ISTFT center overlap (n_fft/hop = 4) = +-31 frames.
VOCODE_MARGIN_FRAMES = 48


def _load_orbax_backbone_params(path: str, use_ema: bool = True) -> dict:
    """Backbone params from this framework's own Orbax training checkpoint
    (a ``model_*`` directory written by ``training/trainer.py checkpoint_save``,
    holding the full TrainState pytree). Restores WITHOUT a template — the
    raw pytree comes back as nested dicts — and serves the EMA weights when
    present (the weights the reference ecosystem ships too)."""
    import orbax.checkpoint as ocp

    raw = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    tree = dict(raw) if not isinstance(raw, dict) else raw
    pick = None
    if use_ema:
        ema = tree.get("ema_params")
        if ema and jax.tree_util.tree_leaves(ema):
            pick = ema
    if pick is None:
        pick = tree.get("params")
    if not pick or not jax.tree_util.tree_leaves(pick):
        raise ValueError(
            f"{path} restored but holds no 'params'/'ema_params' — not a "
            "TrainState checkpoint from this framework's trainer")
    return jax.tree.map(np.asarray, pick)


@dataclass(frozen=True)
class ReferenceState:
    """Preprocessed reference prompt. Immutable; safe to share across requests."""

    mel: jnp.ndarray  # [1, n_frames, n_mels] on device
    text: str
    n_frames: int
    audio_len_samples: int
    rms: float

    @property
    def audio_seconds(self) -> float:
        return self.audio_len_samples / 24000.0


class F5TTSWrapper:
    """Zero-shot voice cloning: reference audio+text -> arbitrary speech."""

    def __init__(
        self,
        model_name: str = "F5TTS_v1_Base",
        ckpt_path: Optional[str] = None,
        vocab_file: Optional[str] = None,
        vocab_char_map: Optional[dict[str, int]] = None,
        vocoder_ckpt_path: Optional[str] = None,
        vocoder_name: Optional[str] = None,
        vocoder_config=None,  # BigVGANConfig override (v1-base ckpts, tiny tests)
        use_ema: bool = True,
        target_rms: float = 0.1,
        target_sample_rate: int = 24000,
        hop_length: int = 256,
        # default sampling parameters (reference `f5tts_wrapper.py:192-199`)
        nfe_step: int = 32,
        cfg_strength: float = 2.0,
        sway_sampling_coef: float = -1.0,
        speed: float = 1.0,
        use_duration_predictor: bool = False,
        duration_predictor_ckpt: Optional[str] = None,
        compute_dtype: str = "float32",
        int8_validate: bool = False,
        params: Optional[dict] = None,
        vocoder_params: Optional[dict] = None,
        model_cfg: Optional[ModelConfig] = None,
        duration_buckets: tuple[int, ...] = DURATION_BUCKETS,
        text_buckets: tuple[int, ...] = TEXT_BUCKETS,
        mesh: Optional["jax.sharding.Mesh"] = None,
    ):
        # "custom" model names are yaml paths (reference `f5tts_wrapper.py:128-131`)
        if model_cfg is not None:
            cfg = model_cfg
        elif model_name in PRESETS:
            cfg = PRESETS[model_name]
        elif model_name.endswith((".yaml", ".yml")):
            cfg = load_model_config(model_name)
        else:
            raise ValueError(f"unknown model {model_name!r} (not a preset or yaml path)")

        # vocoder_name selects vocos | bigvgan and, like the reference
        # (`f5tts_wrapper.py:91,152`), overrides the model's mel frontend so
        # conditioning mels match what the vocoder was trained on. Default:
        # follow the config's mel_spec_type.
        if vocoder_name is None:
            vocoder_name = cfg.mel_spec.mel_spec_type
        if vocoder_name not in ("vocos", "bigvgan"):
            raise ValueError(f"vocoder_name must be 'vocos' or 'bigvgan', got {vocoder_name!r}")
        if vocoder_name != cfg.mel_spec.mel_spec_type:
            cfg = dataclasses.replace(
                cfg, mel_spec=dataclasses.replace(cfg.mel_spec, mel_spec_type=vocoder_name))
        self.mel_spec_type = vocoder_name

        if vocab_char_map is not None:
            self.vocab_char_map = vocab_char_map
        elif vocab_file is not None:
            self.vocab_char_map, _ = get_tokenizer(vocab_file, "custom")
        else:
            self.vocab_char_map = None

        self.target_rms = target_rms
        self.target_sample_rate = target_sample_rate
        self.hop_length = hop_length
        # UNetT packs the time embedding as an extra frame 0 (reference
        # `unett.py:215-217`), so mel buckets of 64k-1 frames give the
        # transformer a 64-aligned sequence — the Pallas serving kernel's
        # dispatch condition (`ops/attention.py use_serving_kernel`:
        # 128-aligned, or 64-aligned with a VMEM-feasible one-shot block).
        if cfg.backbone == "UNetT" and duration_buckets == DURATION_BUCKETS:
            duration_buckets = tuple(b - 1 for b in DURATION_BUCKETS)
        self.nfe_step = nfe_step
        self.cfg_strength = cfg_strength
        self.sway_sampling_coef = sway_sampling_coef
        self.speed = speed
        self.use_duration_predictor = use_duration_predictor
        self.compute_dtype = compute_dtype
        self.duration_buckets = duration_buckets
        self.text_buckets = text_buckets

        # Build model; resolve vocab size from map or checkpoint.
        sd = None
        orbax_params = None
        if ckpt_path is not None and os.path.isdir(ckpt_path):
            # this framework's OWN training output: an Orbax StandardCheckpointer
            # directory holding the full TrainState (training/trainer.py
            # checkpoint_save) — serve the EMA weights (fall back to raw params
            # for e.g. distill exports that keep ema empty)
            orbax_params = _load_orbax_backbone_params(ckpt_path, use_ema=use_ema)
            n_blocks = sum(1 for k_ in orbax_params if k_.startswith("block_"))
            if n_blocks and n_blocks != cfg.arch.depth:
                cfg = dataclasses.replace(
                    cfg, arch=dataclasses.replace(cfg.arch, depth=n_blocks))
            # embedding row 0 is the filler token (matches torch schema)
            text_num_embeds = int(
                orbax_params["text_embed"]["embed"]["embedding"].shape[0]) - 1
            if self.vocab_char_map and len(self.vocab_char_map) > text_num_embeds:
                raise ValueError(
                    f"vocab has {len(self.vocab_char_map)} tokens but the "
                    f"checkpoint's text embedding holds {text_num_embeds}")
        elif ckpt_path is not None:
            sd = normalize_reference_state_dict(load_state_dict(ckpt_path), use_ema=use_ema)
            depth = infer_depth(sd) or cfg.arch.depth
            if depth != cfg.arch.depth:
                cfg = dataclasses.replace(cfg, arch=dataclasses.replace(cfg.arch, depth=depth))
            text_num_embeds = infer_text_num_embeds(sd)
            if self.vocab_char_map and len(self.vocab_char_map) > text_num_embeds:
                # out-of-range ids gather garbage SILENTLY on TPU (all-NaN mel,
                # no crash) — fail loudly like torch's embedding would
                raise ValueError(
                    f"vocab has {len(self.vocab_char_map)} tokens but the "
                    f"checkpoint's text embedding holds {text_num_embeds} — "
                    "pass the vocab file the model was trained with (or extend "
                    "the checkpoint with compression.pruner.expand_text_embedding)"
                )
        else:
            text_num_embeds = len(self.vocab_char_map) if self.vocab_char_map else 256

        import jax.numpy as _jnp

        from eraxvif5tts_tpu.models import build_backbone

        if compute_dtype == "int8":
            # int8 W8A8 serving (opt-in): block matmuls quantized, everything
            # else bf16. 3.6x GEMM throughput on v5e (`benchmarks/quant_probe.py`).
            # All three backbones thread arch.quantized into their block
            # projections (DiT/UNetT: to_q/k/v/out + FF; MMDiT additionally the
            # *_c text-stream projections — `ops/quant._QUANT_SUFFIXES`).
            cfg = dataclasses.replace(
                cfg, arch=dataclasses.replace(cfg.arch, quantized=True))
        self.config = cfg
        cdtype = _jnp.bfloat16 if compute_dtype in ("bfloat16", "int8") else _jnp.float32
        self.transformer = build_backbone(cfg, text_num_embeds, compute_dtype=cdtype)
        self.cfm = CFM.build(self.transformer, cfg.mel_spec)
        self.mel_spec = self.cfm.mel_spec

        if params is not None:
            self.params = params
        elif orbax_params is not None:
            self.params = orbax_params
        elif sd is not None:
            from eraxvif5tts_tpu.compression.convert import backbone_params_from_torch

            self.params = backbone_params_from_torch(
                sd,
                backbone=cfg.backbone,
                depth=cfg.arch.depth,
                conv_layers=cfg.arch.conv_layers,
                qk_norm=cfg.arch.qk_norm == "rms_norm",
                long_skip=cfg.arch.long_skip_connection,
            )
        else:
            if compute_dtype == "int8":
                # init an fp32 twin to produce real (non-zero) kernels, then
                # quantize below (QuantDense's own init is int8 zeros)
                fp_cfg = dataclasses.replace(
                    cfg, arch=dataclasses.replace(cfg.arch, quantized=False))
                fp_tf = build_backbone(fp_cfg, text_num_embeds, compute_dtype=cdtype)
                self.params = CFM.build(fp_tf, cfg.mel_spec).init_params(jax.random.key(0))
            else:
                self.params = self.cfm.init_params(jax.random.key(0))
        if cfg.backbone == "DiT":
            # scan_layers models hold one stacked `blocks` subtree; checkpoint
            # exchange stays per-block (`block_N` <-> torch
            # `transformer.transformer_blocks.N.*`) — adapt whichever layout
            # arrived to what the built model expects.
            from eraxvif5tts_tpu.compression.convert import adapt_block_layout

            self.params = adapt_block_layout(self.params, cfg.arch.scan_layers)
        elif cfg.backbone == "UNetT":
            from eraxvif5tts_tpu.compression.convert import adapt_unett_layout

            self.params = adapt_unett_layout(self.params, cfg.arch.scan_layers)
        if compute_dtype == "int8" and params is None:
            from eraxvif5tts_tpu.ops.quant import quantize_params

            fp_params = self.params
            self.params = quantize_params(self.params)
            self.params = jax.tree.map(
                lambda p: p.astype(cdtype) if p.dtype == jnp.float32 and p.ndim > 1 else p,
                self.params,
            )  # bf16 for the remaining fp matrices; scales/biases stay fp32
            if int8_validate:
                # quality gate (hard error path): int8 must stay within the
                # documented divergence bound of the bf16 pipeline over the
                # same weights. Costs two short extra compiles at load.
                from eraxvif5tts_tpu.ops.quant import (
                    INT8_REL_MSE_THRESHOLD,
                    quant_divergence,
                )

                fp_cfg = dataclasses.replace(
                    cfg, arch=dataclasses.replace(cfg.arch, quantized=False))
                fp_tf = build_backbone(fp_cfg, text_num_embeds,
                                       compute_dtype=cdtype)
                report = quant_divergence(
                    CFM.build(fp_tf, cfg.mel_spec), jax.device_put(fp_params),
                    self.cfm, jax.device_put(self.params),
                    steps=8, max_duration=256)
                if not report["passes_gate"]:
                    raise ValueError(
                        f"int8 quality gate failed: rel mel-MSE "
                        f"{report['rel_mse']:.4f} > {INT8_REL_MSE_THRESHOLD} "
                        f"(lsd {report['lsd_db']:.2f} dB) — serve with "
                        "compute_dtype='bfloat16' instead, or re-run "
                        "benchmarks/quant_quality.py for the full report")
        elif compute_dtype == "bfloat16":
            self.params = jax.tree.map(lambda p: p.astype(cdtype), self.params)
        # Imported checkpoints arrive as HOST numpy leaves; without an explicit
        # device_put every jitted call re-uploads all ~670 MB of weights through
        # the device link (measured 7 s/call through the axon tunnel vs 0.5 s
        # once resident). With a mesh, shard them instead (TP rules when the
        # mesh has a model axis > 1, else replicated).
        self.mesh = mesh
        if mesh is not None:
            from eraxvif5tts_tpu.parallel.mesh import shard_params

            self.params = shard_params(mesh, self.params)
        else:
            self.params = jax.device_put(self.params)

        # vocoder follows the serving compute dtype (params stay fp32; LN stats
        # and the ISTFT head remain fp32 inside the module) — measured 'round 3,
        # the fp32 ConvNeXt stack was a significant slice of generate() wall.
        # BigVGAN (the reference's alternative vocoder, selected by
        # vocoder_name="bigvgan", `utils_infer.py:101-139`) runs fp32 like the
        # reference does (`f5tts_wrapper.py:161`); its ~25-mel-frame receptive
        # field fits inside VOCODE_MARGIN_FRAMES.
        if vocoder_name == "bigvgan":
            from eraxvif5tts_tpu.models.bigvgan import BigVGAN, bigvgan_params_from_torch

            self.vocoder = BigVGAN(vocoder_config) if vocoder_config is not None else BigVGAN()
            if vocoder_params is not None:
                self.vocoder_params = vocoder_params
            elif vocoder_ckpt_path is not None:
                raw = load_state_dict(vocoder_ckpt_path)
                self.vocoder_params = bigvgan_params_from_torch(raw, self.vocoder.config)
            else:
                self.vocoder_params = self.vocoder.init_random_params(
                    np.random.default_rng(1))
            _vocoder = self.vocoder
            self._vocoder_apply = lambda vparams, mel: _vocoder(vparams, mel)
        else:
            self.vocoder = Vocos(
                input_channels=cfg.mel_spec.n_mel_channels,
                n_fft=cfg.mel_spec.n_fft,
                hop_length=cfg.mel_spec.hop_length,
                dtype=cdtype,
            )
            if vocoder_params is not None:
                self.vocoder_params = vocoder_params
            elif vocoder_ckpt_path is not None:
                self.vocoder_params = vocos_params_from_torch(load_state_dict(vocoder_ckpt_path))
            else:
                self.vocoder_params = jax.jit(self.vocoder.init)(
                    jax.random.key(1), jnp.zeros((1, cfg.mel_spec.n_mel_channels, 8))
                )["params"]
            _vocoder = self.vocoder
            self._vocoder_apply = lambda vparams, mel: _vocoder.apply(
                {"params": vparams}, mel)
        if mesh is not None:
            from eraxvif5tts_tpu.parallel.mesh import replicated

            self.vocoder_params = jax.device_put(self.vocoder_params,
                                                 replicated(mesh))
        else:
            self.vocoder_params = jax.device_put(self.vocoder_params)

        self.duration_predictor = None
        self.duration_predictor_params = None
        if duration_predictor_ckpt is not None:
            from eraxvif5tts_tpu.models.duration import load_duration_predictor

            self.duration_predictor, self.duration_predictor_params, self.phoneme_map = (
                load_duration_predictor(duration_predictor_ckpt)
            )
            self.duration_predictor_params = jax.device_put(self.duration_predictor_params)

        self._mel_jit = jax.jit(self.mel_spec.__call__)
        self._vocode_jit = jax.jit(
            lambda mel: self._vocoder_apply(self.vocoder_params, mel)
        )

        # Fused sample+vocode: ONE jit region per bucket so text -> waveform is a
        # single device dispatch (one round-trip instead of two). RMS un-normalization
        # happens on-device and the wave is returned as int16 PCM — 4x less
        # device->host traffic (the final output format is 16-bit PCM anyway).
        # ``vocode_start`` (static, = ref_frames - margin) skips vocoding the
        # prompt region whose waveform is discarded anyway — the reference
        # decodes the full mel then slices (`f5tts_wrapper.py:519-524`); the
        # margin keeps the conv receptive field + ISTFT overlap intact at the
        # cut so the kept region is numerically unchanged.
        def _sample_vocode(params, vparams, cond, text, duration, lens, key,
                           rms_scale, steps, cfg_strength, sway, max_duration,
                           vocode_start=0, gen_start=0):
            mel = self.cfm.sample(
                params, cond, text, duration, lens, key,
                steps=steps, cfg_strength=cfg_strength,
                sway_sampling_coef=sway, max_duration=max_duration,
            )
            wave = self._vocoder_apply(vparams, mel[:, vocode_start:].swapaxes(1, 2))
            wave = wave * rms_scale
            pcm = jnp.clip(wave, -1.0, 1.0) * 32767.0
            # ``gen_start`` (static, = ref_frames - vocode_start) drops the
            # margin frames in-graph so the host can fetch the returned buffer
            # with ONE blocking np.asarray and trim end-side in numpy — an
            # eager device-array slice on the host costs ~20 ms of un-jitted
            # dispatch through the axon tunnel (CLAUDE.md), per chunk.
            return pcm[:, gen_start * self.hop_length:].astype(jnp.int16), mel

        self._sample_vocode_jit = jax.jit(
            _sample_vocode,
            static_argnames=("steps", "cfg_strength", "sway", "max_duration",
                             "vocode_start", "gen_start"),
        )
        self.ref: Optional[ReferenceState] = None
        self._last_wave: Optional[np.ndarray] = None

    def _dispatch_sample_vocode(self, *args, **kwargs):
        """Jit dispatch with the pad-to-128 self-heal for 64-aligned buckets.

        Compilation happens synchronously at dispatch; if Mosaic rejects the
        64-only-aligned one-shot attention layout, flip the pad64 fallback
        (exact numerics) and retry once — see `ops/attention.maybe_force_pad64`.
        """
        try:
            return self._sample_vocode_jit(*args, **kwargs)
        except Exception as exc:  # pragma: no cover - toolchain dependent
            from eraxvif5tts_tpu.ops.attention import maybe_force_pad64

            if maybe_force_pad64(exc, int(kwargs.get("max_duration", 0))):
                return self._sample_vocode_jit(*args, **kwargs)
            raise

    # ------------------------------------------------------------------

    def preprocess_reference(
        self,
        ref_audio_path: Optional[str] = None,
        ref_text: str = "",
        clip_short: bool = True,
        ref_audio: Optional[np.ndarray] = None,
        ref_sample_rate: Optional[int] = None,
        transcribe_fn=None,
    ) -> ReferenceState:
        """Load + clip + normalize the reference prompt, compute its mel on device.

        Parity: reference `f5tts_wrapper.py:256-354` (12 s clipping cascade, edge
        trimming, RMS normalization, resampling, trailing-punctuation fixup).
        Empty ``ref_text`` auto-transcribes the clip like the reference wrapper
        (`f5tts_wrapper.py:313-315`), through the md5-keyed cache of
        ``utils_infer.transcribe_array_cached`` — and raises a loud error when
        no ASR backend is available, because the byte-ratio duration and
        ``max_chars`` formulas degrade on zero reference bytes.
        ``transcribe_fn(path) -> str`` overrides the default Whisper backend.
        """
        if ref_audio is None:
            if ref_audio_path is None:
                raise ValueError("need ref_audio_path or ref_audio")
            wav, sr = read_wav(ref_audio_path)
            wav = wav.mean(axis=0)  # downmix
        else:
            wav = np.asarray(ref_audio, dtype=np.float32).reshape(-1)
            sr = ref_sample_rate or self.target_sample_rate

        wav = clip_reference_audio(wav, sr, clip_short=clip_short)

        rms = rms_of(wav)
        if rms < self.target_rms and rms > 0:
            wav = wav * (self.target_rms / rms)
        if sr != self.target_sample_rate:
            wav = resample(wav, sr, self.target_sample_rate)

        if not ref_text.strip():
            from eraxvif5tts_tpu.infer.utils_infer import transcribe_array_cached

            ref_text = transcribe_array_cached(
                wav, self.target_sample_rate, transcribe_fn=transcribe_fn)
        if ref_text and not ref_text.endswith(". ") and not ref_text.endswith("。"):
            ref_text = ref_text + " " if ref_text.endswith(".") else ref_text + ". "

        # Trim to a whole number of hops so mel frames align exactly.
        n_frames = len(wav) // self.hop_length
        wav = wav[: n_frames * self.hop_length]
        mel = self._mel_jit(jnp.asarray(wav[None]))  # [1, n_mels, n+1]
        mel = mel.swapaxes(1, 2)[:, :n_frames]  # [1, n_frames, n_mels]

        state = ReferenceState(
            mel=mel,
            text=ref_text,
            n_frames=n_frames,
            audio_len_samples=len(wav),
            rms=rms,
        )
        self.ref = state
        return state

    # ------------------------------------------------------------------

    def warmup(self, ref: Optional[ReferenceState] = None,
               nfe_step: Optional[int] = None,
               buckets: Optional[tuple[int, ...]] = None,
               text_buckets: Optional[tuple[int, ...]] = None) -> list[tuple[int, int]]:
        """Pre-compile serving executables so no user request pays a cold
        compile (each (duration bucket, text bucket, steps, vocode_start)
        tuple is its own XLA program; remote compiles through the tunnel run
        1–10 min uncached — set JAX_COMPILATION_CACHE_DIR to persist them).

        Warms every reachable duration bucket × the text bucket a typical
        chunk for this reference hits (pass ``text_buckets`` to widen).
        Returns the warmed (duration_bucket, text_bucket) pairs. The socket
        server warms its single first-package path like the reference
        (`socket_server.py:121-135`); this is the ladder-wide version behind
        the HTTP server's --warmup flag.
        """
        ref = ref or self.ref
        if ref is None:
            raise RuntimeError("call preprocess_reference() first or pass ref=")
        # Warm the HOST text frontend and the eager PRNG path too: generate()
        # runs convert_char_to_pinyin (jieba's first call loads/builds its
        # ~9 MB marshaled dictionary — measured ~1.2 s warm-cache / ~10 s on a
        # cold page cache on a 1-core host) and jax.random.fold_in (first
        # eager dispatch compiles a tiny executable, ~0.5 s through a remote-
        # compile tunnel). Without this the first user request pays ~2-12 s
        # of host cold-start that no XLA warmup covers.
        convert_char_to_pinyin([ref.text + " warmup."])
        np.asarray(
            jax.random.key_data(jax.random.fold_in(jax.random.key(0), 0))[:1])
        if text_buckets is None:
            # the range of buckets generate() can actually pick, derived the
            # same way it tokenizes — pinyin tokens of ref.text + chunk — from
            # the shortest chunk up to a full max_chars chunk (a byte-count
            # heuristic undershot this and left the first real request a cold
            # compile despite --warmup)
            max_chars, _ = self._max_chars_for(ref)
            lo = pick_bucket(len(convert_char_to_pinyin([ref.text])[0]) + 2,
                             self.text_buckets)
            hi = pick_bucket(
                len(convert_char_to_pinyin([ref.text + "x" * max_chars])[0]),
                self.text_buckets)
            text_buckets = tuple(tb for tb in self.text_buckets
                                 if lo <= tb <= hi)
        nfe = nfe_step if nfe_step is not None else self.nfe_step
        vstart = max(ref.n_frames - VOCODE_MARGIN_FRAMES, 0)
        rms_scale = ref.rms / self.target_rms if 0 < ref.rms < self.target_rms else 1.0
        warmed = []
        # exact reachability: generate() picks pick_bucket(duration) with
        # duration >= ref.n_frames + 1, so every bucket from
        # pick_bucket(ref.n_frames + 1) up is reachable
        min_bucket = pick_bucket(ref.n_frames + 1, self.duration_buckets)
        for bucket in buckets or self.duration_buckets:
            if bucket < min_bucket:
                continue  # unreachable: prompt alone overfills the bucket
            for tb in text_buckets:
                text_ids = np.full((1, tb), -1, np.int32)
                text_ids[0, 0] = 0
                pcm, _ = self._dispatch_sample_vocode(
                    self.params, self.vocoder_params, ref.mel,
                    jnp.asarray(text_ids), jnp.asarray([bucket]),
                    jnp.asarray([ref.n_frames]), jax.random.key(0),
                    jnp.asarray(rms_scale, jnp.float32),
                    steps=nfe, cfg_strength=float(self.cfg_strength),
                    sway=(float(self.sway_sampling_coef)
                          if self.sway_sampling_coef is not None else None),
                    max_duration=bucket, vocode_start=vstart,
                    gen_start=ref.n_frames - vstart,
                )
                np.asarray(pcm[:1, :1])  # block until compiled + run
                warmed.append((bucket, tb))
        return warmed

    def _max_chars_for(self, ref: ReferenceState) -> tuple[int, int]:
        """Chunking rule (`f5tts_wrapper.py:459-461`): (max_chars, hard cap).

        Capped so ref-text tokens + chunk tokens always fit the largest text
        bucket (each sample tokenizes ref.text + chunk; UTF-8 bytes bound the
        pinyin token count) — an unbreakable over-budget token is hard-split
        by chunk_text rather than erroring at list_str_to_idx.
        """
        ref_sec = max(ref.audio_seconds, 1e-3)
        ref_bytes = len(ref.text.encode("utf-8"))
        max_chars = int(ref_bytes / ref_sec * max(22.0 - ref_sec, 1.0))
        bucket_budget = max(self.text_buckets[-1] - ref_bytes - 2, 16)
        return min(max(max_chars, 16), bucket_budget), bucket_budget

    def _duration_for(self, ref: ReferenceState, gen_text: str, speed: float,
                      fix_duration: Optional[float]) -> int:
        if fix_duration is not None:
            return int(fix_duration * self.target_sample_rate / self.hop_length)
        if self.use_duration_predictor and self.duration_predictor is not None:
            from eraxvif5tts_tpu.models.duration import predict_duration_frames

            frames = predict_duration_frames(
                self.duration_predictor, self.duration_predictor_params,
                self.phoneme_map, gen_text,
            )
            if frames > 0:
                return ref.n_frames + int(frames / speed)
        return byte_ratio_duration(
            ref.n_frames, ref.text, gen_text, speed,
            hop_length=self.hop_length, sample_rate=self.target_sample_rate,
        )

    def generate(
        self,
        text: str,
        output_path: Optional[str] = None,
        ref: Optional[ReferenceState] = None,
        nfe_step: Optional[int] = None,
        cfg_strength: Optional[float] = None,
        speed: Optional[float] = None,
        sway_sampling_coef: Optional[float] = None,
        fix_duration: Optional[float] = None,
        cross_fade_duration: float = 0.15,
        seed: Optional[int] = None,
        return_numpy: bool = False,
        return_spectrogram: bool = False,
        use_pinyin: bool = True,
    ):
        """Synthesize ``text`` in the reference voice.

        Returns the output path (when ``output_path`` given), else the waveform numpy
        array (and optionally the mel spectrogram).
        """
        ref = ref or self.ref
        if ref is None:
            raise RuntimeError("call preprocess_reference() first or pass ref=")
        nfe_step = nfe_step if nfe_step is not None else self.nfe_step
        cfg_strength = cfg_strength if cfg_strength is not None else self.cfg_strength
        speed = speed if speed is not None else self.speed
        sway = sway_sampling_coef if sway_sampling_coef is not None else self.sway_sampling_coef

        max_chars, bucket_budget = self._max_chars_for(ref)
        chunks = chunk_text(text, max_chars=max_chars, hard_max=bucket_budget)

        key = jax.random.key(seed if seed is not None else _random.randrange(2**31))

        waves: list[np.ndarray] = []
        mels: list[np.ndarray] = []
        # Chunk device calls are dispatched asynchronously and fetched AFTER
        # the next chunk's call is in flight, so the PCM device->host download
        # of chunk N overlaps chunk N+1's compute (the fetch is a fixed ~26 ms
        # round trip through the axon tunnel, benchmarks/wrapper_latency_split.py).
        # The queue is bounded so a very long text holds at most a few pcm+mel
        # buffers on device.
        pending: list[tuple] = []

        def drain_one():
            pcm, out, n_samples, n_frames, dur = pending.pop(0)
            # one blocking transfer of the whole (gen-region-only) int16 buffer,
            # end-trim on host — no eager device-side slice op
            wave_np = np.asarray(pcm)[0, :n_samples].astype(np.float32) / 32767.0
            waves.append(wave_np)
            if return_spectrogram:
                mels.append(np.asarray(out)[0, n_frames:dur].T)

        for chunk_i, chunk in enumerate(chunks):
            local_speed = 0.3 if len(chunk.encode("utf-8")) < 10 else speed
            full_text = ref.text + chunk
            tokens = (
                convert_char_to_pinyin([full_text])
                if use_pinyin
                else [list(full_text)]
            )
            if self.vocab_char_map is None:
                raise RuntimeError("wrapper needs a vocab (vocab_file/vocab_char_map)")

            duration = self._duration_for(ref, chunk, local_speed, fix_duration)
            duration = max(duration, ref.n_frames + 1)
            bucket = pick_bucket(max(duration, ref.n_frames + 1), self.duration_buckets)
            text_bucket = pick_bucket(len(tokens[0]), self.text_buckets)
            text_ids = list_str_to_idx(tokens, self.vocab_char_map, pad_to=text_bucket)

            rms_scale = ref.rms / self.target_rms if 0 < ref.rms < self.target_rms else 1.0
            vstart = max(ref.n_frames - VOCODE_MARGIN_FRAMES, 0)
            pcm, out = self._dispatch_sample_vocode(
                self.params,
                self.vocoder_params,
                ref.mel,
                jnp.asarray(text_ids),
                jnp.asarray([min(duration, bucket)]),
                jnp.asarray([ref.n_frames]),
                # fresh noise per chunk (the reference draws new randomness
                # for every chunk too); the fold keeps chunk 0 of a 1-chunk
                # request distinct from the shared key only via chunk_i=0,
                # and the whole request reproducible from `seed`
                jax.random.fold_in(key, chunk_i),
                jnp.asarray(rms_scale, jnp.float32),
                steps=nfe_step,
                cfg_strength=float(cfg_strength),
                sway=float(sway) if sway is not None else None,
                max_duration=bucket,
                vocode_start=vstart,
                gen_start=ref.n_frames - vstart,
            )  # pcm [1, (bucket-ref_frames)*hop] int16, mel [1, bucket, n_mels]
            n_samples = (min(duration, bucket) - ref.n_frames) * self.hop_length
            pending.append((pcm, out, n_samples, ref.n_frames,
                            min(duration, bucket)))
            if len(pending) > 3:
                drain_one()
        while pending:
            drain_one()

        final = cross_fade_concat(waves, self.target_sample_rate, cross_fade_duration)
        self._last_wave = final

        if output_path is not None:
            write_wav(output_path, final, self.target_sample_rate)
            if return_spectrogram and mels:
                return output_path, np.concatenate(mels, axis=1)
            return output_path
        if return_spectrogram and mels:
            return final, np.concatenate(mels, axis=1)
        if return_numpy:
            return final
        return final

    # ------------------------------------------------------------------

    def generate_batch(
        self,
        texts: list[str],
        ref: Optional[ReferenceState] = None,
        nfe_step: Optional[int] = None,
        cfg_strength: Optional[float] = None,
        speed: Optional[float] = None,
        sway_sampling_coef: Optional[float] = None,
        seed: Optional[int] = None,
        use_pinyin: bool = True,
    ) -> list[np.ndarray]:
        """Synthesize several utterances in ONE padded device batch.

        Throughput-oriented serving beyond the reference (which threads over chunks
        one at a time, `utils_infer.py:510-517`): all utterances share one
        (batch, bucket) jit, the per-sample duration/mask machinery handles the
        ragged lengths. Returns one waveform per input text.
        """
        ref = ref or self.ref
        if ref is None:
            raise RuntimeError("call preprocess_reference() first or pass ref=")
        if not texts:
            return []
        nfe_step = nfe_step if nfe_step is not None else self.nfe_step
        cfg_strength = cfg_strength if cfg_strength is not None else self.cfg_strength
        speed = speed if speed is not None else self.speed
        sway = sway_sampling_coef if sway_sampling_coef is not None else self.sway_sampling_coef

        token_lists = []
        durations = []
        for text in texts:
            local_speed = 0.3 if len(text.encode("utf-8")) < 10 else speed
            full = ref.text + text
            tokens = convert_char_to_pinyin([full])[0] if use_pinyin else list(full)
            token_lists.append(tokens)
            durations.append(max(self._duration_for(ref, text, local_speed, None),
                                 ref.n_frames + 1))

        bucket = pick_bucket(max(durations), self.duration_buckets)
        text_bucket = pick_bucket(max(len(t) for t in token_lists), self.text_buckets)
        text_ids = list_str_to_idx(token_lists, self.vocab_char_map, pad_to=text_bucket)
        b = len(texts)

        # Multi-chip serving: pad the batch to a multiple of the data axis and
        # shard the batched inputs over it — GSPMD partitions the whole fused
        # sample+vocode jit (one utterance per chip slice, collectives only if
        # tensor parallelism is also on). Beyond the reference, which threads
        # chunks on one device (`utils_infer.py:510-517`).
        n_data = self.mesh.shape.get("data", 1) if self.mesh is not None else 1
        bp = b + (-b) % n_data
        text_arr = np.full((bp, text_bucket), -1, np.int32)
        text_arr[:b] = np.asarray(text_ids)
        dur_arr = np.full((bp,), ref.n_frames + 1, np.int32)
        dur_arr[:b] = [min(d, bucket) for d in durations]
        lens_arr = np.full((bp,), ref.n_frames, np.int32)
        cond = jnp.broadcast_to(ref.mel, (bp,) + ref.mel.shape[1:])

        key = jax.random.key(seed if seed is not None else _random.randrange(2**31))
        rms_scale = ref.rms / self.target_rms if 0 < ref.rms < self.target_rms else 1.0
        if self.mesh is not None:
            from eraxvif5tts_tpu.parallel.mesh import batch_sharding

            bs = batch_sharding(self.mesh)
            cond = jax.device_put(cond, bs)
            text_in = jax.device_put(text_arr, bs)
            dur_in = jax.device_put(dur_arr, bs)
            lens_in = jax.device_put(lens_arr, bs)
        else:
            text_in, dur_in, lens_in = map(jnp.asarray, (text_arr, dur_arr, lens_arr))
        vstart = max(ref.n_frames - VOCODE_MARGIN_FRAMES, 0)
        pcm, _ = self._dispatch_sample_vocode(
            self.params,
            self.vocoder_params,
            cond,
            text_in,
            dur_in,
            lens_in,
            key,
            jnp.asarray(rms_scale, jnp.float32),
            steps=nfe_step,
            cfg_strength=float(cfg_strength),
            sway=float(sway) if sway is not None else None,
            max_duration=bucket,
            vocode_start=vstart,
            gen_start=ref.n_frames - vstart,
        )
        pcm = np.asarray(pcm)
        out = []
        for i, d in enumerate(durations):
            wave = pcm[i, : (min(d, bucket) - ref.n_frames) * self.hop_length]
            out.append(wave.astype(np.float32) / 32767.0)
        return out

    # ------------------------------------------------------------------

    def get_current_audio_length(self) -> float:
        """Seconds of the most recently generated audio (`f5tts_wrapper.py:609-614`)."""
        if self._last_wave is None:
            return 0.0
        return len(self._last_wave) / self.target_sample_rate
