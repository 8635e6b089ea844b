"""Wrapper end-to-end with a reference-layout checkpoint file: the full load path
(depth/vocab inference from keys, EMA stripping, importer) plus profiling utils."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eraxvif5tts_tpu.compression.convert import dit_params_to_torch
from eraxvif5tts_tpu.compression.pruner import save_state_dict
from eraxvif5tts_tpu.configs import ArchConfig, ModelConfig
from eraxvif5tts_tpu.infer.wrapper import F5TTSWrapper
from eraxvif5tts_tpu.models.dit import DiT
from eraxvif5tts_tpu.profiling import RTFMeter, force_sync

ARCH = ArchConfig(dim=32, depth=3, heads=2, dim_head=16, ff_mult=2, text_dim=16,
                  conv_layers=1, dropout=0.0)
VOCAB_CHARS = list(" abcdefghij.")


def _make_ckpt(tmp_path, ema_prefix: bool):
    dit = DiT(arch=ARCH, text_num_embeds=len(VOCAB_CHARS), mel_dim=100)
    params = jax.jit(dit.init)(
        jax.random.key(0), jnp.zeros((1, 8, 100)), jnp.zeros((1, 8, 100)),
        jnp.zeros((1, 4), jnp.int32), jnp.zeros((1,)),
    )["params"]
    sd = dit_params_to_torch(params, depth=ARCH.depth, conv_layers=ARCH.conv_layers)
    if ema_prefix:
        sd = {f"ema_model.{k}": v for k, v in sd.items()}
        sd["initted"] = np.asarray(True)
        sd["step"] = np.asarray(100)
    path = str(tmp_path / ("ema.safetensors" if ema_prefix else "plain.safetensors"))
    save_state_dict(sd, path)
    return path, params


@pytest.mark.parametrize("ema_prefix", [False, True])
def test_wrapper_loads_reference_checkpoint(tmp_path, ema_prefix):
    path, params = _make_ckpt(tmp_path, ema_prefix)
    vocab = {c: i for i, c in enumerate(VOCAB_CHARS)}
    # deliberately wrong depth in config: must be fixed up from the checkpoint
    cfg = ModelConfig(arch=ArchConfig(dim=32, depth=22, heads=2, dim_head=16,
                                      ff_mult=2, text_dim=16, conv_layers=1,
                                      dropout=0.0))
    w = F5TTSWrapper(model_cfg=cfg, ckpt_path=path, vocab_char_map=vocab,
                     nfe_step=2, duration_buckets=(64,), text_buckets=(64,))
    assert w.config.arch.depth == ARCH.depth  # inferred from checkpoint keys
    # loaded weights == original params
    np.testing.assert_allclose(
        np.asarray(w.params["block_2"]["attn"]["to_q"]["kernel"]),
        np.asarray(params["block_2"]["attn"]["to_q"]["kernel"]),
    )
    # and it generates
    t = np.arange(24000 // 4) / 24000
    ref = w.preprocess_reference(ref_audio=(0.2 * np.sin(2 * np.pi * 150 * t)).astype(np.float32),
                                 ref_sample_rate=24000, ref_text="abc def")
    wave = w.generate("hi.", ref=ref, nfe_step=2, seed=0, return_numpy=True,
                      use_pinyin=False)
    assert len(wave) > 0 and np.isfinite(wave).all()


def test_rtf_meter_and_force_sync():
    meter = RTFMeter(sample_rate=24000)
    meter.start_request()
    meter.record_chunk(24000)
    meter.record_chunk(24000)
    meter.end_request()
    s = meter.summary()
    assert s["audio_seconds"] == 2.0 and s["requests"] == 1
    assert s["first_chunk_p50_ms"] is not None
    force_sync(jnp.ones((4, 4)))  # must not raise


def test_wrapper_rejects_oversized_vocab(tmp_path):
    """A vocab larger than the checkpoint's text-embedding table must raise —
    out-of-range ids gather garbage SILENTLY on TPU (all-NaN mel, no crash)."""
    path, _ = _make_ckpt(tmp_path, ema_prefix=False)
    cfg = ModelConfig(arch=ARCH)
    big_vocab = {chr(97 + i // 26) + chr(97 + i % 26): i for i in range(500)}
    with pytest.raises(ValueError, match="text embedding"):
        F5TTSWrapper(model_cfg=cfg, ckpt_path=path, vocab_char_map=big_vocab)


def test_wrapper_loads_own_orbax_training_checkpoint(tmp_path):
    """F5TTSWrapper(ckpt_path=<model_* directory>) serves this framework's OWN
    trainer output (Orbax TrainState dirs, `training/trainer.py
    checkpoint_save`) — EMA weights preferred, raw params via use_ema=False.
    This is the finetune UI's Test Model path for freshly trained checkpoints."""
    from eraxvif5tts_tpu.models.cfm import CFM
    from eraxvif5tts_tpu.training.trainer import Trainer, make_optimizer

    dit = DiT(arch=ARCH, text_num_embeds=len(VOCAB_CHARS), mel_dim=100)
    cfm = CFM(transformer=dit)
    trainer = Trainer(cfm=cfm, optimizer=make_optimizer(total_updates=10),
                      checkpoint_dir=str(tmp_path))
    state = trainer.init_state(jax.random.key(0))
    # make EMA distinguishable from raw params
    state = state.replace(
        ema_params=jax.tree.map(lambda p: p + 1.0, state.params))
    path = trainer.save_checkpoint(state, meta={"epoch": 0, "batch": 0})

    vocab = {c: i for i, c in enumerate(VOCAB_CHARS)}
    cfg = ModelConfig(arch=ARCH)
    w = F5TTSWrapper(model_cfg=cfg, ckpt_path=path, vocab_char_map=vocab,
                     nfe_step=2, duration_buckets=(64, 128), text_buckets=(64,))
    emb = w.params["text_embed"]["embed"]["embedding"]
    want_ema = np.asarray(
        state.ema_params["text_embed"]["embed"]["embedding"])
    np.testing.assert_allclose(np.asarray(emb), want_ema, rtol=1e-6)

    sr = 24000
    t = np.arange(sr // 4) / sr
    w.preprocess_reference(
        ref_audio=(0.2 * np.sin(2 * np.pi * 160 * t)).astype(np.float32),
        ref_sample_rate=sr, ref_text="hi there. ")
    wav = w.generate("a test.", nfe_step=2, seed=0, return_numpy=True)
    assert len(wav) > 0 and np.isfinite(wav).all()

    w_raw = F5TTSWrapper(model_cfg=cfg, ckpt_path=path, vocab_char_map=vocab,
                         use_ema=False, nfe_step=2,
                         duration_buckets=(64, 128), text_buckets=(64,))
    raw_emb = np.asarray(w_raw.params["text_embed"]["embed"]["embedding"])
    np.testing.assert_allclose(
        raw_emb, np.asarray(state.params["text_embed"]["embed"]["embedding"]),
        rtol=1e-6)
