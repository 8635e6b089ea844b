"""Structural parity spot checks against BASELINE.md numbers + small inventory
pieces (HFDataset)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eraxvif5tts_tpu.configs import PRESETS
from eraxvif5tts_tpu.models import build_backbone
from eraxvif5tts_tpu.training.dataset import HFDataset


def _param_count(model, nt=4):
    shapes = jax.eval_shape(
        model.init, jax.random.key(0),
        jnp.zeros((1, 8, 100)), jnp.zeros((1, 8, 100)),
        jnp.zeros((1, nt), jnp.int32), jnp.zeros((1,)),
    )
    return sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))


def test_e2tts_base_param_parity():
    """E2TTS_Base (UNetT) ~= 333.2M params (BASELINE.md, reference
    `scripts/count_params_gflops.py:20-21`)."""
    n = _param_count(build_backbone(PRESETS["E2TTS_Base"], text_num_embeds=256))
    assert 326e6 < n < 340e6, f"{n/1e6:.1f}M"


def test_pruned_presets_param_ratio():
    base = _param_count(build_backbone(PRESETS["F5TTS_v1_Base"], text_num_embeds=256))
    p14 = _param_count(build_backbone(PRESETS["F5TTS_v1_Pruned_14"], text_num_embeds=256))
    p12 = _param_count(build_backbone(PRESETS["F5TTS_v1_Pruned_12"], text_num_embeds=256))
    # each DiT block is ~14.7M params
    assert (base - p14) / 8 == pytest.approx(14.7e6, rel=0.05)
    assert (base - p12) / 10 == pytest.approx(14.7e6, rel=0.05)


def test_hf_dataset_on_the_fly_mel():
    rows = [
        {"audio": {"array": np.random.default_rng(0).standard_normal(24000).astype(np.float32),
                   "sampling_rate": 24000}, "text": "one second"},
        {"audio": {"array": np.zeros(1000, np.float32), "sampling_rate": 24000},
         "text": "too short"},  # 0.04 s -> filtered, falls to neighbor
    ]

    def mel_fn(wav, sr):
        n = len(wav) // 256
        return np.zeros((n, 100), np.float32)

    ds = HFDataset(rows, mel_fn=mel_fn)
    assert len(ds) == 2
    assert ds.frame_length(0) == 24000 // 256
    s0 = ds[0]
    assert s0.mel.shape == (93, 100) and s0.text == "one second"
    s1 = ds[1]  # filtered -> wraps to row 0
    assert s1.text == "one second"
