"""Shipped configs/*.yaml load through the typed config tree and agree with the
code presets of the same name (reference `configs/*.yaml` schema)."""

import glob
import os

import pytest

from eraxvif5tts_tpu.configs import PRESETS, load_model_config, load_yaml_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
YAMLS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml")))


def test_all_reference_model_names_have_a_yaml():
    names = {os.path.splitext(os.path.basename(p))[0] for p in YAMLS}
    # every named model the reference ships a training yaml for
    assert {"F5TTS_v1_Base", "F5TTS_Base", "F5TTS_Small", "E2TTS_Base",
            "E2TTS_Small", "F5TTS_v1_Pruned_12", "F5TTS_v1_Pruned_14"} <= names


@pytest.mark.parametrize("path", YAMLS, ids=[os.path.basename(p) for p in YAMLS])
def test_yaml_loads_and_matches_preset(path):
    cfg = load_yaml_config(path)
    name = os.path.splitext(os.path.basename(path))[0]
    assert cfg.model.name == name
    assert cfg.optim.learning_rate > 0 and cfg.datasets.batch_size_per_gpu > 0

    mc = load_model_config(path)
    preset = PRESETS[name]
    assert mc.backbone == preset.backbone
    for field in ("dim", "depth", "heads", "ff_mult", "text_dim",
                  "text_mask_padding", "conv_layers", "pe_attn_head"):
        assert getattr(mc.arch, field) == getattr(preset.arch, field), (name, field)
