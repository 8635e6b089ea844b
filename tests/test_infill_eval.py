"""The offline infill battery (`python -m eraxvif5tts_tpu.eval infill`):
per-(utterance, seed) cells, arm summaries, seed scheme continuity."""

import numpy as np
import pytest

import jax

from eraxvif5tts_tpu.configs import ArchConfig
from eraxvif5tts_tpu.eval.infill import (
    _cell_key,
    _summarize,
    corpus_vocab,
    evaluate_arm,
    ltas_corr,
)
from eraxvif5tts_tpu.models.cfm import CFM
from eraxvif5tts_tpu.models.dit import DiT


@pytest.fixture(scope="module")
def tiny_arm():
    arch = ArchConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2,
                      text_dim=32, conv_layers=0, dropout=0.0)
    dit = DiT(arch=arch, text_num_embeds=16, mel_dim=100)
    cfm = CFM(transformer=dit)
    params = cfm.init_params(jax.random.key(0))
    rng = np.random.default_rng(0)
    rows = [
        {"text": "ab ba", "duration": 1.0,
         "mel_spec": rng.standard_normal((40, 100)).astype(np.float32)},
        {"text": "ba ab", "duration": 1.2,
         "mel_spec": rng.standard_normal((48, 100)).astype(np.float32)},
    ]
    vocab = corpus_vocab(rows)
    return cfm, params, rows, vocab


def test_evaluate_arm_grid(tiny_arm, tmp_path):
    cfm, params, rows, vocab = tiny_arm
    cells = evaluate_arm(cfm, params, rows, vocab, seeds=2, steps=2,
                         arm="t", save_dir=str(tmp_path))
    assert len(cells) == 4  # 2 utts x 2 seeds
    assert {(c["utt"], c["seed"]) for c in cells} == {(0, 0), (0, 1), (1, 0), (1, 1)}
    for c in cells:
        assert np.isfinite(c["infill_mel_l1"])
        assert -1.0 <= c["ltas_corr_gen"] <= 1.0 and -1.0 <= c["ltas_corr_full"] <= 1.0
    # seed 0 mels saved for inspection
    assert (tmp_path / "t_utt0.npy").exists()
    assert (tmp_path / "t_utt1.npy").exists()

    summary = _summarize(cells)
    assert summary["infill_mel_l1"]["n"] == 4
    assert summary["infill_mel_l1"]["sd"] >= 0.0

    # different seeds produce different generations (the grid is not degenerate)
    m0 = np.load(tmp_path / "t_utt0.npy")
    assert m0.shape[1] == rows[0]["mel_spec"].shape[0]
    l1_by_seed = {c["seed"]: c["infill_mel_l1"] for c in cells if c["utt"] == 0}
    assert l1_by_seed[0] != l1_by_seed[1]


def test_cell_key_seed0_matches_round4_artifacts():
    """seed 0 must reproduce `scripts/synthesize_trained.py`'s key(7 + i) so
    the new battery's seed-0 cells are directly comparable to the round-4 n=3
    artifacts."""
    for i in range(3):
        a = jax.random.key_data(_cell_key(i, 0))
        b = jax.random.key_data(jax.random.key(7 + i))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and distinct across seeds
    a = jax.random.key_data(_cell_key(0, 1))
    assert not np.array_equal(np.asarray(a),
                              np.asarray(jax.random.key_data(_cell_key(0, 0))))


def test_ltas_corr_properties():
    rng = np.random.default_rng(1)
    m = rng.standard_normal((100, 50)).astype(np.float32)
    assert ltas_corr(m, m) == pytest.approx(1.0, abs=1e-6)
    assert ltas_corr(m, -m) == pytest.approx(-1.0, abs=1e-6)


def test_infill_subcommand_registered():
    from eraxvif5tts_tpu.eval.__main__ import _parser

    help_text = _parser().format_help()
    assert "infill" in help_text
