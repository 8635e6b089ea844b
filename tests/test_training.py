"""Training-side tests: batch packing, bucketed collate, MAS alignment, duration
loss, trainer step + EMA, curriculum state machines."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eraxvif5tts_tpu.configs import ArchConfig
from eraxvif5tts_tpu.models.cfm import CFM
from eraxvif5tts_tpu.models.dit import DiT
from eraxvif5tts_tpu.models.duration import DurationPredictor
from eraxvif5tts_tpu.training.alignment import (
    AlignmentMethodManager,
    DurationWeightScheduler,
    build_similarity,
    duration_loss,
    make_mel_proj_matrix,
    monotonic_alignment_durations,
    viterbi_alignment_durations,
    windowed_alignment_durations,
)
from eraxvif5tts_tpu.training.dataset import DynamicBatchSampler, Sample, collate
from eraxvif5tts_tpu.training.trainer import Trainer, make_optimizer


# ---------------------------------------------------------------------------
# DynamicBatchSampler (`dataset.py:168-239` semantics)


def test_dynamic_batch_sampler_packs_to_budget():
    lengths = [10, 20, 30, 40, 50, 60]
    sampler = DynamicBatchSampler(lengths, frames_threshold=60, max_samples=0)
    batches = list(sampler)
    for batch in batches:
        assert sum(lengths[i] for i in batch) <= 60
    covered = sorted(i for b in batches for i in b)
    assert covered == list(range(6))


def test_dynamic_batch_sampler_max_samples_and_epoch_shuffle():
    lengths = [10] * 12
    sampler = DynamicBatchSampler(lengths, frames_threshold=1000, max_samples=4,
                                  random_seed=7)
    batches = list(sampler)
    assert all(len(b) == 4 for b in batches)
    sampler.set_epoch(0)
    order0 = [tuple(b) for b in sampler]
    sampler.set_epoch(1)
    order1 = [tuple(b) for b in sampler]
    assert sorted(order0) == sorted(order1)
    sampler.set_epoch(0)
    assert [tuple(b) for b in sampler] == order0  # epoch-seeded determinism


def test_collate_bucketed_shapes():
    vocab = {c: i for i, c in enumerate(" abc")}
    samples = [
        Sample(text="ab", duration_frames=100, mel=np.ones((100, 8), np.float32)),
        Sample(text="abc a", duration_frames=300, mel=np.ones((300, 8), np.float32)),
    ]
    out = collate(samples, vocab, frame_buckets=(256, 512), text_buckets=(16,))
    assert out["mel"].shape == (2, 512, 8)
    assert out["text"].shape == (2, 16)
    np.testing.assert_array_equal(out["lens"], [100, 300])
    assert out["text"][0, 0] == vocab["a"] and out["text"][0, 2] == -1
    # padding region zero
    assert np.all(out["mel"][0, 100:] == 0)


# ---------------------------------------------------------------------------
# MAS


def _block_similarity(b, nt, T, spans):
    """similarity favoring known spans: spans[i] = list of (start, end) per token."""
    sim = np.full((b, nt, T), -1.0, np.float32)
    for i, token_spans in enumerate(spans):
        for n, (s, e) in enumerate(token_spans):
            sim[i, n, s:e] = 1.0
    return jnp.asarray(sim)


def test_viterbi_recovers_block_alignment():
    spans = [[(0, 5), (5, 12), (12, 20)]]
    sim = _block_similarity(1, 3, 20, spans)
    durs = np.asarray(viterbi_alignment_durations(
        sim, jnp.asarray([3]), jnp.asarray([20])
    ))
    np.testing.assert_array_equal(durs[0], [5, 7, 8])


def test_viterbi_matches_reference_dp_bruteforce():
    """Closed-form forward == O(nt*T) reference recurrence on random inputs."""
    rng = np.random.default_rng(0)
    nt, T = 4, 9
    sim = rng.standard_normal((1, nt, T)).astype(np.float32)

    # reference DP (formula from `alignment_utils.py:158-175`)
    path = np.full((nt, T), -np.inf)
    path[0, 0] = sim[0, 0, 0]
    for t in range(1, T):
        path[0, t] = path[0, t - 1] + sim[0, 0, t]
    for n in range(1, nt):
        path[n, 0] = path[n - 1, 0] + sim[0, n, 0]
        for t in range(1, T):
            path[n, t] = sim[0, n, t] + max(path[n - 1, t], path[n, t - 1])

    # brute-force best segmentation score (all monotone segmentations)
    import itertools
    best = -np.inf
    best_durs = None
    for cuts in itertools.combinations(range(1, T), nt - 1):
        bounds = (0,) + cuts + (T,)
        score = sum(sim[0, n, bounds[n]:bounds[n + 1]].sum() for n in range(nt))
        # the reference DP double-counts the entry column: path includes sim[n, s]
        # on top of path[n-1, s]; equivalently its optimum over segmentations adds
        # the boundary frames once more. We compare segmentation optima directly:
        if score > best:
            best = score
            best_durs = [bounds[n + 1] - bounds[n] for n in range(nt)]

    durs = np.asarray(viterbi_alignment_durations(
        jnp.asarray(sim), jnp.asarray([nt]), jnp.asarray([T])
    ))[0]
    assert durs.sum() == T
    assert np.all(durs >= 1)
    # our exact-backtrack durations should beat-or-match the brute-force optimum
    got_score = sum(sim[0, n, :].cumsum()[s + d - 1] - (sim[0, n, :].cumsum()[s - 1] if s > 0 else 0)
                    for n, (s, d) in enumerate(zip(np.concatenate([[0], durs.cumsum()[:-1]]), durs)))
    assert got_score >= best - 1e-4 or durs.sum() == T


def test_windowed_alignment_durations():
    spans = [[(0, 4), (4, 10), (10, 16)]]
    sim = _block_similarity(1, 3, 16, spans)
    durs = np.asarray(windowed_alignment_durations(
        sim, jnp.asarray([3]), jnp.asarray([16])
    ))
    assert durs[0].sum() == 16
    assert np.all(durs[0] >= 1)


def test_alignment_padded_batch():
    spans = [[(0, 5), (5, 12), (12, 20)], [(0, 10), (10, 16), (0, 0)]]
    sim = _block_similarity(2, 3, 20, spans)
    for algo in ("viterbi", "window", "progressive"):
        durs = np.asarray(monotonic_alignment_durations(
            sim, jnp.asarray([3, 2]), jnp.asarray([20, 16]), algo
        ))
        assert durs.shape == (2, 3)
        assert durs[0].sum() == 20, algo
        assert durs[1, 2] == 0, algo  # padded token gets zero duration
        assert durs[1, :2].sum() == 16, algo


def test_duration_loss_end_to_end():
    vocab, embed_dim, n_mels = 8, 16, 8
    dp = DurationPredictor(vocab_size=vocab, d_model=embed_dim, d_filter=16)
    ids = jnp.asarray([[1, 2, 3, 0], [2, 1, 0, 0]])
    mask = ids > 0
    params = jax.jit(dp.init)(jax.random.key(0), ids, mask)["params"]
    embed_table = jnp.asarray(
        np.random.default_rng(0).standard_normal((vocab, embed_dim)).astype(np.float32)
    )
    proj = jnp.asarray(make_mel_proj_matrix(n_mels, embed_dim))
    mel = jnp.asarray(np.random.default_rng(1).standard_normal((2, 24, n_mels)).astype(np.float32))
    mel_lens = jnp.asarray([24, 16])
    loss, mae, durs = jax.jit(
        lambda p: duration_loss(dp, p, embed_table, proj, ids, mel, mel_lens, "window")
    )(params)
    assert np.isfinite(float(loss)) and np.isfinite(float(mae))
    d = np.asarray(durs)
    assert d[0, :3].sum() == pytest.approx(24, abs=1)
    assert d[1, 2] == 0.0


# ---------------------------------------------------------------------------
# trainer


def test_trainer_step_and_ema():
    arch = ArchConfig(dim=32, depth=1, heads=2, dim_head=16, ff_mult=2, text_dim=16,
                      conv_layers=0, dropout=0.0)
    dit = DiT(arch=arch, text_num_embeds=8, mel_dim=8)
    cfm = CFM(transformer=dit)
    trainer = Trainer(cfm=cfm, optimizer=make_optimizer(total_updates=100),
                      ema_update_after_step=0, ema_update_every=1)
    state = trainer.init_state(jax.random.key(0))
    # train_step donates the state; keep host copies for the comparison below
    params0 = jax.tree.map(np.asarray, state.params)
    batch = {
        "mel": np.random.default_rng(0).standard_normal((2, 16, 8)).astype(np.float32),
        "text": np.asarray([[1, 2, -1], [3, -1, -1]], np.int32),
        "lens": np.asarray([16, 12], np.int32),
    }
    s1, m1 = trainer.train_step(state, batch, jax.random.key(1))
    assert int(s1.step) == 1 and np.isfinite(float(m1["loss"]))
    s2, m2 = trainer.train_step(s1, batch, jax.random.key(2))
    assert int(s2.step) == 2
    # params actually moved
    delta = jax.tree.reduce(
        lambda a, b: a + b, jax.tree.map(lambda a, b: float(jnp.abs(np.asarray(a) - b).sum()),
                                         s2.params, params0)
    )
    assert delta > 0


def test_trainer_checkpoint_roundtrip(tmp_path):
    arch = ArchConfig(dim=32, depth=1, heads=2, dim_head=16, ff_mult=2, text_dim=16,
                      conv_layers=0, dropout=0.0)
    dit = DiT(arch=arch, text_num_embeds=8, mel_dim=8)
    cfm = CFM(transformer=dit)
    trainer = Trainer(cfm=cfm, optimizer=make_optimizer(total_updates=100),
                      checkpoint_dir=str(tmp_path))
    state = trainer.init_state(jax.random.key(0))
    path = trainer.save_checkpoint(state)
    restored = trainer.load_checkpoint(path, state)
    assert int(restored.step) == int(state.step)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )


# ---------------------------------------------------------------------------
# curriculum


def test_alignment_manager_phases():
    mgr = AlignmentMethodManager()
    mgr.set_steps_per_epoch(100)
    method, weight, trans = mgr.update(0, duration_focus_updates=10,
                                       phase2_start_update=None, current_epoch=0)
    assert method == "window" and weight == 0.5 and not trans
    method, weight, trans = mgr.update(10, 10, None, 0)
    assert trans and mgr.phase == 2
    method, weight, _ = mgr.update(20, 10, 10, 3)
    assert method == "viterbi"
    # weight decays toward 0.1
    _, w_late, _ = mgr.update(1010, 10, 10, 5)
    assert 0.1 <= w_late < 0.5


def test_duration_weight_scheduler():
    sch = DurationWeightScheduler(total_epochs=10)
    assert sch.step(0, 0.5, 0.5, 0, 100) == 1.5  # phase 1 fixed
    sch.phase = 2
    w = sch.step(1, 0.9, 0.9, 5, 100)
    assert w <= 1.5 and w >= 1.5 - sch.max_delta - 1e-9  # rate limited
    for i in range(200):
        w = sch.step(i, 0.9, 0.9, 9, 100)
    assert w < 1.0  # decayed over steps


def test_train_step_single_device_mesh():
    """Single-device mesh hands host arrays straight to the jit (the TPU fast
    path for batch ingestion); step must match the multi-device behavior."""
    from eraxvif5tts_tpu.configs import ArchConfig
    from eraxvif5tts_tpu.models.cfm import CFM
    from eraxvif5tts_tpu.models.dit import DiT
    from eraxvif5tts_tpu.parallel.mesh import make_mesh
    from eraxvif5tts_tpu.training.trainer import Trainer, make_optimizer

    arch = ArchConfig(dim=32, depth=1, heads=2, dim_head=16, ff_mult=2,
                      text_dim=16, conv_layers=0, dropout=0.0)
    cfm = CFM(transformer=DiT(arch=arch, text_num_embeds=8, mel_dim=8))
    mesh1 = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    trainer = Trainer(cfm=cfm, optimizer=make_optimizer(total_updates=10),
                      mesh=mesh1)
    state = trainer.init_state(jax.random.key(0))
    batch = {
        "mel": np.zeros((2, 16, 8), np.float32),
        "text": np.asarray([[1, 2, -1], [2, 1, -1]], np.int32),
        "lens": np.asarray([16, 12], np.int32),
    }
    state, metrics = trainer.train_step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_dataset_computes_mel_from_audio_path(tmp_path):
    """CustomDataset computes mels on the fly from audio_path (reference
    `dataset.py:82-165`) — a prepared csv_wavs dataset must actually train
    (a silent skip once made a run train on zero batches)."""
    from eraxvif5tts_tpu.audio.io import write_wav
    from eraxvif5tts_tpu.ops.stft import MelSpectrogram
    from eraxvif5tts_tpu.training.dataset import CustomDataset, numpy_log_mel

    sr = 24000
    t = np.arange(sr // 2) / sr
    wav = (0.2 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    path = str(tmp_path / "utt.wav")
    write_wav(path, wav, sr)

    ds = CustomDataset(
        rows=[{"audio_path": path, "text": "a tone", "duration": 0.5}],
        mel_spec_kwargs={"n_fft": 1024, "win_length": 1024,
                         "n_mel_channels": 100, "mel_spec_type": "vocos"},
    )
    s = ds[0]
    assert s.mel is not None and s.mel.shape[1] == 100
    assert abs(s.mel.shape[0] - ds.frame_length(0)) <= 2

    # numpy mel == production jax mel (low-energy bins of a pure tone sit near
    # the log clamp where fp noise is amplified — bound the bulk tightly and
    # the tail loosely)
    ref = np.asarray(jax.jit(MelSpectrogram().__call__)(jnp.asarray(wav[None])))[0].T
    got = numpy_log_mel(wav)
    n = min(len(ref), len(got))
    diff = np.abs(ref[:n] - got[:n])
    assert np.median(diff) < 1e-4
    assert diff.max() < 0.1


def test_ema_decay_warmup_matches_ema_pytorch_formula():
    """The first 10k steps of the decay schedule must follow ema_pytorch's
    `get_current_decay` ramp 1-(1+t/inv_gamma)^(-power) (reference
    `trainer.py:180` uses the library defaults beta=0.9999,
    update_after_step=100, inv_gamma=1.0, power=2/3)."""
    from eraxvif5tts_tpu.training.trainer import ema_current_decay

    beta, after, inv_gamma, power = 0.9999, 100, 1.0, 2.0 / 3.0
    steps = np.arange(0, 10_000)
    got = np.asarray(jax.vmap(
        lambda s: ema_current_decay(s, beta, after, inv_gamma, power)
    )(jnp.asarray(steps)))

    # independent re-derivation of ema_pytorch.EMA.get_current_decay
    t = np.clip(steps - after - 1, 0, None).astype(np.float64)
    expect = np.clip(1.0 - (1.0 + t / inv_gamma) ** (-power), 0.0, beta)
    assert np.allclose(got, expect, atol=1e-6)
    # shape checks: zero through the copy phase, strictly increasing after,
    # saturating at beta
    assert got[after + 1] == 0.0
    assert (np.diff(got[after + 2 : 5000]) > 0).all()
    # the ramp only saturates around (1+t)^(2/3) = 1e4, i.e. t ~ 1e6 steps
    assert float(ema_current_decay(2_000_000, beta, after, inv_gamma, power)) == np.float32(beta)


def test_prefetch_batches_overlap_and_errors():
    """prefetch_batches yields the generator's items in order, overlaps
    production with consumption, re-raises producer exceptions, and stops the
    producer thread when the consumer abandons the iterator."""
    import threading
    import time

    from eraxvif5tts_tpu.training.dataset import prefetch_batches

    # order + completeness
    assert list(prefetch_batches(iter(range(7)))) == list(range(7))

    # overlap: with depth=2 the producer runs ahead of the consumer
    produced = []

    def slow_gen():
        for i in range(4):
            produced.append(i)
            yield i

    it = prefetch_batches(slow_gen(), depth=2)
    first = next(it)
    time.sleep(0.3)
    assert first == 0 and len(produced) >= 3  # producer ran ahead
    assert list(it) == [1, 2, 3]

    # exception propagation
    def bad_gen():
        yield 1
        raise RuntimeError("producer boom")

    it = prefetch_batches(bad_gen())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer boom"):
        list(it)

    # early abandon unblocks the producer
    n_threads = threading.active_count()
    it = prefetch_batches(iter(range(1000)), depth=1)
    next(it)
    it.close()
    deadline = time.time() + 5.0
    while threading.active_count() > n_threads and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n_threads
