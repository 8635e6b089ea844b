"""Monotonic alignment search (MAS) + duration-loss machinery, TPU-first.

Parity targets: reference `src/f5_tts/model/alignment_utils.py` (three alignment
algorithms + phase manager) and `trainer.py:829-1079` (`calculate_duration_loss`).

TPU reformulations (SURVEY.md §7 "MAS on TPU"):
- **viterbi**: the reference's DP ``path[n,t] = sim[n,t] + max(path[n-1,t],
  path[n,t-1])`` (`alignment_utils.py:154-175`) has the closed form
  ``path[n] = cumsum(sim[n]) + cummax(path[n-1] - shift(cumsum(sim[n])))``
  — one vectorized cumsum/cummax per text row instead of an O(nt*T) Python loop;
  rows advance under ``lax.scan``. Backtracking recovers exact argmax boundaries
  (replacing the reference's approximate gradient heuristic,
  `alignment_utils.py:188-207`).
- **window**: expected-position window argmax (`alignment_utils.py:214-258`) as a
  ``lax.scan`` over text tokens with masked argmax (no dynamic slices).
- **progressive**: uniform split + one vectorized boundary-refinement pass via
  per-boundary cumsum deltas (`alignment_utils.py:260-334` does a sequential greedy
  version; the parallel pass keeps the same search radius).

All functions return per-token **durations** ``[b, nt]`` (the reference reduces its
alignment matrices the same way, `alignment_utils.py:118-128`).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e9


def _masked_similarity(similarity, phoneme_lens, mel_lens):
    b, nt, T = similarity.shape
    row_ok = jnp.arange(nt)[None, :] < phoneme_lens[:, None]
    col_ok = jnp.arange(T)[None, :] < mel_lens[:, None]
    sim = jnp.where(row_ok[:, :, None], similarity, NEG)
    sim = jnp.where(col_ok[:, None, :], sim, NEG)
    return sim


def viterbi_alignment_durations(similarity, phoneme_lens, mel_lens):
    """Exact MAS durations. ``similarity [b, nt, T]`` -> ``durations [b, nt]``."""
    sim = _masked_similarity(similarity, phoneme_lens, mel_lens)
    b, nt, T = sim.shape

    def forward(carry, sim_row):
        prev_row, n = carry
        c = jnp.cumsum(sim_row, axis=-1)  # [b, T]
        c_shift = jnp.pad(c[:, :-1], ((0, 0), (1, 0)))
        # Standard MAS recurrence: row n entering at column s means row n-1 ended at
        # s-1 -> entry score prev[s-1] + (c[t] - c[s-1]). (The reference recurrence
        # at `alignment_utils.py:173-175` double-counts the boundary column; the
        # shifted form makes DP score == realized segmentation score.)
        prev_shifted = jnp.pad(prev_row[:, :-1], ((0, 0), (1, 0)), constant_values=NEG)
        enter0 = jnp.full((b, T), NEG).at[:, 0].set(0.0)
        enter = jnp.where(n == 0, enter0, prev_shifted) - c_shift
        path = c + jax.lax.cummax(enter, axis=1)
        return (path, n + 1), enter

    init = (jnp.full((b, T), NEG), jnp.zeros((), jnp.int32))
    _, enters = jax.lax.scan(forward, init, jnp.moveaxis(sim, 1, 0))
    enters = jnp.moveaxis(enters, 0, 1)  # [b, nt, T]

    # Backtrack top-down: row n ends at t_cur; its entry column is the argmax of
    # `enters[n, :t_cur+1]`; the row below ends at entry - 1.
    col = jnp.arange(T)[None, :]

    def backtrack(t_cur, n):
        valid_row = n < phoneme_lens  # [b]
        is_top = n == phoneme_lens - 1
        t_row = jnp.where(is_top, mel_lens - 1, t_cur)
        scores = jnp.where(col <= t_row[:, None], enters[:, n, :], NEG)
        entry = jnp.argmax(scores, axis=-1)
        entry = jnp.where(n == 0, 0, entry)  # row 0 always starts at frame 0
        dur = jnp.where(valid_row, t_row - entry + 1, 0)
        new_t = jnp.where(valid_row, entry - 1, t_cur)
        return new_t, dur

    t0 = mel_lens - 1
    _, durs_rev = jax.lax.scan(backtrack, t0, jnp.arange(nt - 1, -1, -1))
    durations = jnp.moveaxis(durs_rev, 0, 1)[:, ::-1]  # [b, nt]
    return jnp.maximum(durations, 0)


def windowed_alignment_durations(similarity, phoneme_lens, mel_lens, window_size=0.2):
    """Expected-position window argmax (`alignment_utils.py:214-258`)."""
    sim = similarity
    b, nt, T = sim.shape
    window = max(2, int(T * window_size))
    fpp = mel_lens.astype(jnp.float32) / jnp.maximum(phoneme_lens, 1)  # frames/phone
    col = jnp.arange(T)[None, :]

    def step(start, n):
        is_last = n == phoneme_lens - 1
        valid = n < phoneme_lens
        expected_end = ((n + 1) * fpp).astype(jnp.int32)
        ws = jnp.maximum(start, expected_end - window)
        we = jnp.minimum(mel_lens - 1, expected_end + window)
        scores = jnp.where((col >= ws[:, None]) & (col <= we[:, None]), sim[:, n, :], NEG)
        best_end = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        best_end = jnp.maximum(best_end, start)  # never move backwards
        end = jnp.where(is_last, mel_lens - 1, best_end)
        dur = jnp.where(valid & (start <= mel_lens - 1), end - start + 1, 0)
        dur = jnp.maximum(dur, 0)
        new_start = jnp.where(valid & ~is_last, end + 1, start)
        return new_start, dur

    start0 = jnp.zeros((b,), jnp.int32)
    _, durs = jax.lax.scan(step, start0, jnp.arange(nt))
    return jnp.moveaxis(durs, 0, 1)


def progressive_alignment_durations(similarity, phoneme_lens, mel_lens,
                                    shift_range: int = 5):
    """Uniform split + one parallel boundary-refinement pass
    (`alignment_utils.py:260-334`)."""
    sim = _masked_similarity(similarity, phoneme_lens, mel_lens)
    b, nt, T = sim.shape
    n_idx = jnp.arange(nt + 1)[None, :].astype(jnp.float32)
    bounds = (n_idx * mel_lens[:, None] / jnp.maximum(phoneme_lens[:, None], 1)).astype(jnp.int32)
    bounds = jnp.minimum(bounds, mel_lens[:, None])  # [b, nt+1]

    # refine interior boundaries: moving boundary k right by s reassigns frames
    # [bk, bk+s) from row k to row k-1; delta = sum(sim[k-1] - sim[k]) over them.
    csum = jnp.cumsum(sim, axis=-1)  # [b, nt, T]
    csum = jnp.pad(csum, ((0, 0), (0, 0), (1, 0)))  # prefix sums, index by [.., t]

    def seg(c_row, lo, hi):  # sum over [lo, hi)
        return jnp.take_along_axis(c_row, hi[:, None], axis=1)[:, 0] - jnp.take_along_axis(
            c_row, lo[:, None], axis=1
        )[:, 0]

    new_bounds = [bounds[:, 0]]
    for k in range(1, nt):
        bk = bounds[:, k]
        best_delta = jnp.zeros((b,))
        best_shift = jnp.zeros((b,), jnp.int32)
        for s in range(-shift_range, shift_range + 1):
            if s == 0:
                continue
            tgt = jnp.clip(bk + s, bounds[:, k - 1] + 1, bounds[:, k + 1] - 1)
            lo = jnp.minimum(bk, tgt)
            hi = jnp.maximum(bk, tgt)
            upper = seg(csum[:, k - 1], lo, hi)
            lower = seg(csum[:, k], lo, hi)
            delta = jnp.where(tgt > bk, upper - lower, lower - upper)
            better = delta > best_delta
            best_delta = jnp.where(better, delta, best_delta)
            best_shift = jnp.where(better, tgt - bk, best_shift)
        new_bounds.append(bk + best_shift)
    new_bounds.append(bounds[:, nt])
    nb = jnp.stack(new_bounds, axis=1)
    nb = jax.lax.cummax(nb, axis=1)  # keep monotone if parallel shifts collided
    durations = nb[:, 1:] - nb[:, :-1]
    valid = jnp.arange(nt)[None, :] < phoneme_lens[:, None]
    return jnp.where(valid, jnp.maximum(durations, 0), 0)


def monotonic_alignment_durations(similarity, phoneme_lens, mel_lens,
                                  algorithm: str = "viterbi"):
    """Dispatcher (`alignment_utils.py:337-355`)."""
    if algorithm == "viterbi":
        return viterbi_alignment_durations(similarity, phoneme_lens, mel_lens)
    if algorithm == "window":
        return windowed_alignment_durations(similarity, phoneme_lens, mel_lens)
    if algorithm == "progressive":
        return progressive_alignment_durations(similarity, phoneme_lens, mel_lens)
    raise ValueError(f"unknown alignment algorithm: {algorithm!r}")


# ---------------------------------------------------------------------------
# similarity matrix + duration loss (`trainer.py:925-1019`)


def build_similarity(phoneme_embed, mel, mel_proj_matrix, phoneme_lens, mel_lens,
                     diag_bias: float = 3.0):
    """Normalized embedding/mel-projection similarity with diagonal window bias."""
    pe = phoneme_embed / (jnp.linalg.norm(phoneme_embed, axis=2, keepdims=True) + 1e-8)
    mp = mel @ mel_proj_matrix
    mp = mp / (jnp.linalg.norm(mp, axis=2, keepdims=True) + 1e-8)
    sim = jnp.einsum("bnd,btd->bnt", pe, mp)

    b, nt, T = sim.shape
    p = jnp.arange(nt)[None, :, None].astype(jnp.float32)
    t = jnp.arange(T)[None, None, :].astype(jnp.float32)
    m_len = mel_lens[:, None, None].astype(jnp.float32)
    p_len = jnp.maximum(phoneme_lens, 1)[:, None, None].astype(jnp.float32)
    center = p * m_len / p_len
    window = jnp.maximum(3.0, m_len / 10.0)
    in_window = (t >= center - window) & (t < center + window)
    sim = sim + jnp.where(in_window, diag_bias, 0.0)
    return _masked_similarity(sim, phoneme_lens, mel_lens)


def make_mel_proj_matrix(n_mels: int, embed_dim: int, seed: int = 0) -> np.ndarray:
    """Fixed random projection (`trainer.py:934-939`), created once and reused."""
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((n_mels, embed_dim)) / math.sqrt(n_mels)).astype(np.float32)


def duration_loss(
    dur_predictor,
    pred_params,
    align_embed_params,  # frozen embedding table [vocab, embed_dim]
    mel_proj_matrix,
    phoneme_ids,  # [b, nt] int, 0 = pad
    mel,  # [b, T, n_mels]
    mel_lens,  # [b]
    algorithm: str = "window",
    deterministic: bool = True,
    dropout_rng=None,
):
    """Masked MSE between predicted and MAS-target log durations.

    Returns (loss, mae, target_durations). The MAS target is computed with frozen
    embeddings + a fixed mel projection under ``stop_gradient`` (reference wraps the
    whole similarity/alignment block in ``torch.no_grad()``, `trainer.py:925`).
    """
    mask = phoneme_ids > 0
    phoneme_lens = mask.sum(axis=1)

    embed_table = align_embed_params
    phoneme_embed = jnp.take(embed_table, phoneme_ids, axis=0)
    sim = build_similarity(
        phoneme_embed, mel, mel_proj_matrix, phoneme_lens, mel_lens
    )
    sim = jax.lax.stop_gradient(sim)
    durations = monotonic_alignment_durations(sim, phoneme_lens, mel_lens, algorithm)
    durations = jnp.maximum(
        durations.astype(jnp.float32) * mask, 0.1 * mask
    )  # no zero-length phonemes (`trainer.py:983-987`)
    durations = jax.lax.stop_gradient(durations)

    target_logw = jnp.log(durations + 1e-6)
    logw = dur_predictor.apply(
        {"params": pred_params}, phoneme_ids, mask,
        deterministic=deterministic,
        rngs=None if deterministic else {"dropout": dropout_rng},
    )
    denom = mask.sum() + 1e-8
    loss = jnp.sum(jnp.square(logw - target_logw) * mask) / denom
    pred_dur = jnp.exp(jnp.clip(logw, -10, 10))
    mae = jnp.sum(jnp.abs(pred_dur - durations) * mask) / denom
    return loss, mae, durations


# ---------------------------------------------------------------------------
# Curriculum state machines (host side)


class AlignmentMethodManager:
    """Phase machine (`alignment_utils.py:361-435`): phase 1 = duration-focus
    (window alignment), phase 2 = full model; switch window -> viterbi at epoch 3;
    cosine-decay the duration weight 0.5 -> 0.1 over 10 epochs of phase 2."""

    def __init__(self):
        self.current_method = "window"
        self.phase = 1
        self.initial_dur_weight = 0.5
        self.target_dur_weight = 0.1
        self.decay_epochs = 10
        self.max_decay_steps = None
        self.viterbi_start_epoch = 3

    def set_steps_per_epoch(self, steps_per_epoch: int) -> int:
        self.max_decay_steps = steps_per_epoch * self.decay_epochs
        return self.max_decay_steps

    def update(self, global_update: int, duration_focus_updates: int,
               phase2_start_update: int | None, current_epoch: int | None):
        """Advance the machine; returns (method, weight, transitioned_to_phase2)."""
        transitioned = False
        if self.phase == 1 and global_update >= duration_focus_updates:
            self.phase = 2
            transitioned = True
        if self.phase == 2 and current_epoch is not None and (
            self.current_method != "viterbi" and current_epoch >= self.viterbi_start_epoch
        ):
            self.current_method = "viterbi"
        if self.phase == 2 and phase2_start_update is not None and self.max_decay_steps:
            steps = min(global_update - phase2_start_update, self.max_decay_steps)
            cos = 0.5 * (1 + math.cos(math.pi * steps / self.max_decay_steps))
            weight = self.target_dur_weight + (
                self.initial_dur_weight - self.target_dur_weight
            ) * cos
        else:
            weight = self.initial_dur_weight
        return self.current_method, weight, transitioned


class DurationWeightScheduler:
    """Quality-adaptive weight schedule (`trainer.py:36-91`): EMA-smoothed
    coverage/diagonal quality -> sigmoid target, exponential epoch decay,
    rate-limited delta."""

    def __init__(self, total_epochs, initial_weight=1.5, min_weight=0.1,
                 ema_alpha=0.05, slope=8.0, center=0.75, decay_rate=3.0,
                 decay_start_frac=0.1, max_delta=0.01):
        self.total_epochs = total_epochs
        self.initial_weight = initial_weight
        self.min_weight = min_weight
        self.ema_alpha = ema_alpha
        self.slope = slope
        self.center = center
        self.decay_rate = decay_rate
        self.decay_start_epoch = max(1, int(total_epochs * decay_start_frac))
        self.max_delta = max_delta
        self.ema_cov = 0.0
        self.ema_diag = 0.0
        self.prev_weight = initial_weight
        self.phase = 1

    def step(self, update, coverage, diagonal, epoch, steps_per_epoch):
        self.ema_cov = self.ema_alpha * coverage + (1 - self.ema_alpha) * self.ema_cov
        self.ema_diag = self.ema_alpha * diagonal + (1 - self.ema_alpha) * self.ema_diag
        quality = min(1.0, max(0.0, 0.4 * self.ema_cov + 0.6 * self.ema_diag))
        if self.phase == 1:
            return self.initial_weight
        sig = 1.0 / (1.0 + math.exp(-self.slope * (quality - self.center)))
        target = self.min_weight + (1 - sig) * (self.initial_weight - self.min_weight)
        if epoch > self.decay_start_epoch:
            prog = (epoch - self.decay_start_epoch) / (self.total_epochs - self.decay_start_epoch)
            target = self.min_weight + (target - self.min_weight) * math.exp(-self.decay_rate * prog)
        delta = max(-self.max_delta, min(target - self.prev_weight, self.max_delta))
        self.prev_weight = self.prev_weight + delta
        return self.prev_weight
