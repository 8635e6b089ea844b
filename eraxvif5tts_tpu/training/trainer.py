"""Sharded CFM trainer.

Replaces the reference's Accelerate-DDP ``Trainer`` (reference
`src/f5_tts/model/trainer.py:93-1427`) with a pjit train step over a
``(data, model)`` mesh:

- AdamW(0.9, 0.98) + warmup -> linear decay (`trainer.py:1184-1188`, `:306-322`)
  via optax, with global-norm clipping (`:1283`).
- Gradient all-reduce over ICI falls out of GSPMD (batch sharded on ``data``,
  params replicated/TP-sharded) — no hand-written comm.
- **Gradient accumulation** (reference wraps steps in ``accelerator.accumulate``,
  `trainer.py:1230-1280`) via ``optax.MultiSteps``: the running-mean gradient
  accumulator lives in the optimizer state, so it is sharded, donated, and
  checkpointed like everything else. ``state.step`` counts *applied updates*
  (the reference's ``global_update``), not micro-batches.
- **NaN/Inf skip** in the main step (the reference only had it in distillation,
  `distil_reload.py:1126`): a non-finite micro-batch contributes nothing — with
  accumulation it is not even counted into the running mean
  (``optax.skip_not_finite``).
- EMA (beta 0.9999, update_every 10 — ema_pytorch defaults used at `trainer.py:180`)
  is updated **in-jit on every shard** on applied updates only.
- Orbax checkpoints: params/EMA/optimizer/step + duration-predictor state,
  `keep_last_n` rotation (`trainer.py:560-597`), resume (`trainer.py:600-827`)
  including **mid-epoch resume**: a ``.meta.json`` sidecar records the epoch /
  batch cursor + curriculum state (the reference uses
  ``accelerator.skip_first_batches`` + ``resumable_with_seed``,
  `trainer.py:1196-1206`). Per-batch RNG is ``fold_in(rng, epoch, batch)`` so an
  interrupted run resumes bit-exactly.
- The train loop never syncs the device per step: the update counter is mirrored
  host-side and re-synced only at log/save points (the old ``int(state.step)``
  per step was a hidden round-trip).
"""

from __future__ import annotations

import itertools
import json
import os
from dataclasses import dataclass
from typing import Any, Callable, Iterable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from eraxvif5tts_tpu.models.cfm import CFM
from eraxvif5tts_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_params,
    zero1_shardings,
)


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray  # number of APPLIED optimizer updates (reference global_update)
    params: Any
    opt_state: Any
    ema_params: Any
    # duration-predictor curriculum state (None when disabled):
    dur_pred_params: Any = None   # trained copy
    dur_align_params: Any = None  # frozen copy used for alignment embeddings
    dur_opt_state: Any = None


def make_optimizer(
    learning_rate: float = 7.5e-5,
    num_warmup_updates: int = 20000,
    total_updates: int = 1_000_000,
    max_grad_norm: float = 1.0,
    b1: float = 0.9,
    b2: float = 0.98,
    decay_type: str = "linear",
    mu_dtype: Any = None,
) -> optax.GradientTransformation:
    """Warmup -> decay AdamW, global-norm clipped.

    ``decay_type='linear'`` is the main trainer's SequentialLR(warmup, linear)
    (reference `trainer.py:1184-1188`); ``'cosine'`` is the distillation recipe's
    CosineAnnealingLR with eta_min ~ 0 (reference `distil_reload.py:892-897`).
    ``mu_dtype=jnp.bfloat16`` stores the AdamW first moment in bf16 — saves
    one params-worth of fp32 HBM per two chips-worth of moments (0.67 GB for
    the flagship), the multi-chip headroom knob next to ``remat_policy="dots"``;
    the second moment stays fp32 (its dynamic range is the sensitive one).
    """
    decay_steps = max(total_updates - num_warmup_updates, 1)
    if decay_type == "linear":
        decay = optax.linear_schedule(learning_rate, 0.0, decay_steps)
    elif decay_type == "cosine":
        decay = optax.cosine_decay_schedule(learning_rate, decay_steps, alpha=1e-8)
    else:
        raise ValueError(f"decay_type must be 'linear' or 'cosine', got {decay_type!r}")
    schedule = optax.join_schedules(
        [optax.linear_schedule(0.0, learning_rate, max(num_warmup_updates, 1)), decay],
        boundaries=[num_warmup_updates],
    )
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(schedule, b1=b1, b2=b2, mu_dtype=mu_dtype),
    )


# ---------------------------------------------------------------------------
# Checkpoint primitives shared by Trainer and DistillTrainer (Orbax + .meta.json
# sidecar + keep_last_n rotation, reference `trainer.py:521-827`,
# `distil_reload.py:437-628`)


def checkpoint_save(checkpoint_dir: str, state: Any, step: int, last: bool = False,
                    meta: dict | None = None, keep_last_n: int = -1) -> str:
    import orbax.checkpoint as ocp

    os.makedirs(checkpoint_dir, exist_ok=True)
    name = "model_last" if last else f"model_{step}"
    path = os.path.abspath(os.path.join(checkpoint_dir, name))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    if meta is not None:
        with open(path + ".meta.json", "w", encoding="utf-8") as f:
            json.dump(meta, f)
    checkpoint_rotate(checkpoint_dir, keep_last_n)
    return path


def checkpoint_rotate(checkpoint_dir: str, keep_last_n: int) -> None:
    """keep_last_n rotation (`trainer.py:560-597`); model_last is exempt."""
    if keep_last_n is None or keep_last_n < 0 or not checkpoint_dir:
        return
    entries = []
    for d in os.listdir(checkpoint_dir):
        if d.startswith("model_") and d != "model_last" and not d.endswith(".meta.json"):
            try:
                entries.append((int(d.split("_")[1]), d))
            except ValueError:
                continue
    entries.sort()
    import shutil

    for _, d in entries[: max(len(entries) - keep_last_n, 0)]:
        shutil.rmtree(os.path.join(checkpoint_dir, d), ignore_errors=True)
        meta = os.path.join(checkpoint_dir, d + ".meta.json")
        if os.path.isfile(meta):
            os.remove(meta)


def checkpoint_restore(path: str, template: Any) -> tuple[Any, Optional[dict]]:
    """Returns (restored host-side state, meta dict or None)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    try:
        restored = ckptr.restore(path, target=jax.device_get(template))
    except Exception as e:
        # layout preflight: a scan_layers model cannot resume an unrolled-form
        # train checkpoint in place (opt-state moments share the param tree
        # structure) — surface the fix instead of Orbax's tree-mismatch dump.
        t_params = getattr(template, "params", None)
        if isinstance(t_params, dict):
            t_scan = "blocks" in t_params
            raise RuntimeError(
                f"checkpoint restore failed for {path}; if this checkpoint was "
                f"written with the other block layout (model expects "
                f"{'stacked scan' if t_scan else 'unrolled per-block'} params), "
                "resume with the matching arch.scan_layers, or convert weights "
                "offline via compression.convert.adapt_block_layout and restart "
                "the optimizer"
            ) from e
        raise
    meta = None
    meta_path = path + ".meta.json"
    if os.path.isfile(meta_path):
        with open(meta_path, "r", encoding="utf-8") as f:
            meta = json.load(f)
    return restored, meta


def latest_checkpoint(checkpoint_dir: str) -> Optional[str]:
    """Newest ``model_*`` in a directory, preferring ``model_last``
    (reference `trainer.py:600-640` discovery)."""
    if not checkpoint_dir or not os.path.isdir(checkpoint_dir):
        return None
    last = os.path.join(checkpoint_dir, "model_last")
    if os.path.isdir(last):
        return last
    steps = []
    for d in os.listdir(checkpoint_dir):
        if d.startswith("model_") and not d.endswith(".meta.json"):
            try:
                steps.append((int(d.split("_")[1]), d))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(checkpoint_dir, max(steps)[1])


def ema_current_decay(step, beta: float, update_after_step: int,
                      inv_gamma: float = 1.0, power: float = 2.0 / 3.0):
    """ema_pytorch's ``get_current_decay`` (reference `trainer.py:180` relies
    on its defaults beta=0.9999, update_after_step=100, inv_gamma=1,
    power=2/3): decay ramps as ``1 - (1 + t/inv_gamma)^(-power)`` with
    ``t = step - update_after_step - 1``, clamped to ``[0, beta]``."""
    t = jnp.maximum(step - update_after_step - 1, 0).astype(jnp.float32)
    ramp = 1.0 - (1.0 + t / inv_gamma) ** (-power)
    return jnp.clip(ramp, 0.0, beta)


def _select_tree(pred, on_true, on_false):
    """Per-leaf jnp.where over two same-structure pytrees (NaN-skip select)."""
    return jax.tree.map(lambda a, b: jnp.where(pred, a, b), on_true, on_false)


def alignment_quality_metrics(durations, phoneme_mask, mel_lens):
    """Device-side coverage/diagonal quality of a MAS alignment.

    - ``coverage``: fraction of phonemes receiving >= 1 full frame (degenerate
      0.1-clamped tokens indicate a collapsed alignment).
    - ``diagonal``: 1 - mean |realized phoneme center - uniform-diagonal center|
      normalized by the mel length.

    These feed ``DurationWeightScheduler`` (the reference instantiates it at
    `trainer.py:225` but never computes its inputs; here the loop actually drives it
    when ``use_adaptive_duration_weight`` is on).
    """
    maskf = phoneme_mask.astype(jnp.float32)
    ntok = jnp.maximum(maskf.sum(axis=1), 1.0)
    coverage = ((durations >= 1.0).astype(jnp.float32) * maskf).sum(axis=1) / ntok

    ends = jnp.cumsum(durations, axis=-1)
    centers = ends - durations / 2.0
    nt = durations.shape[1]
    idx = jnp.arange(nt, dtype=jnp.float32)[None, :]
    mel_f = jnp.maximum(mel_lens.astype(jnp.float32), 1.0)[:, None]
    diag_centers = (idx + 0.5) * mel_f / ntok[:, None]
    dev = jnp.abs(centers - diag_centers) * maskf
    diagonal = 1.0 - (dev.sum(axis=1) / ntok) / mel_f[:, 0]

    valid = (phoneme_mask.any(axis=1)).astype(jnp.float32)
    denom = jnp.maximum(valid.sum(), 1.0)
    return (coverage * valid).sum() / denom, (jnp.clip(diagonal, 0.0, 1.0) * valid).sum() / denom


@dataclass
class Trainer:
    """Drives the sharded train loop. All device work is one jit per batch bucket."""

    cfm: CFM
    optimizer: optax.GradientTransformation
    mesh: Any = None
    # ZeRO-1 / optimizer-state sharding (annotation-only, parallel/mesh.py
    # zero1_shardings): AdamW moments + the EMA tree are distributed over the
    # ``data`` mesh axis instead of replicated per data shard; GSPMD partitions
    # the optimizer/EMA update over ``data`` and all-gathers the param delta
    # over ICI. Matches the replicated layout to reassociation level (<1e-15,
    # tests/test_multichip.py); frees
    # ~2 GB/chip of HBM on the flagship at DP=4. Off by default: single-chip
    # meshes gain nothing and checkpointed state keeps the round-3 layout.
    zero1: bool = False
    ema_decay: float = 0.9999
    ema_update_after_step: int = 100
    ema_update_every: int = 10
    # ema_pytorch decay warmup (reference `trainer.py:180` uses ema_pytorch
    # defaults): decay ramps as 1 - (1 + t/inv_gamma)^(-power) toward
    # ema_decay, t = step - update_after_step - 1
    ema_inv_gamma: float = 1.0
    ema_power: float = 2.0 / 3.0
    grad_accumulation_steps: int = 1
    checkpoint_dir: Optional[str] = None
    keep_last_n_checkpoints: int = -1
    # Duration-predictor curriculum (reference `trainer.py:240-300, 829-1079`):
    # two copies of the predictor — a frozen "align" copy whose embeddings feed the
    # MAS similarity, and a trained "pred" copy — plus a duration-focus phase that
    # freezes the main model for `duration_focus_updates` updates.
    duration_predictor: Any = None  # DurationPredictor module
    duration_focus_updates: int = 12000
    # Live phoneme->index map shared with the collate pipeline. Persisted in
    # the checkpoint meta sidecar and restored IN PLACE on resume: collate
    # assigns indices in iteration order, so a resume that re-grew the map
    # from scratch would scramble ids under the restored embedding rows
    # (reference persists it with the predictor ckpt, `trainer.py:1367-1377`).
    phoneme_map: Any = None
    duration_lr: Optional[float] = None  # defaults to main LR, weight decay 3e-4
    # Quality-adaptive duration weight (reference `trainer.py:36-91`, unused there;
    # wired for real here): when on, the weight follows the sigmoid/decay schedule
    # driven by the in-jit coverage/diagonal metrics instead of the manager's cosine.
    use_adaptive_duration_weight: bool = False

    def __post_init__(self):
        if self.mesh is None:
            self.mesh = make_mesh(n_model=1)
        k = max(int(self.grad_accumulation_steps), 1)
        self.grad_accumulation_steps = k
        if k > 1:
            # Running-mean accumulator in opt state; non-finite micro-batches are
            # dropped from the mean entirely (reference skips the batch).
            self._opt = optax.MultiSteps(
                self.optimizer, every_k_schedule=k,
                should_skip_update_fn=optax.skip_not_finite,
            )
        else:
            self._opt = self.optimizer
        self._step_fn = None
        self._dur_step_fns = {}
        self._mel_proj = None
        self.alignment_manager = None
        self.resume_meta: Optional[dict] = None
        self._host_step: Optional[int] = None
        self._current_epoch: Optional[int] = None
        self._dur_weight_sched = None
        self._last_quality = (0.0, 0.0)
        self._steps_per_epoch: Optional[int] = None
        if self.duration_predictor is not None:
            from eraxvif5tts_tpu.training.alignment import AlignmentMethodManager

            self.alignment_manager = AlignmentMethodManager()
            self._phase2_start: Optional[int] = None
            dur_base = optax.adamw(
                self.duration_lr or 7.5e-5, b1=0.9, b2=0.98, weight_decay=3e-4
            )
            if k > 1:
                self._dur_optimizer = optax.MultiSteps(
                    dur_base, every_k_schedule=k,
                    should_skip_update_fn=optax.skip_not_finite,
                )
            else:
                self._dur_optimizer = dur_base

    # ------------------------------------------------------------------

    def _opt_state_shardings(self, params: Any) -> Any:
        """Shardings for the optimizer state: every param-shaped subtree (AdamW
        mu/nu, MultiSteps acc_grads) mirrors the params' TP layout; counts and
        other scalars are replicated.

        ``jax.jit(self._opt.init)(params)`` does NOT do this by itself: the
        init only uses the params' shapes (zeros_like), so XLA dead-code-
        eliminates the sharded operands and the outputs land wherever the
        default device is — on a ``model>1`` mesh that is a single device
        holding 2x-params of fp32 moments plus a reshard on the first step.
        Param-shaped leaves are recognized by their trailing dict path (the
        param address inside the state tree) plus a shape match.

        With ``zero1=True`` the param-shaped leaves take the ZeRO-1 layout
        (TP spec + first free dim sharded over ``data``) instead of the
        params' own TP spec.
        """
        import jax.tree_util as jtu

        base = (zero1_shardings if self.zero1 else param_shardings)(
            self.mesh, params)
        pshard = {
            jtu.keystr(path): (s, tuple(leaf.shape))
            for (path, leaf), s in zip(
                jtu.tree_leaves_with_path(params),
                jax.tree.leaves(base),
            )
        }
        rep = replicated(self.mesh)

        def pick(path, leaf):
            keys = []
            for k in reversed(path):
                if isinstance(k, jtu.DictKey):
                    keys.append(k)
                else:
                    break
            if keys:
                hit = pshard.get(jtu.keystr(tuple(reversed(keys))))
                if hit is not None and hit[1] == tuple(leaf.shape):
                    return hit[0]
            return rep

        shapes = jax.eval_shape(self._opt.init, params)
        return jtu.tree_map_with_path(pick, shapes)

    def init_state(self, rng: jax.Array, params: Any | None = None,
                   dur_pred_params: Any | None = None,
                   ema_init: str = "copy") -> TrainState:
        """Build the initial TrainState on the mesh.

        ``ema_init='copy'`` (default) clones params into the EMA tree (the
        reference's ema_pytorch starts from the online weights). ``'zeros'``
        allocates the EMA as lazily-zero buffers instead — semantically
        identical once the first applied update runs (``step <= ema_update_
        after_step`` forces ``take_copy``, overwriting the EMA with params),
        and skips one params-worth of memory writes; meant for dryruns/smoke
        runs that never checkpoint before their first update.
        """
        params = params if params is not None else self.cfm.init_params(rng)
        params = shard_params(self.mesh, params)
        # Plain jitted opt init keeps every zero-moment buffer as lazily
        # allocated zero pages (broadcast(0) outputs are never written);
        # jit(..., out_shardings=...) here inserts per-output copies that
        # MATERIALIZE ~2 params-worth of zeros (measured 320 s vs 3 s on a
        # slow-memory host; ~1 s of tunnel round-trips saved on the v5e).
        # zeros_like has no dataflow from params, so GSPMD cannot propagate
        # the params' TP layout into the moments — leaves whose propagated
        # sharding misses the intended layout (`_opt_state_shardings`) get a
        # targeted device_put; only those leaves materialize.
        #
        # Under zero1 EVERY param-shaped leaf needs redistribution, so the
        # per-leaf device_put path degenerates (hundreds of eager dispatches);
        # there the out_shardings form wins: one program whose sharded outputs
        # make each device write only its 1/(data*model) slice of zeros —
        # total bytes written equal ONE params-worth ×2, not ×2×data.
        if self.zero1:
            opt_state = jax.jit(
                self._opt.init,
                out_shardings=self._opt_state_shardings(params))(params)
        else:
            opt_state = jax.jit(self._opt.init)(params)

            def _fix(x, s):
                if hasattr(x, "sharding") and x.sharding.is_equivalent_to(
                        s, getattr(x, "ndim", 0)):
                    return x
                return jax.device_put(x, s)

            opt_state = jax.tree.map(_fix, opt_state,
                                     self._opt_state_shardings(params))
        dur_params = dur_align = dur_opt = None
        if self.duration_predictor is not None:
            if dur_pred_params is None:
                ids = jnp.zeros((1, 8), jnp.int32)
                dur_pred_params = jax.jit(self.duration_predictor.init)(
                    jax.random.fold_in(rng, 1), ids, ids > 0
                )["params"]
            dur_params = dur_pred_params
            # frozen alignment copy initialized from the same weights
            # (`trainer.py:246-276`)
            dur_align = jax.tree.map(jnp.copy, dur_pred_params)
            dur_opt = jax.jit(self._dur_optimizer.init)(dur_params)
        eshard = (zero1_shardings if self.zero1 else param_shardings)(
            self.mesh, params)
        if ema_init == "zeros":
            shapes = jax.eval_shape(lambda p: p, params)
            ema = jax.jit(
                lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes),
                out_shardings=eshard,
            )()
        else:
            # one jitted program (sharding-preserving), not ~500 eager per-leaf
            # dispatches (each ~20 ms un-jitted on a 1-core host / ~27 ms of
            # tunnel RTT on the v5e)
            ema = jax.jit(lambda p: jax.tree.map(jnp.copy, p),
                          out_shardings=eshard)(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            ema_params=ema,
            dur_pred_params=dur_params,
            dur_align_params=dur_align,
            dur_opt_state=dur_opt,
        )

    # ------------------------------------------------------------------

    def _applied_and_update(self, grads, opt_state, params, loss):
        """Run the (possibly accumulating) optimizer; returns
        (new_params, new_opt_state, applied) with NaN-skip semantics."""
        if self.grad_accumulation_steps > 1:
            updates, new_opt = self._opt.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            applied = new_opt.gradient_step != opt_state.gradient_step
            return new_params, new_opt, applied
        finite = jnp.isfinite(loss) & jnp.isfinite(optax.global_norm(grads))
        updates, new_opt = self._opt.update(grads, opt_state, params)
        cand = optax.apply_updates(params, updates)
        new_params = _select_tree(finite, cand, params)
        new_opt = _select_tree(finite, new_opt, opt_state)
        return new_params, new_opt, finite

    def _ema_map(self, applied, step, ema_tree, param_tree):
        ema_decay, ema_after, ema_every = (
            self.ema_decay, self.ema_update_after_step, self.ema_update_every
        )
        decay = ema_current_decay(step, ema_decay, ema_after,
                                  self.ema_inv_gamma, self.ema_power)

        def ema_update(ema, p):
            decayed = ema * decay + p * (1.0 - decay)
            take_copy = step <= ema_after
            do_update = applied & ((step % ema_every == 0) | take_copy)
            return jnp.where(do_update, jnp.where(take_copy, p, decayed.astype(ema.dtype)), ema)

        return jax.tree.map(ema_update, ema_tree, param_tree)

    def _build_step(self):
        cfm = self.cfm

        def step_fn(state: TrainState, mel, text, lens, rng):
            def loss_fn(params):
                loss, _, _ = cfm.loss(params, mel, text, lens, rng)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            if self.zero1:
                # Scatter the grads into the ZeRO-1 layout BEFORE the norm /
                # clip / AdamW chain: the DP gradient all-reduce lowers to a
                # reduce-scatter over `data`, and every downstream param-sized
                # op (global-norm reads, clip scale, moment update) runs on
                # 1/data-sized slices. Together with the all-gather pinned on
                # new_params below this is the standard ZeRO gradient path:
                # reduce-scatter(grads) -> sharded update -> all-gather(params).
                grads = jax.lax.with_sharding_constraint(
                    grads, zero1_shardings(self.mesh, grads))
            grad_norm = optax.global_norm(grads)
            new_params, new_opt_state, applied = self._applied_and_update(
                grads, state.opt_state, state.params, loss
            )
            step = state.step + applied.astype(jnp.int32)
            new_ema = self._ema_map(applied, step, state.ema_params, new_params)
            if self.zero1:
                # Pin the state layouts so donation reuses buffers and step N+1
                # sees the same shardings as step N: moments/EMA stay in the
                # ZeRO-1 layout (GSPMD partitions their update over `data`),
                # params come back replicated-over-data (the all-gather of the
                # per-rank update slices happens HERE, over ICI).
                wsc = jax.lax.with_sharding_constraint
                new_params = wsc(new_params, param_shardings(self.mesh, new_params))
                new_opt_state = wsc(new_opt_state,
                                    self._opt_state_shardings(state.params))
                new_ema = wsc(new_ema, zero1_shardings(self.mesh, new_ema))
            new_state = state.replace(
                step=step, params=new_params, opt_state=new_opt_state,
                ema_params=new_ema,
            )
            metrics = {"loss": loss, "grad_norm": grad_norm,
                       "applied": applied.astype(jnp.float32)}
            return new_state, metrics

        return jax.jit(step_fn, donate_argnums=(0,))

    def _build_dur_step(self, algorithm: str, freeze_main: bool):
        """Train step with the MAS duration loss. Static variants per
        (alignment algorithm, focus-phase flag). In the focus phase the main
        model is truly frozen — its optimizer never runs, so neither AdamW
        moments nor weight decay touch it (reference freezes via
        ``requires_grad=False``, `trainer.py:286-300`)."""
        from eraxvif5tts_tpu.training.alignment import duration_loss as dur_loss_fn

        cfm = self.cfm
        dur_optimizer = self._dur_optimizer
        dur_predictor = self.duration_predictor

        def step_fn(state: TrainState, mel, text, lens, phoneme, mel_proj, dur_weight, rng):
            embed_table = state.dur_align_params["embed"]["embedding"]

            def dur_only(dur_params):
                d_loss, d_mae, durs = dur_loss_fn(
                    dur_predictor, dur_params, embed_table, mel_proj,
                    phoneme, mel, lens, algorithm,
                )
                return d_loss, (d_mae, durs)

            if freeze_main:
                (d_loss, (d_mae, durs)), dur_grads = jax.value_and_grad(
                    dur_only, has_aux=True
                )(state.dur_pred_params)
                # forward-only CFM loss for logging parity; no main backward at all
                cfm_loss, _, _ = cfm.loss(
                    jax.lax.stop_gradient(state.params), mel, text, lens, rng,
                    deterministic=True,
                )
                total = cfm_loss + dur_weight * d_loss
                # Advance the main optimizer's schedule/counts on zero grads but
                # leave params untouched (the reference's LR scheduler steps during
                # the focus phase while frozen params get neither grads nor weight
                # decay, `trainer.py:286-300, 1285-1287`).
                zero_grads = jax.tree.map(jnp.zeros_like, state.params)
                if self.grad_accumulation_steps > 1:
                    _, new_opt = self._opt.update(
                        zero_grads, state.opt_state, state.params
                    )
                    main_applied = new_opt.gradient_step != state.opt_state.gradient_step
                else:
                    _, new_opt = self._opt.update(
                        zero_grads, state.opt_state, state.params
                    )
                    main_applied = jnp.asarray(True)
                new_params = state.params
                main_grad_norm = jnp.zeros(())
            else:
                def loss_fn(params, dur_params):
                    cfm_loss, _, _ = cfm.loss(params, mel, text, lens, rng)
                    d_loss, (d_mae, durs) = dur_only(dur_params)
                    total = cfm_loss + dur_weight * d_loss
                    return total, (cfm_loss, d_loss, d_mae, durs)

                (total, (cfm_loss, d_loss, d_mae, durs)), grads = jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True
                )(state.params, state.dur_pred_params)
                main_grads, dur_grads = grads
                main_grad_norm = optax.global_norm(main_grads)
                new_params, new_opt, main_applied = self._applied_and_update(
                    main_grads, state.opt_state, state.params, total
                )

            # duration-predictor optimizer (separate group, 3e-4 wd)
            if self.grad_accumulation_steps > 1:
                d_updates, new_dur_opt = dur_optimizer.update(
                    dur_grads, state.dur_opt_state, state.dur_pred_params
                )
                new_dur_params = optax.apply_updates(state.dur_pred_params, d_updates)
            else:
                d_finite = jnp.isfinite(d_loss) & jnp.isfinite(optax.global_norm(dur_grads))
                d_updates, new_dur_opt = dur_optimizer.update(
                    dur_grads, state.dur_opt_state, state.dur_pred_params
                )
                cand = optax.apply_updates(state.dur_pred_params, d_updates)
                new_dur_params = _select_tree(d_finite, cand, state.dur_pred_params)
                new_dur_opt = _select_tree(d_finite, new_dur_opt, state.dur_opt_state)

            step = state.step + main_applied.astype(jnp.int32)
            new_ema = self._ema_map(main_applied, step, state.ema_params, new_params)
            coverage, diagonal = alignment_quality_metrics(durs, phoneme > 0, lens)
            new_state = state.replace(
                step=step, params=new_params, opt_state=new_opt, ema_params=new_ema,
                dur_pred_params=new_dur_params,
                dur_opt_state=new_dur_opt,
            )
            metrics = {"loss": total, "cfm_loss": cfm_loss,
                       "duration_loss": d_loss, "duration_mae": d_mae,
                       "align_coverage": coverage, "align_diagonal": diagonal,
                       "duration_weight": dur_weight,
                       "grad_norm": main_grad_norm,
                       "applied": main_applied.astype(jnp.float32),
                       # per-token MAS target durations — consumed by the
                       # alignment-viz JSON dump (reference `trainer.py:1272-1277`),
                       # stripped from scalar logging in train()
                       "align_durations": durs}
            return new_state, metrics

        return jax.jit(step_fn, donate_argnums=(0,))

    def _pad_batch(self, batch: dict) -> dict:
        """Pad the batch axis up to a multiple of the data-mesh size; padded rows get
        ``lens=0`` so the masked loss ignores them."""
        n_data = self.mesh.shape.get("data", 1)
        b = batch["mel"].shape[0]
        if b % n_data == 0:
            return batch
        pad = n_data - b % n_data

        out = {
            "mel": np.concatenate(
                [batch["mel"], np.zeros((pad,) + batch["mel"].shape[1:],
                                        batch["mel"].dtype)]),
            "text": np.concatenate(
                [batch["text"], np.full((pad,) + batch["text"].shape[1:], -1,
                                        batch["text"].dtype)]),
            "lens": np.concatenate(
                [batch["lens"], np.zeros((pad,), batch["lens"].dtype)]),
        }
        if batch.get("phoneme") is not None:
            out["phoneme"] = np.concatenate(
                [batch["phoneme"], np.zeros((pad,) + batch["phoneme"].shape[1:],
                                            batch["phoneme"].dtype)])
        return out

    def set_steps_per_epoch(self, steps_per_epoch: int) -> None:
        """Arm the epoch-based schedules (viterbi switch + cosine weight decay need
        to know the epoch length, reference `alignment_utils.py:361-435`)."""
        self._steps_per_epoch = steps_per_epoch
        if self.alignment_manager is not None:
            self.alignment_manager.set_steps_per_epoch(steps_per_epoch)

    def train_step(self, state: TrainState, batch: dict, rng: jax.Array):
        """One micro-batch. ``batch`` = {'mel': [b,n,d], 'text': [b,nt], 'lens': [b]}
        (+ optional 'phoneme' [b,np] ids when duration training is on) with static
        bucketed shapes. With ``grad_accumulation_steps=k`` the optimizer applies
        every k-th call; ``state.step`` counts applied updates only."""
        use_duration = (
            self.duration_predictor is not None and batch.get("phoneme") is not None
        )
        batch = self._pad_batch(batch)
        # Single-device mesh: hand host arrays straight to the jit — its C++
        # dispatch ingests them far faster than an explicit device_put (measured
        # on the v5e tunnel: 0.6 s vs 4.4 s sharded / 106 s plain device_put for
        # a 15 MB mel batch; per-step device_put made the train step 126 s vs
        # 2 s of compute). Multi-device meshes still need the sharded put so
        # each device receives only its shard.
        single = self.mesh.devices.size == 1
        with jax.sharding.use_mesh(self.mesh) if hasattr(jax.sharding, "use_mesh") else _nullcontext():
            bs = batch_sharding(self.mesh)
            if single:
                mel, text, lens = batch["mel"], batch["text"], batch["lens"]
            else:
                mel = jax.device_put(batch["mel"], bs)
                text = jax.device_put(batch["text"], bs)
                lens = jax.device_put(batch["lens"], bs)
            if not use_duration:
                if self._step_fn is None:
                    self._step_fn = self._build_step()
                return self._step_fn(state, mel, text, lens, rng)

            # duration curriculum: advance the host-side phase machine from the
            # host step mirror — no per-step device sync (`int(state.step)` was a
            # hidden round-trip at real scale).
            step = self._host_step if self._host_step is not None else int(state.step)
            if self.alignment_manager.phase == 2 and self._phase2_start is None:
                self._phase2_start = step
            algorithm, weight, transitioned = self.alignment_manager.update(
                step, self.duration_focus_updates, self._phase2_start,
                self._current_epoch,
            )
            if transitioned:
                self._phase2_start = step
                if self._dur_weight_sched is not None:
                    self._dur_weight_sched.phase = 2
            if self._dur_weight_sched is not None:
                cov, diag = self._last_quality
                weight = self._dur_weight_sched.step(
                    step, cov, diag, self._current_epoch or 0,
                    max(self._steps_per_epoch or 1, 1),
                )
            freeze_main = self.alignment_manager.phase == 1
            key = (algorithm, freeze_main)
            if key not in self._dur_step_fns:
                self._dur_step_fns[key] = self._build_dur_step(algorithm, freeze_main)
            if self._mel_proj is None:
                from eraxvif5tts_tpu.training.alignment import make_mel_proj_matrix

                embed_dim = state.dur_align_params["embed"]["embedding"].shape[1]
                self._mel_proj = jnp.asarray(
                    make_mel_proj_matrix(batch["mel"].shape[-1], embed_dim)
                )
            phoneme = batch["phoneme"] if single else jax.device_put(batch["phoneme"], bs)
            return self._dur_step_fns[key](
                state, mel, text, lens, phoneme, self._mel_proj,
                jnp.asarray(weight, jnp.float32), rng,
            )

    # ------------------------------------------------------------------

    def train(
        self,
        state: TrainState,
        batches: Iterable[dict] | None = None,
        rng: jax.Array | None = None,
        *,
        epoch_iter: Callable[[int], Iterable[dict]] | None = None,
        epochs: int = 1,
        start_epoch: int = 0,
        skip_batches: int = 0,
        log_every: int = 100,
        save_per_updates: int = 50000,
        last_per_updates: int = 0,
        log_fn: Callable[[int, dict], None] | None = None,
        sample_fn: Callable[[TrainState, int], None] | None = None,
        tensorboard_dir: Optional[str] = None,
        logger: Optional[str] = None,
    ) -> TrainState:
        """Drive the loop.

        Two modes:
        - ``batches``: a flat iterable (one pass, no mid-epoch resume) — kept for
          tests and simple callers.
        - ``epoch_iter(epoch) -> iterable``: the trainer owns the epoch loop;
          ``start_epoch``/``skip_batches`` resume an interrupted run exactly where
          it stopped (reference `trainer.py:1196-1206`). Per-batch RNG is
          ``fold_in(fold_in(rng, epoch), batch_idx)`` so the loss trajectory of a
          resumed run is bit-identical to the uninterrupted one.

        ``sample_fn(state, step)`` runs at every checkpoint save — the reference
        synthesizes smoke-test wavs there (`trainer.py:1387-1419`).
        ``logger``: None | 'tensorboard' | 'wandb' (falls back loudly if wandb is
        unavailable, instead of the silent ignore the reference YAML allowed).
        """
        assert rng is not None, "train() needs an rng"
        tb_writer, wandb_run = self._open_loggers(logger, tensorboard_dir)
        k = self.grad_accumulation_steps
        self._host_step = int(state.step)

        if epoch_iter is None:
            assert batches is not None, "pass `batches` or `epoch_iter`"
            epoch_plan = [(start_epoch, batches)]
            final_epoch = start_epoch
        else:
            epoch_plan = ((e, epoch_iter(e)) for e in range(start_epoch, epochs))
            final_epoch = epochs - 1

        if self.use_adaptive_duration_weight and self.duration_predictor is not None \
                and self._dur_weight_sched is None:
            from eraxvif5tts_tpu.training.alignment import DurationWeightScheduler

            m = self.alignment_manager
            self._dur_weight_sched = DurationWeightScheduler(
                total_epochs=max(epochs, 1),
                initial_weight=m.initial_dur_weight, min_weight=m.target_dur_weight,
            )
            self._dur_weight_sched.phase = m.phase

        for epoch, it in epoch_plan:
            self._current_epoch = epoch
            batch_idx = 0
            if epoch == start_epoch and skip_batches:
                it = itertools.islice(it, skip_batches, None)
                batch_idx = skip_batches
            for batch in it:
                step_rng = jax.random.fold_in(jax.random.fold_in(rng, epoch), batch_idx)
                state, metrics = self.train_step(state, batch, step_rng)
                batch_idx += 1
                # optimistic host mirror: updates apply every k-th micro-batch
                # (re-synced below on log/save, where NaN skips surface).
                if batch_idx % k == 0:
                    self._host_step += 1
                step = self._host_step
                at_update = batch_idx % k == 0
                if at_update and step % log_every == 0:
                    scalars = {kk: float(v) for kk, v in metrics.items()
                               if getattr(v, "ndim", 0) == 0}
                    self._host_step = step = int(state.step)  # re-sync after NaN skips
                    if (self.checkpoint_dir and "align_durations" in metrics
                            and step % (log_every * 5) == 0):
                        # alignment visualization dump, reference `trainer.py:1272-1277`
                        self._dump_alignment_viz(
                            step, metrics["align_durations"], batch, scalars)
                    if "align_coverage" in scalars:
                        self._last_quality = (
                            scalars["align_coverage"], scalars["align_diagonal"]
                        )
                    if log_fn is not None:
                        log_fn(step, scalars)
                    if tb_writer is not None:
                        for kk, v in scalars.items():
                            tb_writer.add_scalar(kk, v, step)
                    if wandb_run is not None:
                        wandb_run.log(scalars, step=step)
                if self.checkpoint_dir and at_update and save_per_updates \
                        and step % save_per_updates == 0:
                    self._host_step = int(state.step)
                    self.save_checkpoint(state, meta=self._make_meta(epoch, batch_idx))
                    if sample_fn is not None:
                        sample_fn(state, self._host_step)
                if self.checkpoint_dir and at_update and last_per_updates \
                        and step % last_per_updates == 0:
                    self.save_checkpoint(state, last=True,
                                         meta=self._make_meta(epoch, batch_idx))
            skip_batches = 0
        self._current_epoch = final_epoch
        if tb_writer is not None:
            tb_writer.close()
        if wandb_run is not None:
            wandb_run.finish()
        self._host_step = None
        return state

    def _open_loggers(self, logger, tensorboard_dir):
        tb_writer = wandb_run = None
        if logger == "wandb":
            try:
                import wandb

                wandb_run = wandb.init(project="eraxvif5tts-tpu", resume="allow")
            except Exception as e:  # noqa: BLE001 — any wandb failure falls back
                print(f"[trainer] logger='wandb' unavailable ({e}); "
                      "falling back to tensorboard")
                logger = "tensorboard"
        if tensorboard_dir or logger == "tensorboard":
            try:
                from torch.utils.tensorboard import SummaryWriter

                tb_writer = SummaryWriter(tensorboard_dir or "runs")
            except ImportError:
                if logger == "tensorboard":
                    print("[trainer] tensorboard unavailable; scalar logging off")
        return tb_writer, wandb_run

    def _make_meta(self, epoch: int, batch_in_epoch: int) -> dict:
        meta = {"epoch": epoch, "batch_in_epoch": batch_in_epoch,
                "grad_accumulation_steps": self.grad_accumulation_steps}
        if self.alignment_manager is not None:
            meta["alignment"] = {
                "phase": self.alignment_manager.phase,
                "method": self.alignment_manager.current_method,
                "phase2_start": self._phase2_start,
            }
        if self._dur_weight_sched is not None:
            s = self._dur_weight_sched
            meta["dur_weight"] = {"ema_cov": s.ema_cov, "ema_diag": s.ema_diag,
                                  "prev_weight": s.prev_weight, "phase": s.phase}
        if self.phoneme_map is not None:
            meta["phoneme_map"] = dict(self.phoneme_map)
        return meta

    def _dump_alignment_viz(self, step: int, durations, batch: dict,
                            scalars: dict) -> None:
        """Write the periodic alignment snapshot the reference dumps as JSON
        (`trainer.py:1272-1277`): per-token MAS target durations for the first
        batch samples plus the device-side quality scalars."""
        out_dir = os.path.join(self.checkpoint_dir, "alignments")
        os.makedirs(out_dir, exist_ok=True)
        durs = np.asarray(durations)
        phon = np.asarray(batch.get("phoneme")) if batch.get("phoneme") is not None else None
        viz = {
            "update": step,
            "method": self.alignment_manager.current_method
            if self.alignment_manager is not None else None,
            "coverage": scalars.get("align_coverage"),
            "diagonal": scalars.get("align_diagonal"),
            "duration_weight": scalars.get("duration_weight"),
            "samples": [
                {
                    "durations": durs[i].tolist(),
                    "phoneme_ids": phon[i].tolist() if phon is not None else None,
                    "mel_len": int(batch["lens"][i]),
                }
                for i in range(min(2, durs.shape[0]))
            ],
        }
        with open(os.path.join(out_dir, f"alignment_{step}.json"), "w",
                  encoding="utf-8") as f:
            json.dump(viz, f, ensure_ascii=False)

    def restore_meta(self, meta: dict) -> tuple[int, int]:
        """Re-arm curriculum state machines from a checkpoint's sidecar; returns
        (start_epoch, skip_batches) for ``train``."""
        align = meta.get("alignment")
        if align and self.alignment_manager is not None:
            self.alignment_manager.phase = align["phase"]
            self.alignment_manager.current_method = align["method"]
            self._phase2_start = align["phase2_start"]
        dw = meta.get("dur_weight")
        if dw and self._dur_weight_sched is not None:
            self._dur_weight_sched.ema_cov = dw["ema_cov"]
            self._dur_weight_sched.ema_diag = dw["ema_diag"]
            self._dur_weight_sched.prev_weight = dw["prev_weight"]
            self._dur_weight_sched.phase = dw["phase"]
        pm = meta.get("phoneme_map")
        if pm and self.phoneme_map is not None:
            # in place: the collate closure holds the same dict object
            self.phoneme_map.clear()
            self.phoneme_map.update(pm)
        return meta.get("epoch", 0), meta.get("batch_in_epoch", 0)

    # ------------------------------------------------------------------
    # Checkpointing (Orbax)

    def save_checkpoint(self, state: TrainState, last: bool = False,
                        meta: dict | None = None) -> str:
        assert self.checkpoint_dir is not None
        step = int(state.step)
        self._host_step = step
        return checkpoint_save(self.checkpoint_dir, state, step, last=last,
                               meta=meta, keep_last_n=self.keep_last_n_checkpoints)

    def load_checkpoint(self, path: str, template: TrainState) -> TrainState:
        """Restore a full TrainState (params/EMA/optimizer/step AND the
        duration-predictor trio when enabled — dropping them silently broke
        curriculum resume). Also reads the ``.meta.json`` sidecar into
        ``self.resume_meta`` for ``restore_meta``."""
        restored, self.resume_meta = checkpoint_restore(path, template)
        rep = replicated(self.mesh)
        kwargs = {}
        if template.dur_pred_params is not None:
            kwargs = {
                "dur_pred_params": jax.device_put(restored.dur_pred_params, rep),
                "dur_align_params": jax.device_put(restored.dur_align_params, rep),
                "dur_opt_state": jax.device_put(restored.dur_opt_state, rep),
            }
        params = shard_params(self.mesh, restored.params)
        # The AdamW moments must come back with the SAME shardings init_state
        # gives them. Restoring them replicated on a model>1 mesh costs a
        # transient 2x-params HBM spike per device and a hidden reshard on the
        # first donated step.
        opt_shardings = self._opt_state_shardings(params)
        ema_shardings = (zero1_shardings if self.zero1 else param_shardings)(
            self.mesh, restored.ema_params)
        return TrainState(
            step=jnp.asarray(restored.step),
            params=params,
            opt_state=jax.device_put(restored.opt_state, opt_shardings),
            ema_params=jax.device_put(restored.ema_params, ema_shardings),
            **kwargs,
        )


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False
