"""Mesh + sharding layer (the TPU-native replacement for the reference's
Accelerate/NCCL DDP plumbing — SURVEY.md §2.7).

Design:
- A 2-D logical mesh ``(data, model)``. Pure data parallelism is ``model=1`` (the
  reference's only strategy); setting ``model>1`` turns on tensor parallelism for the
  DiT matmuls via GSPMD sharding annotations — XLA inserts the all-reduces over ICI.
- Parameters are sharded by *name-pattern rules* (no model-code changes): attention
  q/k/v and FF input projections are column-sharded, output projections row-sharded,
  everything else replicated.
- Gradient reduction across ``data`` falls out of pjit: batch in, replicated grads
  out => psum over ICI.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        assert n_total % n_model == 0, f"{n_total} devices not divisible by model={n_model}"
        n_data = n_total // n_model
    assert n_data * n_model == n_total, (
        f"mesh {n_data}x{n_model} != {n_total} devices"
    )
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


# (regex over '/'-joined param path, PartitionSpec) — first match wins.
# Column-parallel: shard the output features; row-parallel: shard the input features.
_TP_RULES: list[tuple[str, P]] = [
    (r"attn/to_[qkv]/kernel$", P(None, "model")),
    (r"attn/to_[qkv]/bias$", P("model")),
    (r"attn/to_out/kernel$", P("model", None)),
    (r"ff/project_in/kernel$", P(None, "model")),
    (r"ff/project_in/bias$", P("model")),
    (r"ff/project_out/kernel$", P("model", None)),
    # AdaLN modulation produces 6*dim outputs consumed elementwise -> shard outputs
    # only when they stay local; keep replicated for correctness of the 6-way split.
]


def param_sharding_rules(path: str) -> P:
    """PartitionSpec for a param path like ``block_0/attn/to_q/kernel``."""
    for pattern, spec in _TP_RULES:
        if re.search(pattern, path):
            return spec
    return P()  # replicated


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_shardings(mesh: Mesh, params: Any, use_tp: bool = True) -> Any:
    """Pytree of NamedShardings matching ``params``."""
    def spec_for(key_path, leaf):
        if not use_tp or mesh.shape.get("model", 1) == 1:
            return NamedSharding(mesh, P())
        spec = param_sharding_rules(_path_str(key_path))
        # leaf.shape directly (not np.asarray): this must also work on traced
        # values so shardings can be derived inside jit (zero1 constraints)
        dims = tuple(leaf.shape) if hasattr(leaf, "shape") else np.asarray(leaf).shape
        # scan_layers stacks per-block params with a leading [depth] axis
        # (path `blocks/...` instead of `block_N/...`); the 2-D kernel rules
        # then apply to axes 1.. — replicate the depth axis.
        if dims and len(spec) and len(dims) == len(spec) + 1:
            spec = P(None, *spec)
        # only shard if divisible
        for axis, name in enumerate(spec):
            if name == "model" and dims and dims[axis] % mesh.shape["model"] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_for, params)


def zero1_shardings(mesh: Mesh, params: Any, use_tp: bool = True) -> Any:
    """ZeRO-1-style shardings for param-SHAPED optimizer/EMA state.

    Each leaf takes its param's TP spec and additionally shards the first
    free (unclaimed, divisible) dimension over ``data`` — so AdamW moments
    and the EMA tree are fully distributed across the mesh instead of
    replicated per data shard. GSPMD then partitions the optimizer update
    over ``data`` for free (each rank updates only its slice; the param
    add all-gathers the slices over ICI): the standard JAX formulation of
    ZeRO-1 / optimizer-state sharding, by annotation only — no step-logic
    changes (reference equivalent being distributed: the per-rank replicated
    optimizer of `src/f5_tts/model/trainer.py` DDP training). On the
    flagship (335.9M params, fp32 moments) this frees ~2 GB of HBM per chip
    at DP=4. Leaves with no divisible free dim stay on their param spec.
    """
    data = mesh.shape.get("data", 1)
    base = param_shardings(mesh, params, use_tp=use_tp)
    if data == 1:
        return base

    def add_data(leaf, s):
        dims = tuple(leaf.shape) if hasattr(leaf, "shape") else ()
        if not dims:
            return s
        spec = list(s.spec) + [None] * (len(dims) - len(s.spec))
        for i, dim in enumerate(dims):
            if spec[i] is None and dim % data == 0 and dim >= data:
                spec[i] = "data"
                return NamedSharding(mesh, P(*spec))
        return s

    return jax.tree.map(add_data, params, base)


def shard_params(mesh: Mesh, params: Any, use_tp: bool = True) -> Any:
    """Place params on the mesh according to the TP rules."""
    shardings = param_shardings(mesh, params, use_tp=use_tp)
    return jax.tree.map(jax.device_put, params, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays are sharded along the leading axis over ``data``."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def global_batch_from_local(mesh: Mesh, batch: Any) -> Any:
    """Assemble a globally-sharded batch from per-process local arrays.

    Multi-host training (SURVEY.md §2.7: per-host data loading over DCN): each
    process loads only its slice of the batch; this stitches the slices into
    global ``jax.Array``s sharded ``P('data')`` over the mesh without any
    cross-host transfer of array data. Single-process meshes (including the
    8-device virtual CPU mesh) take the same path — the local batch IS the
    global batch. The leading axis of every leaf must be the LOCAL batch size
    (global_batch / process_count).
    """
    bs = batch_sharding(mesh)

    n_proc = _process_count(mesh)

    def make(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * n_proc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(bs, x, global_shape)

    return jax.tree.map(make, batch)


def _process_count(mesh: Mesh) -> int:
    procs = {d.process_index for d in mesh.devices.flat}
    return max(len(procs), 1)
