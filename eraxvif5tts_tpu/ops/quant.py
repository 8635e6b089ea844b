"""Int8 quantized matmul path for serving (OPT-IN, experimental).

v5e's MXU runs int8 x int8 -> int32 faster than bf16, but the advantage is
shape-dependent: measured (`benchmarks/quant_probe.py`) 1.9x at the FF GEMM
(M=2048, N=2048) yet only 1.15x at the N=1024 projections, where bf16 is
already at peak. End-to-end NFE=32 serving: 27.0x vs 26.0x realtime (+4%) at
b=1 — the win grows with serving batch (GEMM M), so the path stays available
for batched deployments. Scheme:

- weights: symmetric per-output-channel int8, scales folded from the fp
  checkpoint at load (`quantize_params`);
- activations: dynamic symmetric per-token (row abs-max), computed on the fly —
  no calibration pass needed;
- accumulation int32, dequantized to the compute dtype before bias.

Quality note: W8A8 with per-channel weight scales is the standard
small-degradation recipe for >=300M transformers, but this repo cannot audit
audio quality offline (no released checkpoint ships with the reference), so
the path is opt-in via ``compute_dtype="int8"`` and parity-tested against bf16
within tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``w [d_in, d_out]`` -> (int8 ``w_q``, fp32 per-output-channel ``scale``)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)  # [d_out]
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
                out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """``x [..., d_in] @ dequant(w_q [d_in, d_out])`` with dynamic per-token
    activation quantization. Returns ``[..., d_out]`` in ``out_dtype``."""
    x32 = x.astype(jnp.float32)
    a_amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)  # [..., 1]
    a_scale = jnp.maximum(a_amax, 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(x32 / a_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_q,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * a_scale * w_scale).astype(out_dtype)


import flax.linen as nn  # noqa: E402  (quant is serving-side; flax is a core dep)


class QuantDense(nn.Module):
    """Drop-in replacement for ``nn.Dense`` reading pre-quantized params
    (``kernel_q`` int8 + ``kernel_scale`` fp32 per output channel, see
    :func:`quantize_params`)."""

    features: int
    dtype: object = jnp.bfloat16
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        d_in = x.shape[-1]
        w_q = self.param(
            "kernel_q", lambda key, shape: jnp.zeros(shape, jnp.int8),
            (d_in, self.features),
        )
        scale = self.param("kernel_scale", nn.initializers.ones, (self.features,))
        y = int8_matmul(x, w_q, scale, out_dtype=self.dtype)
        if not self.use_bias:
            return y
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return y + bias.astype(self.dtype)


class QuantDenseParams(nn.Module):
    """Declares ``kernel_q``/``kernel_scale``/``bias`` with
    :class:`QuantDense`'s exact param schema, for paths that feed the raw
    quantized weights to a fused Pallas kernel (`ops/quant_ff.py`) instead of
    calling the layer — sharing a scope name with a QuantDense used on another
    statically-selected branch yields an identical checkpoint tree either
    way (same pattern as ``models.modules.DenseParams``)."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        w_q = self.param(
            "kernel_q", lambda key, shape: jnp.zeros(shape, jnp.int8),
            (self.in_features, self.features),
        )
        scale = self.param("kernel_scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return w_q, scale, bias


_QUANT_SUFFIXES = (
    "to_q", "to_k", "to_v", "to_out", "project_in", "project_out",
    # MMDiT joint-attention text-stream projections
    "to_q_c", "to_k_c", "to_v_c", "to_out_c",
    # NOT "skip_proj" (UNetT long-skip concat projections, ~19% of E2TTS's
    # per-pass FLOPs): quantizing them measured NEGATIVE on v5e — E2TTS int8
    # device RTF 19.2x -> 18.7x (BASELINE.md) — the per-call activation
    # quantization pass over the [.., 2048] concat costs more than the
    # already-MXU-saturated [2048,1024] bf16 GEMM saves, and the int8 input
    # breaks XLA's fusion of the concat into the GEMM.
)


def _name_matches(name: str, suffixes: tuple[str, ...]) -> bool:
    if name in suffixes:
        return True
    # indexed layers: "skip_proj_13" matches the "skip_proj" suffix
    stem, _, idx = name.rpartition("_")
    return bool(stem) and idx.isdigit() and stem in suffixes


def quantize_params(params, suffixes: tuple[str, ...] = _QUANT_SUFFIXES):
    """Transform an fp param tree for a `quantized=True` backbone: every Dense
    subtree named in ``suffixes`` (exact, or ``name_<idx>`` for indexed layers)
    has its ``kernel`` replaced by ``kernel_q``/``kernel_scale`` (what
    :class:`QuantDense` reads). Pure; run once at load — inline per-call
    quantization is NOT hoisted out of the Euler scan by XLA (measured: 30 us
    vs 13.7 us per GEMM)."""
    def walk(tree, name):
        if isinstance(tree, dict):
            if _name_matches(name, suffixes) and "kernel" in tree:
                w_q, scale = quantize_weight(jnp.asarray(tree["kernel"]))
                out = {k: v for k, v in tree.items() if k != "kernel"}
                out["kernel_q"] = w_q
                out["kernel_scale"] = scale
                return out
            return {k: walk(v, k) for k, v in tree.items()}
        return tree

    return walk(params, "")


# ---------------------------------------------------------------------------
# quality gate: int8 must stay within a bounded divergence from the bf16 path
# over the SAME weights (no reference number exists — the reference has no
# quantized path; the gate guards against silent quantization failure).

# 1% relative mel-MSE. Calibration (round 4, BASELINE.md quality table):
# TRAINED full-flagship weights (800 updates on real speech via
# scripts/convergence_real.py --preset, exported through the torch schema)
# measure rel_mse 1.7e-5; the adversarial noise-perturbed init measures
# 1.6e-4. The gate sits ~2 orders above the worst measured healthy case and
# ~3 above the trained case, while genuine quantization breakage (wrong
# scale axis, transposed kernel_q, missing dequant) lands at O(0.1-1) —
# tightened from the pre-calibration 5e-2.
INT8_REL_MSE_THRESHOLD = 1e-2


def _fixed_inputs(cfm, max_duration: int = 512, text_len: int = 32,
                  prompt_frames: int = 128):
    """Deterministic (cond, text, duration, lens) fixture shared by the quality
    gate and `benchmarks/quant_quality.py`."""
    d = cfm.num_channels
    vocab = min(getattr(cfm.transformer, "text_num_embeds", 100), 100)
    kc, kt = jax.random.split(jax.random.key(7))
    cond = 0.3 * jax.random.normal(kc, (1, prompt_frames, d), jnp.float32)
    text = jnp.pad(
        jax.random.randint(kt, (1, text_len), 0, vocab),
        ((0, 0), (0, 8)), constant_values=-1)
    duration = jnp.asarray([max_duration - 64])
    lens = jnp.asarray([prompt_frames])
    return cond, text, duration, lens


def quant_divergence(cfm_bf16, params_bf16, cfm_int8, params_int8,
                     steps: int = 16, max_duration: int = 512,
                     text_len: int = 32, prompt_frames: int = 128) -> dict:
    """int8-vs-bf16 divergence on a fixed prompt/seed: relative mel MSE over
    the generated region, log-spectral distance (dB), and single-forward
    relative MSE. ``passes_gate`` applies :data:`INT8_REL_MSE_THRESHOLD`."""
    import numpy as np

    if max_duration - 64 <= prompt_frames:
        raise ValueError(
            f"max_duration={max_duration} leaves no generated region to score "
            f"(needs > prompt_frames+64 = {prompt_frames + 64})")
    cond, text, duration, lens = _fixed_inputs(
        cfm_bf16, max_duration, text_len, prompt_frames)

    outs = {}
    for name, cfm, params in (("bf16", cfm_bf16, params_bf16),
                              ("int8", cfm_int8, params_int8)):
        mel = cfm.sample(params, cond, text, duration, lens, jax.random.key(3),
                         steps=steps, max_duration=max_duration)
        outs[name] = np.asarray(mel[0, prompt_frames:max_duration - 64],
                                np.float64)

    a, b = outs["int8"], outs["bf16"]
    rel_mse = float(np.mean((a - b) ** 2) / max(np.mean(b * b), 1e-12))
    # mels are log-magnitude already: LSD = rms frame-wise dB difference
    lsd_db = float(np.mean(np.sqrt(np.mean((20 / np.log(10) * (a - b)) ** 2,
                                           axis=-1))))

    x_in = 0.5 * jax.random.normal(jax.random.key(11),
                                   (1, max_duration, cfm_bf16.num_channels),
                                   jnp.float32)
    cond_full = jnp.pad(cond, ((0, 0), (0, max_duration - prompt_frames),
                               (0, 0)))
    fwd = {}
    for name, cfm, params in (("bf16", cfm_bf16, params_bf16),
                              ("int8", cfm_int8, params_int8)):
        apply = jax.jit(lambda p, cfm=cfm: cfm.transformer.apply(
            {"params": p},
            x_in, cond_full, text, jnp.full((1,), 0.5),
            drop_audio_cond=jnp.zeros((1,), bool),
            drop_text=jnp.zeros((1,), bool),
            mask=jnp.arange(max_duration)[None, :] < (max_duration - 64),
        ))
        fwd[name] = np.asarray(apply(params), np.float64)
    forward_rel_mse = float(
        np.mean((fwd["int8"] - fwd["bf16"]) ** 2)
        / max(np.mean(fwd["bf16"] ** 2), 1e-12))

    return {"rel_mse": rel_mse, "lsd_db": lsd_db,
            "forward_rel_mse": forward_rel_mse,
            "passes_gate": rel_mse <= INT8_REL_MSE_THRESHOLD}
