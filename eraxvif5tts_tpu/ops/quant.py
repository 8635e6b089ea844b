"""Int8 quantized matmul path for serving (OPT-IN, experimental).

v5e's MXU runs int8 x int8 -> int32 at twice the bf16 rate; at the serving
shape the DiT forward is compute-bound on the projection/FF matmuls
(BASELINE.md "MFU analysis"), so W8A8 quantization of those matmuls raises the
RTF ceiling. Scheme:

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
    return (acc.astype(jnp.float32) * a_scale * w_scale[None, :]).astype(out_dtype)
