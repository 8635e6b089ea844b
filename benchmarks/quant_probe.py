"""Probe the int8 serving hypothesis on hardware before wiring it in:

1. int8 vs bf16 matmul throughput at the serving GEMM shape;
2. whether XLA hoists on-the-fly weight quantization out of a lax.scan loop
   (decides whether QDense can quantize inline or params must be pre-quantized).

    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/quant_probe.py
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from eraxvif5tts_tpu.ops.quant import int8_matmul, quantize_weight

    m, k, n = 2048, 1024, 2048
    x = jax.random.normal(jax.random.key(0), (m, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (k, n), jnp.float32) * 0.02
    w_bf = w.astype(jnp.bfloat16)
    w_q, w_s = jax.jit(quantize_weight)(w)

    def slope(fn):
        @functools.partial(jax.jit, static_argnames=("reps",))
        def loop(x, reps):
            def body(i, acc):
                out = fn(acc)
                return out[:, :k].astype(acc.dtype)
            return jax.lax.fori_loop(0, reps, body, x)

        r = 64
        np.asarray(loop(x, r).ravel()[:1]); np.asarray(loop(x, 4 * r).ravel()[:1])
        t1 = time.perf_counter(); np.asarray(loop(x, r).ravel()[:1]); t1 = time.perf_counter() - t1
        t4 = time.perf_counter(); np.asarray(loop(x, 4 * r).ravel()[:1]); t4 = time.perf_counter() - t4
        return (t4 - t1) / (3 * r) * 1e6

    flops = 2 * m * k * n
    us_bf16 = slope(lambda a: jnp.dot(a, w_bf, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    print(json.dumps({"bf16_us": round(us_bf16, 1),
                      "bf16_tflops": round(flops / us_bf16 / 1e6, 1)}), flush=True)

    us_i8 = slope(lambda a: int8_matmul(a, w_q, w_s))
    print(json.dumps({"int8_us": round(us_i8, 1),
                      "int8_tops": round(flops / us_i8 / 1e6, 1)}), flush=True)

    # inline quantization inside the loop: does XLA hoist it?
    us_i8_inline = slope(lambda a: int8_matmul(a, *quantize_weight(w)))
    print(json.dumps({"int8_inline_quant_us": round(us_i8_inline, 1)}), flush=True)


if __name__ == "__main__":
    main()
