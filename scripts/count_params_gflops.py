"""Parameter + FLOP counter (reference `src/f5_tts/scripts/count_params_gflops.py`:
335.8M params / 363.4 GFLOPs for one 20 s denoise pass of F5TTS_Base).

Uses ``jax.eval_shape`` for params (no allocation) and XLA's own cost analysis for
FLOPs of one backbone forward. Note: XLA counts true FLOPs (2 per MAC, attention
included) — ~1054 G for the same pass the reference's thop reports as 363.4 G
(MACs, attention excluded); params match at 335.9 M.
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="F5TTS_v1_Base")
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--vocab", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from eraxvif5tts_tpu.configs import PRESETS
    from eraxvif5tts_tpu.models import build_backbone

    cfg = PRESETS[args.model]
    model = build_backbone(cfg, text_num_embeds=args.vocab)
    n = int(args.seconds * cfg.mel_spec.target_sample_rate / cfg.mel_spec.hop_length)
    d = cfg.mel_spec.n_mel_channels
    x = jnp.zeros((1, n, d))
    inputs = (jax.random.key(0), x, x, jnp.zeros((1, n // 4), jnp.int32), jnp.zeros((1,)))

    shapes = jax.eval_shape(model.init, *inputs)
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))

    def fwd(params, x, cond, text, time):
        return model.apply({"params": params}, x, cond, text, time)

    params_shapes = shapes["params"]
    lowered = jax.jit(fwd).lower(params_shapes, *([jax.ShapeDtypeStruct(a.shape, a.dtype)
                                                   for a in inputs[1:]]))
    try:
        cost = lowered.compile().cost_analysis()
        flops = cost.get("flops") if isinstance(cost, dict) else cost[0].get("flops")
    except Exception:
        flops = None

    print(f"{args.model}: {n_params/1e6:.1f} M params", end="")
    if flops:
        print(f", {flops/1e9:.1f} GFLOPs per denoise pass ({args.seconds:.0f}s audio)")
    else:
        print(" (FLOP analysis unavailable on this backend)")


if __name__ == "__main__":
    main()
