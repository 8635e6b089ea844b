"""int8 W8A8 serving quality gate: int8 vs bf16 divergence on a fixed prompt.

The reference has no quantized path, so there is no parity number to match;
what matters before advertising `compute_dtype="int8"` is how far quantization
bends the ODE trajectory relative to the bf16 output of the SAME weights. This
measures, at fixed seed/prompt/text:

- ``rel_mse``: relative mel MSE over the generated region,
  ``mean((int8-bf16)^2)/mean(bf16^2)``;
- ``lsd_db``: log-spectral distance in dB between the generated mel regions
  (the standard objective proxy for vocoded-audio audibility of a change);
- ``forward_rel_mse``: single CFG transformer call divergence (pure numerics,
  no ODE error accumulation) — the cleanest kernel-level signal.

Run with an imported checkpoint to get production numbers, or random init for
the numerics-only signal (divergence is weight-distribution-dependent; random
init overestimates activation outliers vs trained weights):

    python benchmarks/quant_quality.py [--ckpt path.safetensors] [--smoke]

ECAPA-SIM between the two decoded wavs additionally requires imported speaker
-embedder weights (`eval/ecapa_tdnn.py`); pass --ecapa-ckpt to enable.

The same comparison backs the hard error path:
`F5TTSWrapper(compute_dtype="int8", int8_validate=True)` refuses to serve when
``rel_mse`` exceeds `INT8_REL_MSE_THRESHOLD` (`infer/wrapper.py`).
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import numpy as np

from eraxvif5tts_tpu.ops.quant import (  # noqa: F401  (re-exported for docs)
    INT8_REL_MSE_THRESHOLD,
    _fixed_inputs,
    quant_divergence,
)


def build_pair(smoke: bool, ckpt: str | None):
    """(cfm_bf16, params_bf16, cfm_int8, params_int8) over the same weights."""
    import jax
    import jax.numpy as jnp

    from eraxvif5tts_tpu.configs import PRESETS
    from eraxvif5tts_tpu.models import build_backbone
    from eraxvif5tts_tpu.models.cfm import CFM
    from eraxvif5tts_tpu.ops.quant import quantize_params

    cfg = PRESETS["F5TTS_v1_Base"]
    if smoke:
        cfg = dataclasses.replace(
            cfg, arch=dataclasses.replace(cfg.arch, dim=256, depth=4, heads=4,
                                          dim_head=64, text_dim=128,
                                          conv_layers=1))
    text_num_embeds = 2546

    tf_bf = build_backbone(cfg, text_num_embeds, compute_dtype=jnp.bfloat16)
    cfm_bf = CFM.build(tf_bf, cfg.mel_spec)
    if ckpt:
        from eraxvif5tts_tpu.compression.convert import (
            backbone_params_from_torch,
            infer_text_num_embeds,
            load_state_dict,
            normalize_reference_state_dict,
        )

        sd = normalize_reference_state_dict(load_state_dict(ckpt), use_ema=True)
        text_num_embeds = infer_text_num_embeds(sd)
        tf_bf = build_backbone(cfg, text_num_embeds, compute_dtype=jnp.bfloat16)
        cfm_bf = CFM.build(tf_bf, cfg.mel_spec)
        params = backbone_params_from_torch(
            sd, backbone=cfg.backbone, depth=cfg.arch.depth,
            conv_layers=cfg.arch.conv_layers,
            qk_norm=cfg.arch.qk_norm == "rms_norm",
            long_skip=cfg.arch.long_skip_connection)
    else:
        params = cfm_bf.init_params(jax.random.key(0))
        # fresh init is DEGENERATE for this comparison: AdaLN-zero gates make
        # every transformer block's contribution exactly zero, so int8-vs-bf16
        # divergence measures 0.0 no matter how broken quantization is.
        # Perturb ALL leaves so each quantized matmul contributes to the
        # output (documented as noise-perturbed init in the report).
        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(jax.random.key(42), len(leaves))
        leaves = [p + 0.02 * jax.random.normal(k, p.shape, p.dtype)
                  for p, k in zip(leaves, keys)]
        params = jax.tree.unflatten(treedef, leaves)
    params = jax.device_put(params)

    qcfg = dataclasses.replace(cfg, arch=dataclasses.replace(cfg.arch,
                                                             quantized=True))
    tf_q = build_backbone(qcfg, text_num_embeds, compute_dtype=jnp.bfloat16)
    cfm_q = CFM.build(tf_q, cfg.mel_spec)
    params_q = quantize_params(params)
    params_q = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16)
        if p.dtype == jnp.float32 and p.ndim > 1 else p, params_q)
    return cfm_bf, params, cfm_q, params_q


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="reference-format .pt/.safetensors checkpoint")
    ap.add_argument("--ecapa-ckpt", default=None,
                    help="torch ECAPA-TDNN weights for SIM between decoded wavs")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--steps", type=int, default=16)
    args = ap.parse_args()

    cfm_bf, params, cfm_q, params_q = build_pair(args.smoke, args.ckpt)
    report = quant_divergence(cfm_bf, params, cfm_q, params_q,
                              steps=args.steps,
                              max_duration=256 if args.smoke else 512)
    report["weights"] = "checkpoint" if args.ckpt else "noise-perturbed-init"
    report["threshold"] = INT8_REL_MSE_THRESHOLD

    if args.ecapa_ckpt:
        # decode both mels and embed: SIM = cosine(emb_bf16, emb_int8)
        import jax
        import jax.numpy as jnp

        import os
        import tempfile

        from eraxvif5tts_tpu.audio.io import write_wav
        from eraxvif5tts_tpu.eval.ecapa_tdnn import make_mel_embed_fn
        from eraxvif5tts_tpu.models.vocos import Vocos, decode_mel

        voc = Vocos(input_channels=cfm_bf.num_channels)
        vparams = jax.jit(voc.init)(
            jax.random.key(1),
            jnp.zeros((1, cfm_bf.num_channels, 8)))["params"]
        decode = jax.jit(lambda mel: decode_mel(voc, vparams,
                                                mel.swapaxes(1, 2)))
        embed_fn = make_mel_embed_fn(ckpt_path=args.ecapa_ckpt)
        embs = {}
        with tempfile.TemporaryDirectory() as td:
            for name, cfm, p in (("bf16", cfm_bf, params),
                                 ("int8", cfm_q, params_q)):
                cond, text, duration, lens = _fixed_inputs(cfm)
                mel = cfm.sample(p, cond, text, duration, lens,
                                 jax.random.key(3), steps=args.steps,
                                 max_duration=512)
                wav = np.asarray(decode(mel)[0], np.float32)
                path = os.path.join(td, f"{name}.wav")
                write_wav(path, wav, 24000)
                embs[name] = embed_fn(path)
        ea, eb = embs["int8"], embs["bf16"]
        report["ecapa_sim"] = float(
            np.dot(ea, eb) / (np.linalg.norm(ea) * np.linalg.norm(eb)))

    print(json.dumps(report))


if __name__ == "__main__":
    main()
