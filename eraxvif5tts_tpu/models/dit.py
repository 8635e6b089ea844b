"""DiT backbone (flax.linen), parity with reference
`src/f5_tts/model/backbones/dit.py` but structured for single-trace CFG.

TPU-first differences from the reference:
- ``drop_audio_cond`` / ``drop_text`` are per-sample boolean *arrays*, so classifier-
  free guidance runs the cond and uncond branches as ONE transformer call on a
  doubled batch (replacing the two sequential calls at reference `cfm.py:159-173`).
- The text embedding is exposed as a separate method so the ODE sampler computes it
  once outside the ``lax.scan`` Euler loop (replacing the mutable text cache of
  `dit.py:202-212`).
- Rotary angle tables are trace-time constants per static sequence bucket.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from eraxvif5tts_tpu.configs import ArchConfig
from eraxvif5tts_tpu.models.modules import (
    AdaLayerNormFinal,
    ConvNeXtV2Block,
    ConvPositionEmbedding,
    DiTBlock,
    ScanDiTBlock,
    TimestepEmbedding,
)
from eraxvif5tts_tpu.ops.rotary import abs_pos_embedding_table, rotary_freqs

MAX_POS = 4096  # sequence cap, ~44 s @ 24 kHz hop 256 (reference `dit.py:41`, `cfm.py:93`)


class TextEmbedding(nn.Module):
    """Char-id embedding + abs sin position + ConvNeXtV2 stack (`dit.py:32-79`).

    ``text`` ids are the -1-padded tokenizer output; +1 shifts them so 0 is the filler
    token. ``drop_text`` (bool array [b]) zeroes the ids for the CFG uncond branch.
    """

    text_num_embeds: int
    text_dim: int
    mask_padding: bool = True
    conv_layers: int = 0
    conv_mult: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, text: jnp.ndarray, seq_len: int, drop_text: jnp.ndarray) -> jnp.ndarray:
        text = text + 1  # 0 becomes the filler token
        text = text[:, :seq_len]
        pad = seq_len - text.shape[1]
        if pad > 0:
            text = jnp.pad(text, ((0, 0), (0, pad)))
        # Mask marks padding+filler of the ORIGINAL ids: computed BEFORE the CFG
        # drop (reference `dit.py:54-59`), so the uncond branch still runs the
        # conv stack over filler-token embeddings masked only at true padding.
        filler_mask = text == 0

        drop_text = jnp.asarray(drop_text)
        if drop_text.ndim == 0:
            drop_text = jnp.broadcast_to(drop_text, (text.shape[0],))
        text = jnp.where(drop_text[:, None], 0, text)

        embed = nn.Embed(self.text_num_embeds + 1, self.text_dim, name="embed")(text)
        embed = embed.astype(self.dtype)

        if self.conv_layers > 0:
            table = jnp.asarray(abs_pos_embedding_table(self.text_dim, MAX_POS), self.dtype)
            embed = embed + table[:seq_len][None, :, :]
            if self.mask_padding:
                embed = jnp.where(filler_mask[..., None], 0.0, embed)
                for i in range(self.conv_layers):
                    embed = ConvNeXtV2Block(
                        self.text_dim, self.text_dim * self.conv_mult,
                        dtype=self.dtype, name=f"conv_{i}"
                    )(embed)
                    embed = jnp.where(filler_mask[..., None], 0.0, embed)
            else:
                for i in range(self.conv_layers):
                    embed = ConvNeXtV2Block(
                        self.text_dim, self.text_dim * self.conv_mult,
                        dtype=self.dtype, name=f"conv_{i}"
                    )(embed)
        return embed


class InputEmbedding(nn.Module):
    """Linear(cat(x, cond, text)) + conv position embedding (`dit.py:85-97`)."""

    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        cond: jnp.ndarray,
        text_embed: jnp.ndarray,
        drop_audio_cond: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        drop_audio_cond = jnp.asarray(drop_audio_cond)
        if drop_audio_cond.ndim == 0:
            drop_audio_cond = jnp.broadcast_to(drop_audio_cond, (x.shape[0],))
        cond = jnp.where(drop_audio_cond[:, None, None], 0.0, cond)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(
            jnp.concatenate([x, cond, text_embed], axis=-1).astype(self.dtype)
        )
        x = ConvPositionEmbedding(self.out_dim, dtype=self.dtype, name="conv_pos_embed")(x, mask=mask) + x
        return x


class DiT(nn.Module):
    """Flow-prediction DiT: ``(x, cond, text, t) -> flow [b, n, mel]`` (`dit.py:103-233`)."""

    arch: ArchConfig
    text_num_embeds: int = 256
    mel_dim: int = 100
    compute_dtype: Any = jnp.float32

    @property
    def text_dim(self) -> int:
        return self.arch.text_dim if self.arch.text_dim is not None else self.mel_dim

    def setup(self):
        a = self.arch
        self.time_embed = TimestepEmbedding(a.dim, dtype=self.compute_dtype, name="time_embed")
        self.text_embed = TextEmbedding(
            self.text_num_embeds,
            self.text_dim,
            mask_padding=a.text_mask_padding,
            conv_layers=a.conv_layers,
            dtype=self.compute_dtype,
            name="text_embed",
        )
        self.input_embed = InputEmbedding(a.dim, dtype=self.compute_dtype, name="input_embed")
        # Rematerialization trades FLOPs for HBM on the backward pass
        # (reference `dit.py:221-223` uses torch activation checkpointing).
        # static arg 5 = `deterministic` (0 is self); rope (4) is a traced constant
        base_cls = ScanDiTBlock if a.scan_layers else DiTBlock
        if a.scan_layers and a.quantized:
            raise ValueError(
                "scan_layers=True does not support quantized=True: int8 serving "
                "pre-quantizes per-block param subtrees (ops/quant.quantize_params); "
                "use the unrolled form for int8."
            )
        if a.checkpoint_activations:
            if a.remat_policy == "dots":
                import jax

                block_cls = nn.remat(
                    base_cls, static_argnums=(5,),
                    policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                )
            elif a.remat_policy == "attn":
                # middle ground measured on v5e: "dots" OOMs at the 9x4096
                # reference batch (needs +3.5 GB over HBM) while "full"
                # re-runs the whole block forward — including the flash
                # attention kernel, the most expensive single op to recompute.
                # Saving ONLY the attention outputs costs b*n*dim*2B per layer
                # (~75 MB at 9x4096x1024, ~1.6 GB over 22 layers) and skips
                # the attention recompute in the backward.
                import jax

                block_cls = nn.remat(
                    base_cls, static_argnums=(5,),
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "dit_attn_out"),
                )
            elif a.remat_policy in ("full", "auto"):
                # "auto" is resolved from the per-chip frame budget by
                # configs.resolve_remat_policy at trainer build time; an
                # unresolved "auto" reaching a model builder means a direct
                # construction (tests, serving) — take the conservative
                # max-batch default.
                block_cls = nn.remat(base_cls, static_argnums=(5,))
            else:
                raise ValueError(
                    f"unknown remat_policy {a.remat_policy!r} (auto|full|dots|attn)")
        else:
            block_cls = base_cls
        block_kwargs = dict(
            dim=a.dim,
            heads=a.heads,
            dim_head=a.dim_head,
            ff_mult=a.ff_mult,
            dropout=a.dropout,
            qk_norm=a.qk_norm,
            pe_attn_head=a.pe_attn_head,
            dtype=self.compute_dtype,
            quantized=a.quantized,
        )
        if a.scan_layers:
            # One compiled block body for the whole stack: params stack to
            # [depth, ...] under "blocks"; t/mask/rope/deterministic broadcast
            # into every iteration, x is the scan carry. Per-layer init and
            # dropout streams stay distinct via split_rngs.
            scan_cls = nn.scan(
                block_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
                length=a.depth,
            )
            self.blocks = scan_cls(**block_kwargs, name="blocks")
        else:
            self.blocks = [
                block_cls(**block_kwargs, name=f"block_{i}")
                for i in range(a.depth)
            ]
        if a.long_skip_connection:
            self.long_skip = nn.Dense(a.dim, use_bias=False, dtype=self.compute_dtype, name="long_skip")
        self.norm_out = AdaLayerNormFinal(a.dim, dtype=self.compute_dtype, name="norm_out")
        self.proj_out = nn.Dense(
            self.mel_dim,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj_out",
        )

    def embed_text(self, text: jnp.ndarray, seq_len: int, drop_text) -> jnp.ndarray:
        """Standalone text embedding for out-of-loop CFG caching."""
        return self.text_embed(text, seq_len, drop_text)

    def run(
        self,
        x: jnp.ndarray,
        cond: jnp.ndarray,
        text_embed: jnp.ndarray,
        time: jnp.ndarray,
        drop_audio_cond,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Forward from a precomputed text embedding (the ODE-loop hot path)."""
        batch, seq_len = x.shape[0], x.shape[1]
        if time.ndim == 0:
            time = jnp.broadcast_to(time, (batch,))
        x = x.astype(self.compute_dtype)
        cond = cond.astype(self.compute_dtype)
        text_embed = text_embed.astype(self.compute_dtype)
        t = self.time_embed(time)
        h = self.input_embed(x, cond, text_embed, drop_audio_cond, mask=mask)

        rope = rotary_freqs(seq_len, self.arch.dim_head)

        if self.arch.long_skip_connection:
            residual = h

        if self.arch.scan_layers:
            h, _ = self.blocks(h, t, mask, rope, deterministic)
        else:
            for block in self.blocks:
                h = block(h, t, mask, rope, deterministic)

        if self.arch.long_skip_connection:
            h = self.long_skip(jnp.concatenate([h, residual], axis=-1))

        h = self.norm_out(h, t)
        return self.proj_out(h).astype(jnp.float32)

    def __call__(
        self,
        x: jnp.ndarray,
        cond: jnp.ndarray,
        text: jnp.ndarray,
        time: jnp.ndarray,
        drop_audio_cond=False,
        drop_text=False,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        seq_len = x.shape[1]
        text_embed = self.text_embed(text, seq_len, drop_text)
        return self.run(
            x, cond, text_embed, time, drop_audio_cond, mask=mask, deterministic=deterministic
        )
