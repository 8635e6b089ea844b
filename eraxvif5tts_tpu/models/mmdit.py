"""MMDiT backbone: SD3-style dual-stream joint attention.

Parity with reference `src/f5_tts/model/backbones/mmdit.py:85-189` and the
``MMDiTBlock``/``JointAttnProcessor`` modules (`modules.py:510-604, 647-715`):
text stream + audio stream with separate AdaLN-zero modulation, joint attention
over the concatenated sequence (audio rope and text rope applied independently,
text positions unmasked), ``context_pre_only`` final layer.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from eraxvif5tts_tpu.configs import ArchConfig
from eraxvif5tts_tpu.models.modules import (
    AdaLayerNorm,
    AdaLayerNormFinal,
    ConvPositionEmbedding,
    FeedForward,
    RMSNorm,
    TimestepEmbedding,
    _dense,
)
from eraxvif5tts_tpu.ops.attention import (
    chunked_dot_product_attention,
    dot_product_attention,
)
from eraxvif5tts_tpu.ops.rotary import abs_pos_embedding_table, apply_rotary, rotary_freqs

TEXT_MAX_POS = 1024  # reference `mmdit.py:37`


class MMTextEmbedding(nn.Module):
    """Char embedding + abs sin position over the raw text length (`mmdit.py:30-61`)."""

    text_num_embeds: int
    out_dim: int
    mask_padding: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, text: jnp.ndarray, drop_text) -> jnp.ndarray:
        text = text + 1
        # Mask computed BEFORE the CFG drop (reference `mmdit.py:40-44`).
        filler_mask = text == 0
        drop_text = jnp.asarray(drop_text)
        if drop_text.ndim == 0:
            drop_text = jnp.broadcast_to(drop_text, (text.shape[0],))
        text = jnp.where(drop_text[:, None], 0, text)
        embed = nn.Embed(self.text_num_embeds + 1, self.out_dim, name="embed")(text)
        embed = embed.astype(self.dtype)
        table = jnp.asarray(abs_pos_embedding_table(self.out_dim, TEXT_MAX_POS), self.dtype)
        nt = text.shape[1]
        pos = table[jnp.minimum(jnp.arange(nt), TEXT_MAX_POS - 1)]
        embed = embed + pos[None]
        if self.mask_padding:
            embed = jnp.where(filler_mask[..., None], 0.0, embed)
        return embed


class AudioEmbedding(nn.Module):
    """Linear(cat(x, cond)) + conv pos embed (`mmdit.py:67-79`)."""

    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond, drop_audio_cond):
        drop_audio_cond = jnp.asarray(drop_audio_cond)
        if drop_audio_cond.ndim == 0:
            drop_audio_cond = jnp.broadcast_to(drop_audio_cond, (x.shape[0],))
        cond = jnp.where(drop_audio_cond[:, None, None], 0.0, cond)
        h = nn.Dense(self.out_dim, dtype=self.dtype, name="linear")(
            jnp.concatenate([x, cond], axis=-1).astype(self.dtype)
        )
        h = ConvPositionEmbedding(self.out_dim, dtype=self.dtype, name="conv_pos_embed")(h) + h
        return h


class JointAttention(nn.Module):
    """Joint attention over concatenated (audio, text) streams
    (`modules.py:510-604`)."""

    dim: int
    heads: int
    dim_head: int
    dropout: float = 0.1
    context_pre_only: bool = False
    qk_norm: Optional[str] = None
    dtype: Any = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x, c, mask=None, rope=None, c_rope=None, deterministic=True):
        b, n, _ = x.shape
        nt = c.shape[1]
        inner = self.heads * self.dim_head
        dense = _dense(self.quantized)

        def proj(name, inp):
            return dense(inner, dtype=self.dtype, name=name)(inp).reshape(
                inp.shape[0], inp.shape[1], self.heads, self.dim_head
            )

        q, k, v = proj("to_q", x), proj("to_k", x), proj("to_v", x)
        cq, ck, cv = proj("to_q_c", c), proj("to_k_c", c), proj("to_v_c", c)

        if self.qk_norm == "rms_norm":
            q = RMSNorm(self.dim_head, name="q_norm")(q)
            k = RMSNorm(self.dim_head, name="k_norm")(k)
            cq = RMSNorm(self.dim_head, name="c_q_norm")(cq)
            ck = RMSNorm(self.dim_head, name="c_k_norm")(ck)

        if rope is not None:
            q = apply_rotary(q.swapaxes(1, 2), rope).swapaxes(1, 2)
            k = apply_rotary(k.swapaxes(1, 2), rope).swapaxes(1, 2)
        if c_rope is not None:
            cq = apply_rotary(cq.swapaxes(1, 2), c_rope).swapaxes(1, 2)
            ck = apply_rotary(ck.swapaxes(1, 2), c_rope).swapaxes(1, 2)

        # TEXT-FIRST joint order (the reference concatenates audio first,
        # `modules.py:560-566`; softmax attention is permutation-equivariant
        # over keys and the rotary phases ride each stream's own positions, so
        # the order is free) — it makes the joint validity mask a CONTIGUOUS
        # PREFIX ([all-valid text | prefix-valid audio]), which is what the
        # one-shot serving kernel requires to engage on TPU
        # (ops/attention.use_serving_kernel: prefix_key_mask).
        q = jnp.concatenate([cq, q], axis=1)
        k = jnp.concatenate([ck, k], axis=1)
        v = jnp.concatenate([cv, v], axis=1)

        key_valid = None
        if mask is not None:
            key_valid = jnp.pad(mask, ((0, 0), (nt, 0)), constant_values=True)

        if not deterministic and self.dropout > 0.0:
            # attention-weight dropout on the train path (`modules.py:582`)
            out = chunked_dot_product_attention(
                q, k, v, key_valid=key_valid, dropout_rate=self.dropout,
                dropout_rng=self.make_rng("dropout"),
            )
        else:
            # masks reaching MMDiT are always frame prefix masks (CFM.sample's
            # lens_to_mask; CFM.loss passes none), so the text-first joint
            # mask is a contiguous prefix
            out = dot_product_attention(q, k, v, key_valid=key_valid,
                                        trainable=not deterministic,
                                        prefix_key_mask=True)
        out = out.reshape(b, n + nt, inner)
        c_out, x_out = out[:, :nt], out[:, nt:]

        x_out = dense(self.dim, dtype=self.dtype, name="to_out")(x_out)
        if not deterministic and self.dropout > 0.0:
            x_out = hash_dropout(x_out, self.dropout, self.make_rng("dropout"))
        if not self.context_pre_only:
            c_out = dense(self.dim, dtype=self.dtype, name="to_out_c")(c_out)
        if mask is not None:
            x_out = jnp.where(mask[..., None], x_out, 0.0)
        return x_out, c_out


class MMDiTBlock(nn.Module):
    """Dual-stream block (`modules.py:647-715`)."""

    dim: int
    heads: int
    dim_head: int
    ff_mult: int = 4
    dropout: float = 0.1
    context_pre_only: bool = False
    qk_norm: Optional[str] = None
    dtype: Any = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x, c, t, mask=None, rope=None, c_rope=None, deterministic=True):
        if self.context_pre_only:
            norm_c = AdaLayerNormFinal(self.dim, dtype=self.dtype, name="attn_norm_c")(c, t)
        else:
            norm_c, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = AdaLayerNorm(
                self.dim, dtype=self.dtype, name="attn_norm_c"
            )(c, t)
        norm_x, x_gate_msa, x_shift_mlp, x_scale_mlp, x_gate_mlp = AdaLayerNorm(
            self.dim, dtype=self.dtype, name="attn_norm_x"
        )(x, t)

        x_attn, c_attn = JointAttention(
            dim=self.dim, heads=self.heads, dim_head=self.dim_head,
            dropout=self.dropout, context_pre_only=self.context_pre_only,
            qk_norm=self.qk_norm, dtype=self.dtype, quantized=self.quantized,
            name="attn",
        )(norm_x, norm_c, mask=mask, rope=rope, c_rope=c_rope, deterministic=deterministic)

        if self.context_pre_only:
            c_out = None
        else:
            c = c + c_gate_msa[:, None] * c_attn
            norm_c2 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                                   dtype=self.dtype, name="ff_norm_c")(c)
            norm_c2 = norm_c2 * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
            c_out = c + c_gate_mlp[:, None] * FeedForward(
                self.dim, mult=self.ff_mult, dropout=self.dropout,
                dtype=self.dtype, quantized=self.quantized, name="ff_c",
            )(norm_c2, deterministic=deterministic)

        x = x + x_gate_msa[:, None] * x_attn
        norm_x2 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                               dtype=self.dtype, name="ff_norm_x")(x)
        norm_x2 = norm_x2 * (1 + x_scale_mlp[:, None]) + x_shift_mlp[:, None]
        x = x + x_gate_mlp[:, None] * FeedForward(
            self.dim, mult=self.ff_mult, dropout=self.dropout,
            dtype=self.dtype, quantized=self.quantized, name="ff_x",
        )(norm_x2, deterministic=deterministic)
        return c_out, x


class MMDiT(nn.Module):
    arch: ArchConfig
    text_num_embeds: int = 256
    mel_dim: int = 100
    compute_dtype: Any = jnp.float32

    def setup(self):
        a = self.arch
        self.time_embed = TimestepEmbedding(a.dim, dtype=self.compute_dtype, name="time_embed")
        self.text_embed = MMTextEmbedding(
            self.text_num_embeds, a.dim, mask_padding=a.text_mask_padding,
            dtype=self.compute_dtype, name="text_embed",
        )
        self.audio_embed = AudioEmbedding(a.dim, dtype=self.compute_dtype, name="audio_embed")
        self.blocks = [
            MMDiTBlock(
                dim=a.dim, heads=a.heads, dim_head=a.dim_head, ff_mult=a.ff_mult,
                dropout=a.dropout, context_pre_only=(i == a.depth - 1),
                qk_norm=a.qk_norm, dtype=self.compute_dtype,
                quantized=a.quantized, name=f"block_{i}",
            )
            for i in range(a.depth)
        ]
        self.norm_out = AdaLayerNormFinal(a.dim, dtype=self.compute_dtype, name="norm_out")
        self.proj_out = nn.Dense(
            self.mel_dim,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj_out",
        )

    def embed_text(self, text: jnp.ndarray, seq_len: int, drop_text) -> jnp.ndarray:
        # seq_len unused: MMDiT keeps the text stream at its own length (`mmdit.py:40`)
        return self.text_embed(text, drop_text)

    def run(self, x, cond, text_embed, time, drop_audio_cond, mask=None,
            deterministic=True):
        batch, seq_len = x.shape[0], x.shape[1]
        if time.ndim == 0:
            time = jnp.broadcast_to(time, (batch,))
        x = x.astype(self.compute_dtype)
        cond = cond.astype(self.compute_dtype)
        c = text_embed.astype(self.compute_dtype)

        t = self.time_embed(time)
        h = self.audio_embed(x, cond, drop_audio_cond)

        rope_audio = rotary_freqs(seq_len, self.arch.dim_head)
        rope_text = rotary_freqs(c.shape[1], self.arch.dim_head)

        for block in self.blocks:
            c, h = block(h, c, t, mask=mask, rope=rope_audio, c_rope=rope_text,
                         deterministic=deterministic)

        h = self.norm_out(h, t)
        return self.proj_out(h).astype(jnp.float32)

    def __call__(self, x, cond, text, time, drop_audio_cond=False, drop_text=False,
                 mask=None, deterministic=True):
        c = self.text_embed(text, drop_text)
        return self.run(x, cond, c, time, drop_audio_cond, mask=mask,
                        deterministic=deterministic)
