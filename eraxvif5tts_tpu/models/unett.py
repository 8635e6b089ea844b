"""UNetT backbone (E2-TTS): flat UNet transformer with skip connections.

Parity with reference `src/f5_tts/model/backbones/unett.py:106-250`: time embedding
packed as frame 0 (`:215`), pre-RMSNorm attention/FF with residuals (`:243-244`),
first-half activations stacked and concat+projected into the second half
(`:222-246`). Same CFG-as-batch and out-of-loop text-embedding reformulation as
``DiT`` (see `models/dit.py`).

``arch.scan_layers=True`` compiles the stack as TWO ``nn.scan`` bodies (down
emits skips as scan outputs, up consumes them reversed as scan inputs) —
the E2TTS fast-compile mode; params stack under ``down_blocks``/``up_blocks``
with `compression/convert.py` adapters keeping the flat checkpoint schema.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from eraxvif5tts_tpu.configs import ArchConfig
from eraxvif5tts_tpu.models.dit import InputEmbedding, TextEmbedding
from eraxvif5tts_tpu.models.modules import Attention, FeedForward, TimestepEmbedding
from eraxvif5tts_tpu.ops.rotary import rotary_freqs


class XRMSNorm(nn.Module):
    """x_transformers-style RMSNorm: ``normalize(x) * sqrt(d) * g``."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, scale_only: bool = False) -> jnp.ndarray:
        g = self.param("g", nn.initializers.ones, (self.dim,))
        if scale_only:
            # fused serving path: the caller folds g into the
            # ln_mod_matmul(norm="rms") modulation vector
            return g
        norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True))
        normed = x / jnp.maximum(norm, 1e-12).astype(x.dtype)
        return normed * (self.dim ** 0.5) * g


def _unett_block_forward(self, h, skip, mask, rope, deterministic):
    """One UNetT layer (skip merge -> pre-RMSNorm attn -> pre-RMSNorm FF,
    residuals), shared by the unrolled-equivalent :class:`UNetTBlock` scan
    bodies. Submodule names (`skip_proj`/`attn_norm`/`attn`/`ff_norm`/`ff`)
    match the flat per-index names of the unrolled form modulo the `_idx`
    suffix — `compression/convert.py` adapts the layouts."""
    from eraxvif5tts_tpu.ops.fused_matmul import dit_block_fusion_ok

    if self.has_skip:
        if self.skip_connect_type == "concat":
            h = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                         name="skip_proj")(jnp.concatenate([h, skip], axis=-1))
        elif self.skip_connect_type == "add":
            h = h + skip
    attn_norm = XRMSNorm(self.dim, name="attn_norm")
    attn = Attention(dim=self.dim, heads=self.heads, dim_head=self.dim_head,
                     dropout=self.dropout, qk_norm=self.qk_norm,
                     pe_attn_head=self.pe_attn_head, dtype=self.dtype,
                     quantized=self.quantized, name="attn")
    ff_norm = XRMSNorm(self.dim, name="ff_norm")
    ff = FeedForward(self.dim, mult=self.ff_mult, dropout=self.dropout,
                     dtype=self.dtype, quantized=self.quantized, name="ff")

    fused = (
        deterministic
        and not self.quantized
        and dit_block_fusion_ok(h.shape[1], self.dim,
                                self.heads * self.dim_head,
                                int(self.dim * self.ff_mult), self.dtype)
    )
    h = attn(attn_norm(h), mask=mask, rope=rope, deterministic=deterministic) + h
    if fused:
        g = ff_norm(h, scale_only=True).astype(jnp.float32)
        mod_scale = jnp.broadcast_to(g[None, :] - 1.0, (h.shape[0], self.dim))
        return ff(h, deterministic=True,
                  fused_adaln=(mod_scale, jnp.zeros_like(mod_scale)),
                  fused_norm="rms") + h
    return ff(ff_norm(h), deterministic=deterministic) + h


class UNetTBlock(nn.Module):
    """One UNetT layer as a module — the `arch.scan_layers` scan body."""

    dim: int
    heads: int
    dim_head: int
    ff_mult: int = 4
    dropout: float = 0.1
    qk_norm: Optional[str] = None
    pe_attn_head: Optional[int] = None
    dtype: Any = jnp.float32
    quantized: bool = False
    has_skip: bool = False
    skip_connect_type: str = "concat"

    @nn.compact
    def __call__(self, h, skip=None, mask=None, rope=None, deterministic=True):
        return _unett_block_forward(self, h, skip, mask, rope, deterministic)


class ScanUNetTDownBlock(UNetTBlock):
    """First-half scan body: carries h, emits the PRE-block h as the skip
    activation (`unett.py:222-234` pushes before processing)."""

    @nn.compact
    def __call__(self, h, mask=None, rope=None, deterministic=True):
        out = _unett_block_forward(self, h, None, mask, rope, deterministic)
        return out, h


class ScanUNetTUpBlock(UNetTBlock):
    """Second-half scan body: consumes one skip per step (LIFO — the caller
    feeds the down stack reversed)."""

    @nn.compact
    def __call__(self, h, skip=None, mask=None, rope=None, deterministic=True):
        return _unett_block_forward(self, h, skip, mask, rope, deterministic), None


class UNetT(nn.Module):
    arch: ArchConfig
    text_num_embeds: int = 256
    mel_dim: int = 100
    skip_connect_type: str = "concat"  # "concat" | "add" | "none"
    compute_dtype: Any = jnp.float32

    @property
    def text_dim(self) -> int:
        return self.arch.text_dim if self.arch.text_dim is not None else self.mel_dim

    def setup(self):
        a = self.arch
        assert a.depth % 2 == 0, "UNet-Transformer depth must be even"
        self.time_embed = TimestepEmbedding(a.dim, dtype=self.compute_dtype, name="time_embed")
        self.text_embed = TextEmbedding(
            self.text_num_embeds, self.text_dim,
            mask_padding=a.text_mask_padding, conv_layers=a.conv_layers,
            dtype=self.compute_dtype, name="text_embed",
        )
        self.input_embed = InputEmbedding(a.dim, dtype=self.compute_dtype, name="input_embed")

        half = a.depth // 2
        if a.scan_layers:
            if a.quantized:
                raise ValueError(
                    "scan_layers=True does not support quantized=True "
                    "(int8 serving uses the unrolled form)")
            block_kwargs = dict(
                dim=a.dim, heads=a.heads, dim_head=a.dim_head, ff_mult=a.ff_mult,
                dropout=a.dropout, qk_norm=a.qk_norm, pe_attn_head=a.pe_attn_head,
                dtype=self.compute_dtype, quantized=a.quantized,
                skip_connect_type=self.skip_connect_type,
            )
            scan_kw = dict(
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=half,
            )
            self.down_blocks = nn.scan(
                ScanUNetTDownBlock,
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                **scan_kw,
            )(has_skip=False, **block_kwargs, name="down_blocks")
            self.up_blocks = nn.scan(
                ScanUNetTUpBlock,
                in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast),
                **scan_kw,
            )(has_skip=self.skip_connect_type != "none", **block_kwargs,
              name="up_blocks")
            self.layers = None
        else:
            # skip projections stay bf16 even when a.quantized: int8 here measured
            # NEGATIVE (19.2x -> 18.7x device E2TTS RTF, BASELINE.md) — activation
            # quantization over the [.., 2048] concat costs more than the GEMM saves
            layers = []
            for idx in range(a.depth):
                is_later_half = idx >= half
                layers.append((
                    nn.Dense(a.dim, use_bias=False, dtype=self.compute_dtype,
                             name=f"skip_proj_{idx}")
                    if (self.skip_connect_type == "concat" and is_later_half) else None,
                    XRMSNorm(a.dim, name=f"attn_norm_{idx}"),
                    Attention(dim=a.dim, heads=a.heads, dim_head=a.dim_head,
                              dropout=a.dropout, qk_norm=a.qk_norm,
                              pe_attn_head=a.pe_attn_head, dtype=self.compute_dtype,
                              quantized=a.quantized, name=f"attn_{idx}"),
                    XRMSNorm(a.dim, name=f"ff_norm_{idx}"),
                    FeedForward(a.dim, mult=a.ff_mult, dropout=a.dropout,
                                dtype=self.compute_dtype, quantized=a.quantized,
                                name=f"ff_{idx}"),
                ))
            self.layers = layers
        self.norm_out = XRMSNorm(a.dim, name="norm_out")
        self.proj_out = nn.Dense(self.mel_dim, name="proj_out")

    def embed_text(self, text: jnp.ndarray, seq_len: int, drop_text) -> jnp.ndarray:
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
        batch, seq_len = x.shape[0], x.shape[1]
        if time.ndim == 0:
            time = jnp.broadcast_to(time, (batch,))
        x = x.astype(self.compute_dtype)
        cond = cond.astype(self.compute_dtype)
        text_embed = text_embed.astype(self.compute_dtype)

        t = self.time_embed(time)
        h = self.input_embed(x, cond, text_embed, drop_audio_cond, mask=mask)

        # pack time token as frame 0 (`unett.py:215-217`)
        h = jnp.concatenate([t[:, None, :], h], axis=1)
        if mask is not None:
            mask = jnp.pad(mask, ((0, 0), (1, 0)), constant_values=True)

        rope = rotary_freqs(seq_len + 1, self.arch.dim_head)

        from eraxvif5tts_tpu.ops.fused_matmul import dit_block_fusion_ok

        a = self.arch

        if a.scan_layers:
            # down scan emits the per-layer PRE-block activations; the up scan
            # consumes them reversed (the LIFO pop of the unrolled loop).
            h, skips = self.down_blocks(h, mask, rope, deterministic)
            h, _ = self.up_blocks(h, skips[::-1], mask, rope, deterministic)
            h = self.norm_out(h)[:, 1:, :]
            return self.proj_out(h).astype(jnp.float32)

        # serving fusion (same ablation-backed choice as DiTBlock): fold the
        # pre-FF RMSNorm + GELU into the project_in matmul. bf16-only — the
        # int8 path keeps QuantDense projections.
        fused = (
            deterministic
            and not a.quantized
            and dit_block_fusion_ok(h.shape[1], a.dim, a.heads * a.dim_head,
                                    int(a.dim * a.ff_mult), self.compute_dtype)
        )

        half = self.arch.depth // 2
        skips = []
        for idx, (skip_proj, attn_norm, attn, ff_norm, ff) in enumerate(self.layers):
            if idx < half:
                skips.append(h)
            else:
                skip = skips.pop()
                if self.skip_connect_type == "concat":
                    h = skip_proj(jnp.concatenate([h, skip], axis=-1))
                elif self.skip_connect_type == "add":
                    h = h + skip
            h = attn(attn_norm(h), mask=mask, rope=rope, deterministic=deterministic) + h
            if fused:
                g = ff_norm(h, scale_only=True).astype(jnp.float32)
                mod_scale = jnp.broadcast_to(g[None, :] - 1.0,
                                             (h.shape[0], a.dim))
                h = ff(h, deterministic=True,
                       fused_adaln=(mod_scale, jnp.zeros_like(mod_scale)),
                       fused_norm="rms") + h
            else:
                h = ff(ff_norm(h), deterministic=deterministic) + h

        h = self.norm_out(h)[:, 1:, :]  # unpack time token
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
        text_embed = self.text_embed(text, x.shape[1], drop_text)
        return self.run(x, cond, text_embed, time, drop_audio_cond, mask=mask,
                        deterministic=deterministic)
