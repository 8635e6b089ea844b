"""NN building blocks (flax.linen), semantics-parity with reference
`src/f5_tts/model/modules.py:146-731` but written functional-first for XLA.

Conventions:
- All sequence tensors are ``[b, n, d]``.
- Params live in float32; ``compute_dtype`` (bf16 on TPU) is applied by callers.
- Dropout layers exist wherever the reference has them (attention-weight dropout 0.1,
  projection/FF dropout — `modules.py:490,343,367,611`); inference passes
  ``deterministic=True``.
- Boolean masks mark VALID positions.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from eraxvif5tts_tpu.ops.attention import (
    chunked_dot_product_attention,
    dot_product_attention,
    use_serving_kernel,
)
from eraxvif5tts_tpu.ops.dropout import hash_dropout
from eraxvif5tts_tpu.ops.rotary import apply_rotary


class SinusPositionEmbedding(nn.Module):
    """Sinusoidal embedding with scale=1000 (`modules.py:149-161`)."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, scale: float = 1000.0) -> jnp.ndarray:
        half = self.dim // 2
        freqs = jnp.exp(
            jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1))
        )
        args = scale * x[:, None].astype(jnp.float32) * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class TimestepEmbedding(nn.Module):
    """Sinus embedding -> MLP (`modules.py:721-731`)."""

    dim: int
    freq_embed_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, timestep: jnp.ndarray) -> jnp.ndarray:
        hidden = SinusPositionEmbedding(self.freq_embed_dim, name="sinus")(timestep)
        hidden = nn.Dense(self.dim, dtype=self.dtype, name="mlp_in")(hidden)
        hidden = nn.silu(hidden)
        return nn.Dense(self.dim, dtype=self.dtype, name="mlp_out")(hidden)


class GRN(nn.Module):
    """Global response normalization over the sequence axis (`modules.py:225-234`)."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, self.dim))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, self.dim))
        gx = jnp.sqrt(jnp.sum(jnp.square(x), axis=1, keepdims=True))  # L2 over n
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return gamma * (x * nx) + beta + x


def _depthwise_conv1d(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                      dilation: int = 1) -> jnp.ndarray:
    """Depthwise conv over ``x [b, n, d]`` with ``kernel [k, 1, d]`` and SAME padding."""
    d = x.shape[-1]
    k = kernel.shape[0]
    pad = (dilation * (k - 1)) // 2
    out = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1,),
        padding=((pad, pad),),
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=d,
    )
    return out + bias


class ConvNeXtV2Block(nn.Module):
    """Depthwise conv7 -> LN -> pw -> GELU -> GRN -> pw, residual (`modules.py:241-269`)."""

    dim: int
    intermediate_dim: int
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        kernel = self.param(
            "dwconv_kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (7, 1, self.dim),
        )
        bias = self.param("dwconv_bias", nn.initializers.zeros, (self.dim,))
        x = _depthwise_conv1d(
            x.astype(self.dtype), kernel.astype(self.dtype),
            bias.astype(self.dtype), self.dilation,
        )
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.intermediate_dim, dtype=self.dtype, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = GRN(self.intermediate_dim, name="grn")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        return residual + x


class GroupedTapConv1d(nn.Module):
    """Grouped conv1d expressed as a tap-loop of batched matmuls.

    Param tree identical to ``nn.Conv`` (kernel ``[k, in/groups, out]``, bias), but
    the computation unrolls the kernel taps into ``k`` einsums — 1.4x faster than
    XLA's ``feature_group_count`` conv lowering on TPU for the (k=31, groups=16,
    d=1024) ConvPositionEmbedding shape, which runs inside the ODE hot loop.
    """

    features: int
    kernel_size: int
    groups: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, d_in = x.shape
        k, g = self.kernel_size, self.groups
        dg_in = d_in // g
        dg_out = self.features // g
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, dg_in, self.features)
        ).astype(self.dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,)).astype(self.dtype)

        xg = x.astype(self.dtype).reshape(b, t, g, dg_in)
        kr = kernel.reshape(k, dg_in, g, dg_out)
        pad = k // 2
        xp = jnp.pad(xg, ((0, 0), (pad, pad), (0, 0), (0, 0)))
        out = jnp.zeros((b, t, g, dg_out), self.dtype)
        for tap in range(k):
            out = out + jnp.einsum("btgi,igo->btgo", xp[:, tap : tap + t], kr[tap])
        return out.reshape(b, t, self.features) + bias


class ConvPositionEmbedding(nn.Module):
    """2x grouped conv1d(k=31, groups=16) + Mish (`modules.py:167-190`)."""

    dim: int
    kernel_size: int = 31
    groups: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if mask is not None:
            x = jnp.where(mask[..., None], x, 0.0)
        for name in ("conv1", "conv2"):
            x = GroupedTapConv1d(
                self.dim,
                kernel_size=self.kernel_size,
                groups=self.groups,
                dtype=self.dtype,
                name=name,
            )(x)
            x = x * jnp.tanh(jax.nn.softplus(x))  # Mish
        if mask is not None:
            x = jnp.where(mask[..., None], x, 0.0)
        return x


class RMSNorm(nn.Module):
    """RMS norm with learnable scale (`modules.py:275-294`)."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x = (x * jax.lax.rsqrt(var + self.eps).astype(x.dtype))
        return x * weight


class AdaLayerNorm(nn.Module):
    """AdaLN-zero: SiLU -> Linear -> 6-way modulation (`modules.py:301-315`).

    The modulation linear is zero-initialized (`backbones/dit.py:162-167`) so a fresh
    DiT block is an identity + zero-gated residual.
    """

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray):
        mod = nn.Dense(
            self.dim * 6,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="linear",
        )(nn.silu(emb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mod, 6, axis=-1)
        normed = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype)(x)
        out = normed * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return out, gate_msa, shift_mlp, scale_mlp, gate_mlp


class DenseParams(nn.Module):
    """Declares ``kernel``/``bias`` with nn.Dense's exact param schema and
    default initializers, for paths that feed the raw weights to a fused Pallas
    kernel instead of calling the layer. Sharing a scope name with an nn.Dense
    used on another (statically selected) branch yields an identical checkpoint
    tree either way."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class AdaLayerNormFinal(nn.Module):
    """Final AdaLN: 2-way (scale, shift) modulation (`modules.py:322-336`).

    Note the chunk order is (scale, shift) — opposite of ``AdaLayerNorm``.
    """

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        mod = nn.Dense(
            self.dim * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="linear",
        )(nn.silu(emb))
        scale, shift = jnp.split(mod, 2, axis=-1)
        normed = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype)(x)
        return normed * (1 + scale[:, None]) + shift[:, None]


def _dense(quantized: bool):
    """nn.Dense, or the int8 serving variant when the block is quantized
    (`ops/quant.py` — params pre-quantized by ``quantize_params``)."""
    if quantized:
        from eraxvif5tts_tpu.ops.quant import QuantDense

        return QuantDense
    return nn.Dense


class FeedForward(nn.Module):
    """Linear -> tanh-GELU -> dropout -> Linear (`modules.py:342-353`)."""

    dim: int
    mult: int = 4
    dropout: float = 0.1
    dim_out: Optional[int] = None
    dtype: Any = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 fused_adaln: Optional[tuple] = None,
                 fused_norm: str = "ln") -> jnp.ndarray:
        inner = int(self.dim * self.mult)
        dense = _dense(self.quantized)
        if fused_adaln is not None:
            # serving fusion: x is the pre-norm residual stream; the AdaLN
            # LN + modulate + GELU fold into the project_in matmul (the one
            # hand-fusion that beats XLA at serving shapes — see
            # ops/fused_matmul.py's ablation). project_out stays a plain
            # matmul; the caller applies gate+residual, which XLA fuses into
            # the matmul epilogue on its own.
            from eraxvif5tts_tpu.ops.fused_matmul import ln_mod_matmul

            w_in, b_in = DenseParams(self.dim, inner, name="project_in")()
            w_out, b_out = DenseParams(inner, self.dim_out or self.dim,
                                       name="project_out")()
            ln_scale, ln_shift = fused_adaln
            h = ln_mod_matmul(x.astype(self.dtype), ln_scale.astype(self.dtype),
                              ln_shift.astype(self.dtype),
                              w_in.astype(self.dtype), b_in.astype(self.dtype),
                              activation="gelu_tanh", norm=fused_norm,
                              eps=1e-12 if fused_norm == "rms" else 1e-6)
            return h @ w_out.astype(self.dtype) + b_out.astype(self.dtype)
        out_dim = self.dim_out or self.dim
        if self.quantized and deterministic and x.ndim == 3:
            from eraxvif5tts_tpu.ops.quant import QuantDenseParams
            from eraxvif5tts_tpu.ops.quant_ff import int8_ff_fused, use_int8_ff

            if use_int8_ff(x.shape[1], x.shape[-1], inner, out_dim):
                # one-kernel FF (OPT-IN via ERAX_INT8_FF=1; measured negative
                # on v5e vs XLA's fused two-GEMM chain — see ops/quant_ff.py)
                w1, s1, b1 = QuantDenseParams(x.shape[-1], inner,
                                              name="project_in")()
                w2, s2, b2 = QuantDenseParams(inner, out_dim,
                                              name="project_out")()
                return int8_ff_fused(x.astype(self.dtype), w1, s1, b1,
                                     w2, s2, b2)
        x = dense(inner, dtype=self.dtype, name="project_in")(x)
        x = nn.gelu(x, approximate=True)
        if not deterministic and self.dropout > 0.0:
            # position-hash dropout: jax.random bernoulli at this granularity
            # (75M elements/layer, regenerated under remat) costs seconds/step
            # on v5e (`ops/dropout.py`)
            x = hash_dropout(x, self.dropout, self.make_rng("dropout"))
        return dense(out_dim, dtype=self.dtype, name="project_out")(x)


class Attention(nn.Module):
    """Self-attention with optional qk-RMSNorm, rotary on the first ``pe_attn_head``
    heads, padding mask, and train-time attention dropout (`modules.py:360-503`)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.1
    qk_norm: Optional[str] = None
    pe_attn_head: Optional[int] = None
    dtype: Any = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        rope: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """``mask [b, n]`` marks VALID positions and MUST be a contiguous
        prefix (``lens_to_mask`` shape): the Pallas serving/training kernels
        reduce it to per-sample lengths via ``sum(mask)``, so a mask with
        mid-sequence holes would silently attend over the holes. All current
        callers build masks with ``lens_to_mask``; a future caller needing
        holes must route through ``implementation="xla"``."""
        b, n, _ = x.shape
        inner = self.heads * self.dim_head
        dense = _dense(self.quantized)
        q = dense(inner, dtype=self.dtype, name="to_q")(x).reshape(b, n, self.heads, self.dim_head)
        k = dense(inner, dtype=self.dtype, name="to_k")(x).reshape(b, n, self.heads, self.dim_head)
        v = dense(inner, dtype=self.dtype, name="to_v")(x).reshape(b, n, self.heads, self.dim_head)

        if self.qk_norm == "rms_norm":
            q = RMSNorm(self.dim_head, name="q_norm")(q)
            k = RMSNorm(self.dim_head, name="k_norm")(k)
        elif self.qk_norm is not None:
            raise ValueError(f"unimplemented qk_norm: {self.qk_norm!r}")

        # DiT/UNetT masks are contiguous prefixes (lens_to_mask, optionally with
        # the UNetT time token prepended), so the serving kernel can mask by
        # per-sample length. When it handles this shape and every head is
        # rotated, rotary is fused into the kernel: rotating q/k at HBM level
        # costs ~56 us/layer in elementwise passes XLA cannot fuse into the
        # opaque pallas call (measured: fused 142 us vs 118 + 56 unfused).
        fuse_rope = (
            rope is not None
            and self.pe_attn_head is None
            and rope.shape[-1] == self.dim_head
            and use_serving_kernel(q, k, v, trainable=not deterministic,
                                   key_valid=mask, prefix_key_mask=True)
        )
        if rope is not None and not fuse_rope:
            if self.pe_attn_head is not None:
                pn = self.pe_attn_head
                # heads axis is 2 here ([b, n, h, d]); rotate first pn heads only
                q = q.at[:, :, :pn].set(apply_rotary(q[:, :, :pn].swapaxes(1, 2), rope).swapaxes(1, 2))
                k = k.at[:, :, :pn].set(apply_rotary(k[:, :, :pn].swapaxes(1, 2), rope).swapaxes(1, 2))
            else:
                q = apply_rotary(q.swapaxes(1, 2), rope).swapaxes(1, 2)
                k = apply_rotary(k.swapaxes(1, 2), rope).swapaxes(1, 2)

        if not deterministic and self.dropout > 0.0:
            # Train path with attention-weight dropout matching
            # SDPA(dropout_p=0.1) (`modules.py:490`). On TPU: the flash kernel
            # with POSITION-HASH dropout generated inside the kernel
            # (`ops/train_attention.py`) — jax.random Bernoulli at this
            # granularity measures 1.3 Gelem/s on v5e, ~40 s/step of PRNG at
            # the 38,400-frame batch budget. Elsewhere: chunked online-softmax
            # attention (never materializes the [b,h,n,n] weights).
            from eraxvif5tts_tpu.ops.attention import _on_tpu
            from eraxvif5tts_tpu.ops.train_attention import (
                can_use_train_kernel,
                train_attention,
            )

            if _on_tpu() and can_use_train_kernel(n, self.dim_head, q.dtype):
                out = train_attention(
                    q, k, v, key_valid=mask, dropout_rate=self.dropout,
                    dropout_rng=self.make_rng("dropout"),
                )
            else:
                out = chunked_dot_product_attention(
                    q, k, v, key_valid=mask, dropout_rate=self.dropout,
                    dropout_rng=self.make_rng("dropout"),
                )
        else:
            # dropout-free training differentiates the Pallas flash kernel
            # (backward blocks configured); inference uses the one-shot serving
            # kernel (rotary fused when fuse_rope)
            out = dot_product_attention(q, k, v, key_valid=mask,
                                        trainable=not deterministic,
                                        prefix_key_mask=True,
                                        rope=rope if fuse_rope else None)

        out = out.reshape(b, n, inner)
        out = dense(self.dim, dtype=self.dtype, name="to_out")(out)
        if not deterministic and self.dropout > 0.0:
            out = hash_dropout(out, self.dropout, self.make_rng("dropout"))
        if mask is not None:
            out = jnp.where(mask[..., None], out, 0.0)
        return out


def _dit_block_forward(
    self: "DiTBlock",
    x: jnp.ndarray,
    t: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    rope: Optional[jnp.ndarray],
    deterministic: bool,
) -> jnp.ndarray:
    """Shared DiTBlock body, called from inside a compact ``__call__``.

    Lives outside the class so :class:`ScanDiTBlock` (the ``nn.scan``
    carry-form used when ``arch.scan_layers`` is on) can reuse it without
    re-entering a second compact method — flax forbids compact->compact calls
    on one instance. Submodule names are identical in both forms, so the
    per-layer param subtree is layout-compatible (stack <-> unstack adapters
    in `compression/convert.py`).
    """
    from eraxvif5tts_tpu.ops.fused_matmul import dit_block_fusion_ok

    b, n, _ = x.shape
    fused = (
        deterministic
        and not self.quantized
        and dit_block_fusion_ok(n, self.dim, self.heads * self.dim_head,
                                int(self.dim * self.ff_mult), self.dtype)
    )
    attn = Attention(
        dim=self.dim,
        heads=self.heads,
        dim_head=self.dim_head,
        dropout=self.dropout,
        qk_norm=self.qk_norm,
        pe_attn_head=self.pe_attn_head,
        dtype=self.dtype,
        quantized=self.quantized,
        name="attn",
    )
    ff = FeedForward(self.dim, mult=self.ff_mult, dropout=self.dropout,
                     dtype=self.dtype, quantized=self.quantized, name="ff")
    norm, gate_msa, shift_mlp, scale_mlp, gate_mlp = AdaLayerNorm(
        self.dim, dtype=self.dtype, name="attn_norm"
    )(x, t)
    attn_out = attn(norm, mask=mask, rope=rope, deterministic=deterministic)
    # identity outside jax.checkpoint; under remat_policy="attn" this names
    # the tensor the save_only_these_names policy keeps (models/dit.py)
    attn_out = checkpoint_name(attn_out, "dit_attn_out")
    x = x + gate_msa[:, None] * attn_out

    if fused:
        # serving path: the FF half's LN + modulate + GELU fold into the
        # project_in matmul (`ops/fused_matmul.ln_mod_matmul`). ONLY this
        # projection is hand-fused: measured on hardware
        # (`benchmarks/fused_kernel_bench.py`), it is the one place XLA
        # leaves real time on the table (69 -> 21 us at serving shapes),
        # while the packed-qkv and out-projection+gate+residual fusions
        # both LOSE to XLA's own epilogue fusion — see fused_matmul.py's
        # module docstring for the ablation.
        ff_out = ff(x, deterministic=True,
                    fused_adaln=(scale_mlp, shift_mlp))
        return x + gate_mlp[:, None] * ff_out

    norm = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype, name="ff_norm")(x)
    norm = norm * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
    ff_out = ff(norm, deterministic=deterministic)
    return x + gate_mlp[:, None] * ff_out


class DiTBlock(nn.Module):
    """AdaLN-zero pre-norm attention + gated FF (`modules.py:610-641`)."""

    dim: int
    heads: int
    dim_head: int
    ff_mult: int = 4
    dropout: float = 0.1
    qk_norm: Optional[str] = None
    pe_attn_head: Optional[int] = None
    dtype: Any = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        rope: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        return _dit_block_forward(self, x, t, mask, rope, deterministic)


class ScanDiTBlock(DiTBlock):
    """DiTBlock in ``nn.scan`` carry form: returns ``(x, None)``.

    Same fields, same submodule names (one stacked param subtree per leaf),
    used by `models/dit.py` when ``arch.scan_layers`` is set so the full-depth
    graph compiles ONE block body instead of ``depth`` copies.
    """

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        rope: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        return _dit_block_forward(self, x, t, mask, rope, deterministic), None
