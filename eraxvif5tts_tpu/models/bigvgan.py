"""Native BigVGAN generator (JAX) — the reference's alternative vocoder.

The reference loads the external ``nvidia/BigVGAN`` torch package
(`src/f5_tts/infer/utils_infer.py:101-139`, ``vocoder_name == 'bigvgan'`` with the
`bigvgan_v2_24khz_100band_256x` checkpoint). This module implements the generator
natively so mel -> wave stays on-device, with a torch-checkpoint importer
(weight-norm fusion included).

Architecture (BigVGAN, arXiv:2206.04658, v2 configuration):

    conv_pre(k7) -> [ConvTranspose(up_i) -> mean of AMPBlocks(k in {3,7,11})] x 6
    -> anti-aliased snake activation -> conv_post(k7) -> clamp/tanh

- **Snake / SnakeBeta** activation: ``x + (1/beta) sin^2(alpha x)`` with
  per-channel (log-scale) alpha/beta.
- **Anti-aliased activation** (``Activation1d``): 2x upsample with a
  kaiser-windowed sinc low-pass, apply the nonlinearity, 2x filtered downsample —
  the alias-free trick that defines BigVGAN.
- **AMPBlock1**: pairs of (activation -> dilated conv, activation -> conv) with
  residuals, dilations (1, 3, 5).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class BigVGANConfig:
    """Defaults = `bigvgan_v2_24khz_100band_256x` (hop 256, 24 kHz, 100 mels)."""

    num_mels: int = 100
    upsample_initial_channel: int = 1536
    upsample_rates: tuple = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: tuple = (8, 8, 4, 4, 4, 4)
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    activation: str = "snakebeta"  # "snake" | "snakebeta"
    snake_logscale: bool = True
    use_tanh_at_final: bool = False  # v2: clamp(-1, 1); v1 base: tanh
    use_bias_at_final: bool = False
    sample_rate: int = 24000


BIGVGAN_BASE_24KHZ = BigVGANConfig(
    upsample_initial_channel=512, activation="snake",
    use_tanh_at_final=True, use_bias_at_final=True,
)


# ---------------------------------------------------------------------------
# kaiser-sinc anti-aliasing filters (alias-free activation, BigVGAN §3.2)


def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size, np.float32)
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt = filt / filt.sum()
    return filt.astype(np.float32)


def _replicate_pad(x: jnp.ndarray, left: int, right: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="edge")


def _depthwise(x: jnp.ndarray, filt: jnp.ndarray, stride: int = 1,
               lhs_dilation: int = 1) -> jnp.ndarray:
    """Per-channel conv of ``x [b, t, c]`` with a shared 1-D filter."""
    c = x.shape[-1]
    kernel = jnp.broadcast_to(filt[:, None, None], (filt.shape[0], 1, c))
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride,), padding=((0, 0),),
        lhs_dilation=(lhs_dilation,), dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=c,
    )


def upsample2x(x: jnp.ndarray, filt: jnp.ndarray, ratio: int = 2) -> jnp.ndarray:
    """Alias-free 2x upsampling (UpSample1d): replicate-pad, zero-stuff, low-pass."""
    k = filt.shape[0]
    pad = k // ratio - 1
    pad_left = pad * ratio + (k - ratio) // 2
    pad_right = pad * ratio + (k - ratio + 1) // 2
    x = _replicate_pad(x, pad, pad)
    # conv_transpose == zero-stuff by `ratio` + full conv with the flipped kernel
    # (the kaiser-sinc filter is palindromic, so the flip is a numeric no-op)
    xd = jnp.zeros((x.shape[0], x.shape[1] * ratio - (ratio - 1), x.shape[2]),
                   x.dtype)
    xd = xd.at[:, ::ratio].set(x)
    xd = jnp.pad(xd, ((0, 0), (k - 1, k - 1), (0, 0)))
    y = ratio * _depthwise(xd, filt[::-1])
    return y[:, pad_left:y.shape[1] - pad_right]


def lowpass_downsample2x(x: jnp.ndarray, filt: jnp.ndarray, ratio: int = 2) -> jnp.ndarray:
    """DownSample1d/LowPassFilter1d: replicate-pad then strided filtered conv."""
    k = filt.shape[0]
    even = k % 2 == 0
    pad_left = k // 2 - int(even)
    pad_right = k // 2
    x = _replicate_pad(x, pad_left, pad_right)
    return _depthwise(x, filt, stride=ratio)


def snake(x: jnp.ndarray, alpha: jnp.ndarray, logscale: bool) -> jnp.ndarray:
    a = jnp.exp(alpha) if logscale else alpha
    return x + (1.0 / (a + 1e-9)) * jnp.square(jnp.sin(a * x))


def snakebeta(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray,
              logscale: bool) -> jnp.ndarray:
    a = jnp.exp(alpha) if logscale else alpha
    b = jnp.exp(beta) if logscale else beta
    return x + (1.0 / (b + 1e-9)) * jnp.square(jnp.sin(a * x))


def activation1d(x: jnp.ndarray, act_params: dict, cfg: BigVGANConfig,
                 up_filt: jnp.ndarray, down_filt: jnp.ndarray) -> jnp.ndarray:
    """Anti-aliased activation: 2x up -> snake(beta) -> 2x down."""
    x = upsample2x(x, up_filt)
    if cfg.activation == "snakebeta":
        x = snakebeta(x, act_params["alpha"], act_params["beta"], cfg.snake_logscale)
    else:
        x = snake(x, act_params["alpha"], cfg.snake_logscale)
    return lowpass_downsample2x(x, down_filt)


# ---------------------------------------------------------------------------
# convs


def _conv1d(x, kernel, bias, dilation: int = 1):
    """x [b,t,c], kernel [k,in,out] SAME padding (torch uses explicit
    (k*d - d)//2 which equals SAME for odd k)."""
    k = kernel.shape[0]
    pad = (dilation * (k - 1)) // 2
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=((pad, pad),),
        rhs_dilation=(dilation,), dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return out if bias is None else out + bias


def _conv_transpose1d(x, w, bias, stride: int, padding: int):
    """torch ConvTranspose1d. ``w`` is torch layout [in, out, k]."""
    k = w.shape[-1]
    kernel = jnp.flip(w, -1).transpose(2, 0, 1)  # [k, in, out]
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,),
        padding=((k - 1 - padding, k - 1 - padding),),
        lhs_dilation=(stride,), dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return out if bias is None else out + bias


# ---------------------------------------------------------------------------
# generator


@dataclass
class BigVGAN:
    """Functional generator; ``params`` comes from ``bigvgan_params_from_torch``."""

    config: BigVGANConfig = field(default_factory=BigVGANConfig)

    def __post_init__(self):
        self._up_filt = jnp.asarray(kaiser_sinc_filter1d(0.5 / 2, 0.6 / 2, 12))
        self._down_filt = jnp.asarray(kaiser_sinc_filter1d(0.5 / 2, 0.6 / 2, 12))

    def _amp_block(self, x, p, dilations):
        cfg = self.config
        for j, d in enumerate(dilations):
            xt = activation1d(x, p["acts"][2 * j], cfg, self._up_filt, self._down_filt)
            xt = _conv1d(xt, p["convs1"][j]["kernel"], p["convs1"][j]["bias"], d)
            xt = activation1d(xt, p["acts"][2 * j + 1], cfg, self._up_filt, self._down_filt)
            xt = _conv1d(xt, p["convs2"][j]["kernel"], p["convs2"][j]["bias"])
            x = x + xt
        return x

    def __call__(self, params: dict, mel: jnp.ndarray) -> jnp.ndarray:
        """``mel [b, num_mels, t]`` (reference layout) -> wave ``[b, t*prod(up)]``."""
        cfg = self.config
        x = mel.swapaxes(1, 2)  # [b, t, mels]
        x = _conv1d(x, params["conv_pre"]["kernel"], params["conv_pre"]["bias"])
        n_kernels = len(cfg.resblock_kernel_sizes)
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            up = params["ups"][i]
            x = _conv_transpose1d(x, up["weight"], up["bias"], u, (k - u) // 2)
            acc = None
            for j in range(n_kernels):
                y = self._amp_block(x, params["resblocks"][i * n_kernels + j],
                                    cfg.resblock_dilation_sizes[j])
                acc = y if acc is None else acc + y
            x = acc / n_kernels
        x = activation1d(x, params["activation_post"], cfg,
                         self._up_filt, self._down_filt)
        x = _conv1d(x, params["conv_post"]["kernel"], params["conv_post"].get("bias"))
        wave = x[..., 0]
        if cfg.use_tanh_at_final:
            return jnp.tanh(wave)
        return jnp.clip(wave, -1.0, 1.0)

    def init_random_params(self, rng: np.random.Generator) -> dict:
        """Random params with the real tree structure (tests / smoke)."""
        cfg = self.config
        sd: dict[str, np.ndarray] = {}

        def conv(prefix, cin, cout, k, bias=True):
            sd[f"{prefix}.weight"] = (
                rng.standard_normal((cout, cin, k)).astype(np.float32) * 0.02)
            if bias:
                sd[f"{prefix}.bias"] = np.zeros(cout, np.float32)

        def act(prefix, c):
            sd[f"{prefix}.act.alpha"] = np.zeros(c, np.float32)
            if cfg.activation == "snakebeta":
                sd[f"{prefix}.act.beta"] = np.zeros(c, np.float32)

        ch = cfg.upsample_initial_channel
        conv("conv_pre", cfg.num_mels, ch, 7)
        n_k = len(cfg.resblock_kernel_sizes)
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            cout = ch // (2 ** (i + 1))
            cin = ch // (2 ** i)
            sd[f"ups.{i}.0.weight"] = (
                rng.standard_normal((cin, cout, k)).astype(np.float32) * 0.02)
            sd[f"ups.{i}.0.bias"] = np.zeros(cout, np.float32)
            for j, kr in enumerate(cfg.resblock_kernel_sizes):
                base = f"resblocks.{i * n_k + j}"
                dil = cfg.resblock_dilation_sizes[j]
                for m in range(len(dil)):
                    conv(f"{base}.convs1.{m}", cout, cout, kr)
                    conv(f"{base}.convs2.{m}", cout, cout, kr)
                for m in range(2 * len(dil)):
                    act(f"{base}.activations.{m}", cout)
        final_c = ch // (2 ** len(cfg.upsample_rates))
        act("activation_post", final_c)
        conv("conv_post", final_c, 1, 7, bias=cfg.use_bias_at_final)
        return bigvgan_params_from_torch(sd, self.config)


# ---------------------------------------------------------------------------
# torch importer


def _fuse_weight_norm(sd: dict, prefix: str) -> np.ndarray | None:
    """weight / (weight_v, weight_g) / parametrizations.* -> fused weight."""
    if f"{prefix}.weight" in sd:
        return np.asarray(sd[f"{prefix}.weight"])
    for gk, vk in ((f"{prefix}.weight_g", f"{prefix}.weight_v"),
                   (f"{prefix}.parametrizations.weight.original0",
                    f"{prefix}.parametrizations.weight.original1")):
        if vk in sd:
            v = np.asarray(sd[vk])
            g = np.asarray(sd[gk])
            norm = np.sqrt((v.reshape(v.shape[0], -1) ** 2).sum(axis=1))
            norm = norm.reshape((-1,) + (1,) * (v.ndim - 1))
            return v * (g / np.maximum(norm, 1e-12))
    return None


def _conv_p(sd, prefix) -> dict:
    w = _fuse_weight_norm(sd, prefix)
    if w is None:
        raise KeyError(f"missing conv weight at {prefix}")
    p = {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0))}
    if f"{prefix}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{prefix}.bias"])
    else:
        p["bias"] = None
    return p


def bigvgan_params_from_torch(sd: dict[str, Any], config: BigVGANConfig | None = None) -> dict:
    """BigVGAN generator state dict (fresh or weight-normed, `generator` key or
    flat) -> parameter tree for ``BigVGAN.__call__``."""
    cfg = config or BigVGANConfig()
    if "generator" in sd:
        sd = sd["generator"]
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in sd.items()}

    def act_p(prefix, expect_beta):
        p = {"alpha": np.asarray(sd[f"{prefix}.act.alpha"])}
        if expect_beta:
            p["beta"] = np.asarray(sd[f"{prefix}.act.beta"])
        return p

    beta = cfg.activation == "snakebeta"
    n_k = len(cfg.resblock_kernel_sizes)
    params: dict[str, Any] = {
        "conv_pre": _conv_p(sd, "conv_pre"),
        "conv_post": _conv_p(sd, "conv_post"),
        "activation_post": act_p("activation_post", beta),
        "ups": [],
        "resblocks": [],
    }
    for i in range(len(cfg.upsample_rates)):
        w = _fuse_weight_norm(sd, f"ups.{i}.0")
        params["ups"].append({
            "weight": np.asarray(w),  # torch conv_transpose layout [in, out, k]
            "bias": np.asarray(sd[f"ups.{i}.0.bias"]),
        })
        for j in range(n_k):
            base = f"resblocks.{i * n_k + j}"
            dil = cfg.resblock_dilation_sizes[j]
            params["resblocks"].append({
                "convs1": [_conv_p(sd, f"{base}.convs1.{m}") for m in range(len(dil))],
                "convs2": [_conv_p(sd, f"{base}.convs2.{m}") for m in range(len(dil))],
                "acts": [act_p(f"{base}.activations.{m}", beta)
                         for m in range(2 * len(dil))],
            })
    return params


def load_bigvgan(ckpt_path: str, config: BigVGANConfig | None = None) -> tuple[BigVGAN, dict]:
    """Load `bigvgan_generator.pt` (HF nvidia/bigvgan_* layout)."""
    import torch

    import jax

    raw = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    model = BigVGAN(config or BigVGANConfig())
    # device_put once: numpy leaves would re-upload per jitted decode call
    return model, jax.device_put(bigvgan_params_from_torch(raw, model.config))
