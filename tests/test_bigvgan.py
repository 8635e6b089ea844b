"""Native BigVGAN generator: numerics parity vs an independent torch
implementation of the same published formulas (alias-free snake activation,
AMP residual blocks, transposed-conv upsampling, weight-norm fusion)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as tF

from eraxvif5tts_tpu.models.bigvgan import (
    BigVGAN,
    BigVGANConfig,
    bigvgan_params_from_torch,
    kaiser_sinc_filter1d,
    lowpass_downsample2x,
    snakebeta,
    upsample2x,
)

TINY = BigVGANConfig(
    num_mels=8, upsample_initial_channel=32,
    upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
)


def _t_up2x(x, filt, ratio=2):
    # torch mirror of UpSample1d
    k = len(filt)
    pad = k // ratio - 1
    pad_left = pad * ratio + (k - ratio) // 2
    pad_right = pad * ratio + (k - ratio + 1) // 2
    c = x.shape[1]
    f = torch.from_numpy(filt)[None, None].expand(c, -1, -1)
    x = tF.pad(x, (pad, pad), mode="replicate")
    y = ratio * tF.conv_transpose1d(x, f, stride=ratio, groups=c)
    return y[..., pad_left: y.shape[-1] - pad_right]


def _t_down2x(x, filt, ratio=2):
    k = len(filt)
    even = k % 2 == 0
    c = x.shape[1]
    f = torch.from_numpy(filt)[None, None].expand(c, -1, -1)
    x = tF.pad(x, (k // 2 - int(even), k // 2), mode="replicate")
    return tF.conv1d(x, f, stride=ratio, groups=c)


def test_alias_free_up_down_match_torch():
    filt = kaiser_sinc_filter1d(0.25, 0.3, 12)
    x = np.random.default_rng(0).standard_normal((2, 3, 40)).astype(np.float32)
    xt = torch.from_numpy(x)
    up_want = _t_up2x(xt, filt).numpy()
    up_got = np.asarray(upsample2x(jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(filt)))
    np.testing.assert_allclose(up_got.transpose(0, 2, 1), up_want, rtol=1e-5, atol=1e-5)
    dn_want = _t_down2x(xt, filt).numpy()
    dn_got = np.asarray(lowpass_downsample2x(jnp.asarray(x.transpose(0, 2, 1)),
                                             jnp.asarray(filt)))
    np.testing.assert_allclose(dn_got.transpose(0, 2, 1), dn_want, rtol=1e-5, atol=1e-5)


def test_snakebeta_formula():
    x = jnp.linspace(-2, 2, 11)[None, :, None]
    alpha = jnp.asarray([0.5])
    beta = jnp.asarray([-0.3])
    got = np.asarray(snakebeta(x, alpha, beta, logscale=True))[0, :, 0]
    a, b = np.exp(0.5), np.exp(-0.3)
    xs = np.linspace(-2, 2, 11)
    want = xs + (1.0 / (b + 1e-9)) * np.sin(a * xs) ** 2
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class _TTinyBigVGAN(torch.nn.Module):
    """Independent torch implementation of the TINY config."""

    def __init__(self, cfg):
        super().__init__()
        nn = torch.nn
        self.cfg = cfg
        ch = cfg.upsample_initial_channel
        self.conv_pre = nn.Conv1d(cfg.num_mels, ch, 7, padding=3)
        self.ups = nn.ModuleList()
        self.resblocks = nn.ModuleList()
        self.activations = {}
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            cin, cout = ch // (2 ** i), ch // (2 ** (i + 1))
            self.ups.append(nn.ModuleList([nn.ConvTranspose1d(cin, cout, k, stride=u,
                                                              padding=(k - u) // 2)]))
            for kr, dil in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
                blk = nn.Module()
                blk.convs1 = nn.ModuleList(
                    [nn.Conv1d(cout, cout, kr, dilation=d, padding=d * (kr - 1) // 2)
                     for d in dil])
                blk.convs2 = nn.ModuleList(
                    [nn.Conv1d(cout, cout, kr, padding=(kr - 1) // 2) for _ in dil])
                blk.activations = nn.ModuleList()
                for _ in range(2 * len(dil)):
                    act = nn.Module()
                    act.act = nn.Module()
                    act.act.alpha = nn.Parameter(torch.randn(cout) * 0.1)
                    act.act.beta = nn.Parameter(torch.randn(cout) * 0.1)
                    blk.activations.append(act)
                self.resblocks.append(blk)
        final = ch // (2 ** len(cfg.upsample_rates))
        self.activation_post = nn.Module()
        self.activation_post.act = nn.Module()
        self.activation_post.act.alpha = nn.Parameter(torch.randn(final) * 0.1)
        self.activation_post.act.beta = nn.Parameter(torch.randn(final) * 0.1)
        self.conv_post = nn.Conv1d(final, 1, 7, padding=3,
                                   bias=cfg.use_bias_at_final)
        self.filt = kaiser_sinc_filter1d(0.25, 0.3, 12)

    def _act(self, x, mod):
        x = _t_up2x(x, self.filt)
        a = torch.exp(mod.act.alpha)[None, :, None]
        b = torch.exp(mod.act.beta)[None, :, None]
        x = x + (1.0 / (b + 1e-9)) * torch.sin(a * x) ** 2
        return _t_down2x(x, self.filt)

    def forward(self, mel):
        cfg = self.cfg
        x = self.conv_pre(mel)
        n_k = len(cfg.resblock_kernel_sizes)
        for i in range(len(cfg.upsample_rates)):
            x = self.ups[i][0](x)
            acc = None
            for j in range(n_k):
                blk = self.resblocks[i * n_k + j]
                y = x
                for m, d in enumerate(cfg.resblock_dilation_sizes[j]):
                    yt = self._act(y, blk.activations[2 * m])
                    yt = blk.convs1[m](yt)
                    yt = self._act(yt, blk.activations[2 * m + 1])
                    yt = blk.convs2[m](yt)
                    y = y + yt
                acc = y if acc is None else acc + y
            x = acc / n_k
        x = self._act(x, self.activation_post)
        x = self.conv_post(x)
        return torch.clamp(x[:, 0], -1.0, 1.0)


def test_bigvgan_generator_parity_with_torch():
    torch.manual_seed(0)
    tm = _TTinyBigVGAN(TINY).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = bigvgan_params_from_torch(sd, TINY)
    model = BigVGAN(TINY)

    mel = np.random.default_rng(1).standard_normal((2, TINY.num_mels, 20)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(mel)).numpy()
    got = np.asarray(jax.jit(model.__call__)(params, jnp.asarray(mel)))
    assert got.shape == want.shape == (2, 20 * 4)  # upsample x4 total
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_bigvgan_weight_norm_fusion():
    torch.manual_seed(1)
    conv = torch.nn.utils.weight_norm(torch.nn.Conv1d(4, 6, 3))
    sd = {f"conv_pre.{k}": v.detach().numpy() for k, v in conv.state_dict().items()}
    from eraxvif5tts_tpu.models.bigvgan import _conv_p

    p = _conv_p(sd, "conv_pre")
    fused = torch.nn.utils.remove_weight_norm(conv).weight.detach().numpy()
    np.testing.assert_allclose(p["kernel"].transpose(2, 1, 0), fused, rtol=1e-6)


def test_bigvgan_random_smoke_full_config():
    cfg = BigVGANConfig(num_mels=8, upsample_initial_channel=16,
                        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1,),))
    model = BigVGAN(cfg)
    params = model.init_random_params(np.random.default_rng(0))
    mel = jnp.zeros((1, 8, 16))
    wave = jax.jit(model.__call__)(params, mel)
    assert wave.shape == (1, 16 * 8)
    assert np.isfinite(np.asarray(wave)).all()
