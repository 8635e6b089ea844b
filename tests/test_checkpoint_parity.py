"""Checkpoint importer + numerics parity vs an independent torch implementation.

The torch modules below are built in-test from the formulas documented in SURVEY.md
(they are NOT the reference code); weights flow through the importer in both
directions, so these tests pin down every layout transpose and the model semantics
(AdaLN chunk order, rotary pairing, GRN axes, ISTFT normalization).
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

from eraxvif5tts_tpu.compression.convert import (
    dit_params_from_torch,
    dit_params_to_torch,
    infer_depth,
    infer_text_num_embeds,
    normalize_reference_state_dict,
    vocos_params_from_torch,
)
from eraxvif5tts_tpu.configs import ArchConfig
from eraxvif5tts_tpu.models.dit import DiT
from eraxvif5tts_tpu.models.vocos import Vocos
from eraxvif5tts_tpu.ops.rotary import abs_pos_embedding_table

ARCH = ArchConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, text_dim=32,
                  conv_layers=2, dropout=0.0)
VOCAB = 11
MEL = 12


# ---------------------------------------------------------------------------
# Independent torch implementation (formula-level, matches SURVEY.md §2.1)


class TGRN(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = tnn.Parameter(torch.zeros(1, 1, dim))
        self.beta = tnn.Parameter(torch.zeros(1, 1, dim))

    def forward(self, x):
        gx = torch.norm(x, p=2, dim=1, keepdim=True)
        nx = gx / (gx.mean(dim=-1, keepdim=True) + 1e-6)
        return self.gamma * (x * nx) + self.beta + x


class TConvNeXtV2(tnn.Module):
    def __init__(self, dim, inter):
        super().__init__()
        self.dwconv = tnn.Conv1d(dim, dim, 7, padding=3, groups=dim)
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = tnn.Linear(dim, inter)
        self.grn = TGRN(inter)
        self.pwconv2 = tnn.Linear(inter, dim)

    def forward(self, x):
        r = x
        x = self.dwconv(x.transpose(1, 2)).transpose(1, 2)
        x = self.norm(x)
        x = tF.gelu(self.pwconv1(x))
        x = self.grn(x)
        return r + self.pwconv2(x)


def rotate_half_interleaved(x):
    x = x.reshape(*x.shape[:-1], -1, 2)
    x0, x1 = x[..., 0], x[..., 1]
    return torch.stack((-x1, x0), dim=-1).reshape(*x.shape[:-2], -1)


def t_apply_rotary(t, freqs):
    return t * freqs.cos() + rotate_half_interleaved(t) * freqs.sin()


class TDiT(tnn.Module):
    """Minimal torch DiT with the reference's key layout (for importer tests)."""

    def __init__(self, arch: ArchConfig, vocab, mel_dim):
        super().__init__()
        d, td = arch.dim, arch.text_dim
        self.arch = arch
        self.time_embed = tnn.Module()
        self.time_embed.time_mlp = tnn.Sequential(
            tnn.Linear(256, d), tnn.SiLU(), tnn.Linear(d, d)
        )
        self.text_embed = tnn.Module()
        self.text_embed.text_embed = tnn.Embedding(vocab + 1, td)
        self.text_embed.text_blocks = tnn.ModuleList(
            [TConvNeXtV2(td, td * 2) for _ in range(arch.conv_layers)]
        )
        self.input_embed = tnn.Module()
        self.input_embed.proj = tnn.Linear(mel_dim * 2 + td, d)
        self.input_embed.conv_pos_embed = tnn.Module()
        self.input_embed.conv_pos_embed.conv1d = tnn.Sequential(
            tnn.Conv1d(d, d, 31, groups=16, padding=15), tnn.Mish(),
            tnn.Conv1d(d, d, 31, groups=16, padding=15), tnn.Mish(),
        )
        self.transformer_blocks = tnn.ModuleList()
        for _ in range(arch.depth):
            blk = tnn.Module()
            blk.attn_norm = tnn.Module()
            blk.attn_norm.linear = tnn.Linear(d, d * 6)
            blk.attn = tnn.Module()
            blk.attn.to_q = tnn.Linear(d, d)
            blk.attn.to_k = tnn.Linear(d, d)
            blk.attn.to_v = tnn.Linear(d, d)
            blk.attn.to_out = tnn.ModuleList([tnn.Linear(d, d)])
            blk.ff = tnn.Module()
            blk.ff.ff = tnn.ModuleDict({
                "0": tnn.ModuleDict({"0": tnn.Linear(d, d * arch.ff_mult)}),
                "2": tnn.Linear(d * arch.ff_mult, d),
            })
            self.transformer_blocks.append(blk)
        self.norm_out = tnn.Module()
        self.norm_out.linear = tnn.Linear(d, d * 2)
        self.proj_out = tnn.Linear(d, mel_dim)
        self.mel_dim = mel_dim

    def forward(self, x, cond, text, time, drop_audio_cond=False, drop_text=False):
        a = self.arch
        b, n, _ = x.shape
        # timestep embedding: sinus(scale=1000) -> mlp
        half = 128
        emb_f = torch.exp(torch.arange(half) * -(math.log(10000.0) / (half - 1)))
        args = 1000.0 * time.unsqueeze(1) * emb_f.unsqueeze(0)
        t_hidden = torch.cat([args.sin(), args.cos()], dim=-1)
        t = self.time_embed.time_mlp(t_hidden)

        # text embedding
        text = (text + 1)[:, :n]
        text = tF.pad(text, (0, n - text.shape[1]))
        tmask = text == 0  # BEFORE the drop, matching reference dit.py:54-59
        if drop_text:
            text = torch.zeros_like(text)
        te = self.text_embed.text_embed(text)
        table = torch.from_numpy(abs_pos_embedding_table(a.text_dim, 4096))
        te = te + table[:n][None]
        te = te.masked_fill(tmask.unsqueeze(-1), 0.0)
        for blk in self.text_embed.text_blocks:
            te = blk(te)
            te = te.masked_fill(tmask.unsqueeze(-1), 0.0)

        # input embedding
        if drop_audio_cond:
            cond = torch.zeros_like(cond)
        h = self.input_embed.proj(torch.cat([x, cond, te], dim=-1))
        h = self.input_embed.conv_pos_embed.conv1d(h.transpose(1, 2)).transpose(1, 2) + h

        # rotary freqs (interleaved)
        inv = 1.0 / (10000.0 ** (torch.arange(0, a.dim_head, 2).float() / a.dim_head))
        fr = torch.arange(n).float()[:, None] * inv[None, :]
        freqs = fr.repeat_interleave(2, dim=-1)

        for blk in self.transformer_blocks:
            mod = blk.attn_norm.linear(tF.silu(t))
            sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = mod.chunk(6, dim=1)
            normed = tF.layer_norm(h, (a.dim,), eps=1e-6)
            normed = normed * (1 + sc_msa[:, None]) + sh_msa[:, None]
            q = blk.attn.to_q(normed).view(b, n, a.heads, a.dim_head).transpose(1, 2)
            k = blk.attn.to_k(normed).view(b, n, a.heads, a.dim_head).transpose(1, 2)
            v = blk.attn.to_v(normed).view(b, n, a.heads, a.dim_head).transpose(1, 2)
            if a.pe_attn_head is not None:
                pn = a.pe_attn_head
                q[:, :pn] = t_apply_rotary(q[:, :pn], freqs)
                k[:, :pn] = t_apply_rotary(k[:, :pn], freqs)
            else:
                q = t_apply_rotary(q, freqs)
                k = t_apply_rotary(k, freqs)
            attn = tF.scaled_dot_product_attention(q, k, v)
            attn = attn.transpose(1, 2).reshape(b, n, a.dim)
            attn = blk.attn.to_out[0](attn)
            h = h + g_msa.unsqueeze(1) * attn
            normed = tF.layer_norm(h, (a.dim,), eps=1e-6)
            normed = normed * (1 + sc_mlp[:, None]) + sh_mlp[:, None]
            ff = blk.ff.ff["2"](tF.gelu(blk.ff.ff["0"]["0"](normed), approximate="tanh"))
            h = h + g_mlp.unsqueeze(1) * ff

        mod = self.norm_out.linear(tF.silu(t))
        scale, shift = mod.chunk(2, dim=1)
        h = tF.layer_norm(h, (a.dim,), eps=1e-6)
        h = h * (1 + scale)[:, None] + shift[:, None]
        return self.proj_out(h)


def torch_state_dict_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


# ---------------------------------------------------------------------------


def test_dit_torch_to_flax_numerics_parity():
    torch.manual_seed(0)
    tm = TDiT(ARCH, VOCAB, MEL).eval()
    sd = torch_state_dict_numpy(tm)
    params = dit_params_from_torch(sd, depth=ARCH.depth, conv_layers=ARCH.conv_layers)

    jm = DiT(arch=ARCH, text_num_embeds=VOCAB, mel_dim=MEL)
    b, n = 2, 24
    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, n, MEL)).astype(np.float32)
    cond = rng.standard_normal((b, n, MEL)).astype(np.float32)
    text = np.array([[1, 2, 3, 4, -1, -1], [5, 6, -1, -1, -1, -1]], np.int32)
    time = np.array([0.3, 0.8], np.float32)

    with torch.no_grad():
        want = tm(
            torch.from_numpy(x), torch.from_numpy(cond),
            torch.from_numpy(text).long(), torch.from_numpy(time),
        ).numpy()
    got = np.asarray(
        jax.jit(jm.apply)(
            {"params": params}, jnp.asarray(x), jnp.asarray(cond),
            jnp.asarray(text), jnp.asarray(time),
        )
    )
    # Importing JAX flips CPU FTZ/denormal flags, shifting torch f32 results ~0.4%
    # through this chaotic stack; layout bugs would produce O(1) errors.
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=1e-2)


def test_dit_parity_with_cfg_drops_and_pe_attn_head():
    arch = ArchConfig(dim=64, depth=1, heads=2, dim_head=32, ff_mult=2, text_dim=32,
                      conv_layers=1, dropout=0.0, pe_attn_head=1)
    torch.manual_seed(1)
    tm = TDiT(arch, VOCAB, MEL).eval()
    sd = torch_state_dict_numpy(tm)
    params = dit_params_from_torch(sd, depth=1, conv_layers=1)
    jm = DiT(arch=arch, text_num_embeds=VOCAB, mel_dim=MEL)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 16, MEL)).astype(np.float32)
    cond = rng.standard_normal((1, 16, MEL)).astype(np.float32)
    text = np.array([[1, 2, -1]], np.int32)
    time = np.array([0.5], np.float32)
    for da, dt in [(False, False), (True, False), (True, True)]:
        with torch.no_grad():
            want = tm(torch.from_numpy(x), torch.from_numpy(cond),
                      torch.from_numpy(text).long(), torch.from_numpy(time),
                      drop_audio_cond=da, drop_text=dt).numpy()
        got = np.asarray(
            jax.jit(jm.apply, static_argnames=())(
                {"params": params}, jnp.asarray(x), jnp.asarray(cond),
                jnp.asarray(text), jnp.asarray(time),
                drop_audio_cond=jnp.asarray([da]), drop_text=jnp.asarray([dt]),
            )
        )
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=1e-2, err_msg=f"da={da} dt={dt}")


def test_dit_roundtrip_export_import():
    jm = DiT(arch=ARCH, text_num_embeds=VOCAB, mel_dim=MEL)
    params = jax.jit(jm.init)(
        jax.random.key(0), jnp.zeros((1, 8, MEL)), jnp.zeros((1, 8, MEL)),
        jnp.zeros((1, 4), jnp.int32), jnp.zeros((1,)),
    )["params"]
    sd = dit_params_to_torch(params, depth=ARCH.depth, conv_layers=ARCH.conv_layers)
    assert all(k.startswith("transformer.") for k in sd)
    params2 = dit_params_from_torch(sd, depth=ARCH.depth, conv_layers=ARCH.conv_layers)
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = jax.tree_util.tree_leaves_with_path(params2)
    # embedding table is a param in flax but ignored by export-import? -> must be present
    paths1 = {jax.tree_util.keystr(p) for p, _ in flat1}
    paths2 = {jax.tree_util.keystr(p) for p, _ in flat2}
    assert paths1 == paths2, paths1 ^ paths2
    d1 = {jax.tree_util.keystr(p): v for p, v in flat1}
    d2 = {jax.tree_util.keystr(p): v for p, v in flat2}
    for key in d1:
        np.testing.assert_array_equal(np.asarray(d1[key]), np.asarray(d2[key]), err_msg=key)


def test_normalize_ema_state_dict():
    sd = {
        "ema_model.transformer.proj_out.weight": np.ones((2, 2)),
        "ema_model.mel_spec.mel_stft.window": np.ones(4),
        "initted": np.array(True),
        "step": np.array(100),
    }
    out = normalize_reference_state_dict(sd)
    assert list(out) == ["transformer.proj_out.weight"]


def test_infer_depth_and_vocab():
    jm = DiT(arch=ARCH, text_num_embeds=VOCAB, mel_dim=MEL)
    params = jax.jit(jm.init)(
        jax.random.key(0), jnp.zeros((1, 8, MEL)), jnp.zeros((1, 8, MEL)),
        jnp.zeros((1, 4), jnp.int32), jnp.zeros((1,)),
    )["params"]
    sd = dit_params_to_torch(params, depth=ARCH.depth, conv_layers=ARCH.conv_layers)
    assert infer_depth(sd) == ARCH.depth
    assert infer_text_num_embeds(sd) == VOCAB


# ---------------------------------------------------------------------------
# Vocos parity incl. torch.istft


class TVocos(tnn.Module):
    def __init__(self, mels=12, dim=32, inter=48, layers=2, n_fft=64, hop=16):
        super().__init__()
        self.n_fft, self.hop = n_fft, hop
        self.backbone = tnn.Module()
        self.backbone.embed = tnn.Conv1d(mels, dim, 7, padding=3)
        self.backbone.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.backbone.convnext = tnn.ModuleList()
        for _ in range(layers):
            blk = tnn.Module()
            blk.dwconv = tnn.Conv1d(dim, dim, 7, padding=3, groups=dim)
            blk.norm = tnn.LayerNorm(dim, eps=1e-6)
            blk.pwconv1 = tnn.Linear(dim, inter)
            blk.pwconv2 = tnn.Linear(inter, dim)
            blk.gamma = tnn.Parameter(torch.full((dim,), 1.0 / layers))
            self.backbone.convnext.append(blk)
        self.backbone.final_layer_norm = tnn.LayerNorm(dim, eps=1e-6)
        self.head = tnn.Module()
        self.head.out = tnn.Linear(dim, n_fft + 2)

    def forward(self, mel):
        x = self.backbone.embed(mel).transpose(1, 2)
        x = self.backbone.norm(x)
        for blk in self.backbone.convnext:
            r = x
            x = blk.dwconv(x.transpose(1, 2)).transpose(1, 2)
            x = blk.norm(x)
            x = blk.pwconv2(tF.gelu(blk.pwconv1(x)))
            x = r + blk.gamma * x
        x = self.backbone.final_layer_norm(x)
        x = self.head.out(x).transpose(1, 2)
        mag, p = x.chunk(2, dim=1)
        mag = torch.exp(mag).clamp(max=1e2)  # upstream Vocos clips magnitude
        S = mag * (torch.cos(p) + 1j * torch.sin(p))
        return torch.istft(
            S, self.n_fft, hop_length=self.hop, win_length=self.n_fft,
            window=torch.hann_window(self.n_fft), center=True,
        )


def test_vocos_parity_with_torch_istft():
    torch.manual_seed(2)
    tm = TVocos().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = vocos_params_from_torch(sd, num_layers=2)
    jm = Vocos(input_channels=12, dim=32, intermediate_dim=48, num_layers=2,
               n_fft=64, hop_length=16)
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((2, 12, 20)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(mel)).numpy()
    got = np.asarray(jax.jit(jm.apply)({"params": params}, jnp.asarray(mel)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
