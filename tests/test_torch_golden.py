"""Activation-level golden tests: Flax models vs inline-torch diffusers math.

Round-1 VERDICT item 2: the UNet/VAE/MMDiT conversion tests were round-trips
against their own inverses; these tests instead re-derive each block in torch
from the diffusers semantics the reference samples through (reference
models/unet.py + models/unet_2d_blocks.py ResnetBlock2D/Transformer2DModel/
Down-/Upsample2D; models/sdv3/sdv3_pipeline.py's SD3Transformer2DModel and
AutoencoderKL from diffusers 0.29) with state-dict keys matching the real
checkpoints. Each test therefore validates BOTH the weight converters
(models/weights.py) and the numerical conventions (norm eps, padding
geometry, attention scaling, AdaLN split order, pos-embed crop) of the Flax
implementations, at fp32 with per-block tolerance <= 1e-4.

The torch code here is written from the published diffusers behavior, NOT
copied from the reference fork — it exists so a silent convention mismatch
(e.g. resnet eps 1e-5 vs 1e-6) fails a test instead of silently blowing the
<=2% metric parity budget.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from safe_denoiser_tpu.models import weights as W  # noqa: E402


def _sd(module: nn.Module) -> dict:
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _nhwc(x: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def _assert_close(flax_out, torch_out_nchw, atol=1e-4, label=""):
    want = torch_out_nchw.detach().numpy().transpose(0, 2, 3, 1)
    got = np.asarray(flax_out)
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4,
                               err_msg=f"mismatch in {label}")


# ---------------------------------------------------------------------------
# torch mirrors of the diffusers blocks (state-dict keys match checkpoints)
# ---------------------------------------------------------------------------


class TResnet(nn.Module):
    """diffusers ResnetBlock2D: norm1→silu→conv1 (+time proj) →norm2→silu→
    conv2, 1x1 conv_shortcut when channels change; UNet passes eps=1e-5
    (reference models/unet.py:169,434), the VAE blocks use eps=1e-6
    (reference models/unet_2d_blocks.py:651 defaults)."""

    def __init__(self, cin, cout, temb_dim=None, groups=8, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        if temb_dim:
            self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)
        else:
            self.conv_shortcut = None

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        s = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return s + h


class TAttention(nn.Module):
    """diffusers Attention: separate q/k/v projections, softmax scale
    head_dim**-0.5, out proj stored as to_out.0."""

    def __init__(self, dim, heads, head_dim, ctx_dim=None, qkv_bias=False):
        super().__init__()
        inner = heads * head_dim
        self.heads = heads
        self.to_q = nn.Linear(dim, inner, bias=qkv_bias)
        self.to_k = nn.Linear(ctx_dim or dim, inner, bias=qkv_bias)
        self.to_v = nn.Linear(ctx_dim or dim, inner, bias=qkv_bias)
        self.to_out = nn.ModuleList([nn.Linear(inner, dim)])

    def forward(self, x, context=None):
        context = x if context is None else context
        b, s, _ = x.shape
        hd = self.to_q.out_features // self.heads
        q = self.to_q(x).view(b, s, self.heads, hd).transpose(1, 2)
        k = self.to_k(context).view(b, -1, self.heads, hd).transpose(1, 2)
        v = self.to_v(context).view(b, -1, self.heads, hd).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, s, -1)
        return self.to_out[0](o)


class TGEGLU(nn.Module):
    def __init__(self, din, dout):
        super().__init__()
        self.proj = nn.Linear(din, dout * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class TFeedForward(nn.Module):
    """diffusers FeedForward(geglu): net = [GEGLU, Dropout, Linear] — keys
    net.0.proj / net.2 (net.1 is the paramless dropout)."""

    def __init__(self, dim):
        super().__init__()
        self.net = nn.ModuleList([TGEGLU(dim, 4 * dim), nn.Identity(),
                                  nn.Linear(4 * dim, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class TBasicTransformerBlock(nn.Module):
    """diffusers BasicTransformerBlock: LN(eps 1e-5) → self-attn → LN →
    cross-attn → LN → GEGLU ff, all residual."""

    def __init__(self, dim, heads, ctx_dim):
        super().__init__()
        hd = dim // heads
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = TAttention(dim, heads, hd)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = TAttention(dim, heads, hd, ctx_dim=ctx_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = TFeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        return x + self.ff(self.norm3(x))


class TTransformer2D(nn.Module):
    """diffusers Transformer2DModel (SD-v1: use_linear_projection=False):
    GroupNorm eps hardcoded 1e-6 (reference transformer_2d.py:507), 1x1 conv
    in/out, NCHW→(B,HW,C) permute, outer residual."""

    def __init__(self, c, heads, ctx_dim, groups=8, n_layers=1):
        super().__init__()
        self.norm = nn.GroupNorm(groups, c, eps=1e-6)
        self.proj_in = nn.Conv2d(c, c, 1)
        self.transformer_blocks = nn.ModuleList(
            [TBasicTransformerBlock(c, heads, ctx_dim)
             for _ in range(n_layers)])
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x, context):
        b, c, h, w = x.shape
        res = x
        x = self.proj_in(self.norm(x))
        x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
        for blk in self.transformer_blocks:
            x = blk(x, context)
        x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return self.proj_out(x) + res


class TDown(nn.Module):
    """UNet Downsample2D: stride-2 conv with symmetric padding=1
    (downsample_padding=1, reference models/unet.py down-block args)."""

    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class TDownVAE(nn.Module):
    """VAE Downsample2D: use_conv with padding=0 — diffusers pads (0,1,0,1)
    asymmetrically then applies the VALID stride-2 conv."""

    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class TUp(nn.Module):
    """Upsample2D: nearest 2x interpolate then 3x3 conv."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


def t_timestep_embedding(t: torch.Tensor, dim: int) -> torch.Tensor:
    """diffusers get_timestep_embedding(flip_sin_to_cos=True, shift=0):
    [cos | sin] halves."""
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    freqs = torch.exp(exponent / half)
    ang = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(ang), torch.sin(ang)], dim=-1)


class TTimeEmbedding(nn.Module):
    def __init__(self, cin, dim):
        super().__init__()
        self.linear_1 = nn.Linear(cin, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class TUNet(nn.Module):
    """Tiny diffusers UNet2DConditionModel (SD-v1 topology:
    CrossAttnDownBlock2D x(n-1) + DownBlock2D down, UNetMidBlock2DCrossAttn,
    UpBlock2D + CrossAttnUpBlock2D x(n-1) up), norm_eps=1e-5."""

    def __init__(self, chans=(32, 64), layers=1, heads=2, ctx_dim=16,
                 groups=8, cin=4):
        super().__init__()
        n = len(chans)
        self.chans, self.layers, self.n = chans, layers, n
        tdim = chans[0] * 4
        self.conv_in = nn.Conv2d(cin, chans[0], 3, padding=1)
        self.time_embedding = TTimeEmbedding(chans[0], tdim)

        def make_attn(c):
            return TTransformer2D(c, heads, ctx_dim, groups)

        self.down_blocks = nn.ModuleList()
        # mirror the skip-channel bookkeeping of the flax module (and of
        # diffusers' get_down_block channel threading)
        skip_chs = [chans[0]]
        c_prev = chans[0]
        for i, ch in enumerate(chans):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [TResnet(c_prev if j == 0 else ch, ch, tdim, groups)
                 for j in range(layers)])
            if i < n - 1:
                blk.attentions = nn.ModuleList(
                    [make_attn(ch) for _ in range(layers)])
                blk.downsamplers = nn.ModuleList([TDown(ch)])
            skip_chs += [ch] * layers
            if i < n - 1:
                skip_chs.append(ch)
            c_prev = ch
            self.down_blocks.append(blk)

        mid = nn.Module()
        mid.resnets = nn.ModuleList([TResnet(chans[-1], chans[-1], tdim, groups),
                                     TResnet(chans[-1], chans[-1], tdim, groups)])
        mid.attentions = nn.ModuleList([make_attn(chans[-1])])
        self.mid_block = mid

        self.up_blocks = nn.ModuleList()
        rev = list(reversed(chans))
        c_prev = chans[-1]
        for i, ch in enumerate(rev):
            blk = nn.Module()
            resnets = []
            for j in range(layers + 1):
                skip = skip_chs.pop()
                resnets.append(TResnet(c_prev + skip, ch, tdim, groups))
                c_prev = ch
            blk.resnets = nn.ModuleList(resnets)
            if i > 0:
                blk.attentions = nn.ModuleList(
                    [make_attn(ch) for _ in range(layers + 1)])
            if i < n - 1:
                blk.upsamplers = nn.ModuleList([TUp(ch, ch)])
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(groups, chans[0], eps=1e-5)
        self.conv_out = nn.Conv2d(chans[0], cin, 3, padding=1)

    def forward(self, x, t, context):
        temb = self.time_embedding(t_timestep_embedding(t, self.chans[0]))
        x = self.conv_in(x)
        skips = [x]
        for i, blk in enumerate(self.down_blocks):
            for j, res in enumerate(blk.resnets):
                x = res(x, temb)
                if hasattr(blk, "attentions"):
                    x = blk.attentions[j](x, context)
                skips.append(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0](x)
                skips.append(x)
        x = self.mid_block.resnets[0](x, temb)
        x = self.mid_block.attentions[0](x, context)
        x = self.mid_block.resnets[1](x, temb)
        for i, blk in enumerate(self.up_blocks):
            for j, res in enumerate(blk.resnets):
                x = torch.cat([x, skips.pop()], dim=1)
                x = res(x, temb)
                if hasattr(blk, "attentions"):
                    x = blk.attentions[j](x, context)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0](x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


# ---------------------------------------------------------------------------
# UNet block + full-model tests
# ---------------------------------------------------------------------------


class _Wrap(nn.Module):
    def __init__(self, block):
        super().__init__()
        self.block = block


def test_resnet_block_matches_torch():
    from safe_denoiser_tpu.models.unet import ResnetBlockTime

    torch.manual_seed(0)
    tb = _Wrap(TResnet(16, 32, temb_dim=24, groups=8, eps=1e-5)).eval()
    x = torch.randn(2, 16, 8, 8)
    temb = torch.randn(2, 24)
    with torch.no_grad():
        want = tb.block(x, temb)

    params = W._resnet(_sd(tb), "block")
    out = ResnetBlockTime(32, groups=8, epsilon=1e-5).apply(
        {"params": params}, _nhwc(x), jnp.asarray(temb.numpy()))
    _assert_close(out, want, label="ResnetBlockTime")


def test_resnet_eps_convention_enforced():
    """The UNet resnets must use eps=1e-5 (reference models/unet.py:169);
    with low-variance activations eps dominates and 1e-6 would diverge."""
    from safe_denoiser_tpu.models.unet import ResnetBlockTime

    torch.manual_seed(1)
    tb = _Wrap(TResnet(16, 16, temb_dim=8, groups=8, eps=1e-5)).eval()
    x = torch.randn(2, 16, 4, 4) * 1e-3  # variance ~1e-6: eps-sensitive
    temb = torch.zeros(2, 8)
    with torch.no_grad():
        want = tb.block(x, temb)
    params = W._resnet(_sd(tb), "block")
    out = ResnetBlockTime(16, groups=8, epsilon=1e-5).apply(
        {"params": params}, _nhwc(x), jnp.asarray(temb.numpy()))
    _assert_close(out, want, label="resnet eps")


def test_unet_down_up_sample_padding_matches_torch():
    from safe_denoiser_tpu.models.unet import DownsampleT, UpsampleT

    torch.manual_seed(2)
    td = _Wrap(TDown(8)).eval()
    x = torch.randn(1, 8, 9, 9)  # odd size exposes the padding geometry
    with torch.no_grad():
        want = td.block(x)
    params = {"conv": W._conv(_sd(td), "block.conv")}
    out = DownsampleT(8).apply({"params": params}, _nhwc(x))
    _assert_close(out, want, label="UNet downsample")

    tu = _Wrap(TUp(8, 8)).eval()
    x = torch.randn(1, 8, 5, 5)
    with torch.no_grad():
        want = tu.block(x)
    params = {"conv": W._conv(_sd(tu), "block.conv")}
    out = UpsampleT(8).apply({"params": params}, _nhwc(x))
    _assert_close(out, want, label="UNet upsample")


def test_vae_downsample_asymmetric_padding_matches_torch():
    from safe_denoiser_tpu.models.vae import Downsample

    torch.manual_seed(3)
    td = _Wrap(TDownVAE(8)).eval()
    x = torch.randn(1, 8, 9, 9)
    with torch.no_grad():
        want = td.block(x)
    params = {"conv": W._conv(_sd(td), "block.conv")}
    out = Downsample(8).apply({"params": params}, _nhwc(x))
    _assert_close(out, want, label="VAE downsample")


def test_transformer2d_matches_torch():
    from safe_denoiser_tpu.models.unet import Transformer2D

    torch.manual_seed(4)
    c, heads, ctx_dim = 32, 2, 16
    tb = _Wrap(TTransformer2D(c, heads, ctx_dim, groups=8)).eval()
    x = torch.randn(2, c, 6, 6)
    ctx = torch.randn(2, 5, ctx_dim)
    with torch.no_grad():
        want = tb.block(x, ctx)
    params = W._transformer2d(_sd(tb), "block", 1)
    out = Transformer2D(heads, c // heads, ctx_dim, 1, groups=8).apply(
        {"params": params}, _nhwc(x), jnp.asarray(ctx.numpy()))
    _assert_close(out, want, label="Transformer2D")


def test_unet_forward_matches_torch():
    """Whole tiny UNet: pins skip ordering, timestep embedding, attention
    scaling, GEGLU, conv_norm_out — everything the 50-step scan touches."""
    from safe_denoiser_tpu.models.unet import UNetConfig, UNet2DCondition

    torch.manual_seed(5)
    tm = TUNet(chans=(32, 64), layers=1, heads=2, ctx_dim=16, groups=8).eval()
    x = torch.randn(2, 4, 8, 8)
    t = torch.tensor([3.0, 977.0])
    ctx = torch.randn(2, 5, 16)
    with torch.no_grad():
        want = tm(x, t, ctx)

    cfg = UNetConfig(sample_size=8, block_out_channels=(32, 64),
                     layers_per_block=1, cross_attention_dim=16,
                     num_attention_heads=2, norm_num_groups=8)
    params = W.convert_unet(_sd(tm), cfg)
    out = UNet2DCondition(cfg).apply(
        params, _nhwc(x), jnp.asarray(t.numpy()), jnp.asarray(ctx.numpy()))
    _assert_close(out, want, atol=2e-4, label="UNet2DCondition forward")


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


class TVAEAttn(nn.Module):
    """diffusers VAE mid-block Attention: GroupNorm(eps 1e-6) → 1-head qkv
    (bias=True) → out proj → residual."""

    def __init__(self, c, groups=8):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        res = x
        y = self.group_norm(x).view(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        o = F.scaled_dot_product_attention(q[:, None], k[:, None], v[:, None])[:, 0]
        o = self.to_out[0](o)
        return res + o.transpose(1, 2).view(b, c, h, w)


class TVAE(nn.Module):
    """Tiny diffusers AutoencoderKL (eps 1e-6 everywhere, asymmetric
    downsample pad, mid attention, quant convs, logvar clamp [-30, 20])."""

    def __init__(self, chans=(16, 32), layers=1, latent=4, groups=8, cin=3):
        super().__init__()
        n = len(chans)
        self.latent = latent

        enc = nn.Module()
        enc.conv_in = nn.Conv2d(cin, chans[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        c_prev = chans[0]
        for i, ch in enumerate(chans):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [TResnet(c_prev if j == 0 else ch, ch, None, groups, eps=1e-6)
                 for j in range(layers)])
            if i < n - 1:
                blk.downsamplers = nn.ModuleList([TDownVAE(ch)])
            c_prev = ch
            enc.down_blocks.append(blk)
        enc.mid_block = self._mid(chans[-1], groups)
        enc.conv_norm_out = nn.GroupNorm(groups, chans[-1], eps=1e-6)
        enc.conv_out = nn.Conv2d(chans[-1], 2 * latent, 3, padding=1)
        self.encoder = enc

        dec = nn.Module()
        rev = list(reversed(chans))
        dec.conv_in = nn.Conv2d(latent, rev[0], 3, padding=1)
        dec.mid_block = self._mid(rev[0], groups)
        dec.up_blocks = nn.ModuleList()
        c_prev = rev[0]
        for i, ch in enumerate(rev):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [TResnet(c_prev if j == 0 else ch, ch, None, groups, eps=1e-6)
                 for j in range(layers + 1)])
            if i < n - 1:
                blk.upsamplers = nn.ModuleList([TUp(ch, ch)])
            c_prev = ch
            dec.up_blocks.append(blk)
        dec.conv_norm_out = nn.GroupNorm(groups, rev[-1], eps=1e-6)
        dec.conv_out = nn.Conv2d(rev[-1], cin, 3, padding=1)
        self.decoder = dec

        self.quant_conv = nn.Conv2d(2 * latent, 2 * latent, 1)
        self.post_quant_conv = nn.Conv2d(latent, latent, 1)

    @staticmethod
    def _mid(c, groups):
        mid = nn.Module()
        mid.resnets = nn.ModuleList([TResnet(c, c, None, groups, eps=1e-6),
                                     TResnet(c, c, None, groups, eps=1e-6)])
        mid.attentions = nn.ModuleList([TVAEAttn(c, groups)])
        return mid

    def encode(self, x):
        e = self.encoder
        x = e.conv_in(x)
        for blk in e.down_blocks:
            for res in blk.resnets:
                x = res(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0](x)
        x = e.mid_block.resnets[0](x)
        x = e.mid_block.attentions[0](x)
        x = e.mid_block.resnets[1](x)
        x = e.conv_out(F.silu(e.conv_norm_out(x)))
        moments = self.quant_conv(x)
        mean, logvar = moments.chunk(2, dim=1)
        return mean, logvar.clamp(-30.0, 20.0)

    def decode(self, z):
        d = self.decoder
        x = d.conv_in(self.post_quant_conv(z))
        x = d.mid_block.resnets[0](x)
        x = d.mid_block.attentions[0](x)
        x = d.mid_block.resnets[1](x)
        for blk in d.up_blocks:
            for res in blk.resnets:
                x = res(x)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0](x)
        return d.conv_out(F.silu(d.conv_norm_out(x)))


def test_vae_encode_decode_match_torch():
    from safe_denoiser_tpu.models.vae import AutoencoderKL, VAEConfig

    torch.manual_seed(6)
    tm = TVAE(chans=(16, 32), layers=1, latent=4, groups=8).eval()
    x = torch.randn(2, 3, 16, 16)
    z = torch.randn(2, 4, 8, 8)
    with torch.no_grad():
        want_mean, want_logvar = tm.encode(x)
        want_img = tm.decode(z)

    cfg = VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                    norm_num_groups=8, sample_size=16)
    model = AutoencoderKL(cfg)
    params = W.convert_vae(_sd(tm), cfg)
    mean, logvar = model.apply(params, _nhwc(x), method=model.encode)
    _assert_close(mean, want_mean, label="VAE encode mean")
    _assert_close(logvar, want_logvar, label="VAE encode logvar")
    img = model.apply(params, _nhwc(z), method=model.decode)
    _assert_close(img, want_img, label="VAE decode")


# ---------------------------------------------------------------------------
# SD3 MMDiT
# ---------------------------------------------------------------------------


def t_get_2d_sincos_pos_embed(dim, grid_size, base_size):
    """diffusers get_2d_sincos_pos_embed (interpolation_scale=1): positions
    scaled by grid_size/base_size; meshgrid(w, h); the first embedding half
    encodes grid[0] (the column/w coordinate)."""

    def _1d(d, pos):
        omega = np.arange(d // 2, dtype=np.float64) / (d / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float32) / (grid_size / base_size)
    grid_w = np.arange(grid_size, dtype=np.float32) / (grid_size / base_size)
    grid = np.meshgrid(grid_w, grid_h)  # w first, as in diffusers
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])
    emb_h = _1d(dim // 2, grid[0])
    emb_w = _1d(dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)  # [grid², dim]


class TAdaLNZero(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.linear = nn.Linear(dim, 6 * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, emb):
        mod = self.linear(F.silu(emb))
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = mod.chunk(6, dim=1)
        h = self.norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return h, gate_msa, shift_mlp, scale_mlp, gate_mlp


class TAdaLNContinuous(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.linear = nn.Linear(dim, 2 * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, emb):
        mod = self.linear(F.silu(emb))
        scale, shift = mod.chunk(2, dim=1)  # scale FIRST (unlike AdaLNZero)
        return self.norm(x) * (1 + scale[:, None]) + shift[:, None]


class TRMSNorm(nn.Module):
    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        return (x.float() * torch.rsqrt(var + self.eps)) * self.weight


class TJointAttn(nn.Module):
    """diffusers JointAttnProcessor: image and context projected separately,
    concatenated [image; context] along sequence, one attention, split back;
    context out-proj (to_add_out) absent in the last (context_pre_only)
    block."""

    def __init__(self, dim, heads, context_pre_only, qk_norm=None):
        super().__init__()
        self.heads = heads
        self.context_pre_only = context_pre_only
        for n in ("to_q", "to_k", "to_v"):
            setattr(self, n, nn.Linear(dim, dim))
        self.add_q_proj = nn.Linear(dim, dim)
        self.add_k_proj = nn.Linear(dim, dim)
        self.add_v_proj = nn.Linear(dim, dim)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        if not context_pre_only:
            self.to_add_out = nn.Linear(dim, dim)
        if qk_norm == "rms_norm":
            hd = dim // heads
            self.norm_q = TRMSNorm(hd)
            self.norm_k = TRMSNorm(hd)
            self.norm_added_q = TRMSNorm(hd)
            self.norm_added_k = TRMSNorm(hd)

    def _heads(self, t):
        b, s, d = t.shape
        return t.view(b, s, self.heads, d // self.heads)

    def forward(self, x, context):
        b, s_img = x.shape[0], x.shape[1]
        q, k, v = (self._heads(p(x)) for p in (self.to_q, self.to_k, self.to_v))
        cq = self._heads(self.add_q_proj(context))
        ck = self._heads(self.add_k_proj(context))
        cv = self._heads(self.add_v_proj(context))
        if hasattr(self, "norm_q"):
            q, k = self.norm_q(q), self.norm_k(k)
            cq, ck = self.norm_added_q(cq), self.norm_added_k(ck)
        q = torch.cat([q, cq], dim=1).transpose(1, 2)
        k = torch.cat([k, ck], dim=1).transpose(1, 2)
        v = torch.cat([v, cv], dim=1).transpose(1, 2)
        o = F.scaled_dot_product_attention(q.float(), k.float(), v.float())
        o = o.transpose(1, 2).reshape(b, -1, q.shape[1] * q.shape[3])
        x_o, c_o = o[:, :s_img], o[:, s_img:]
        x_o = self.to_out[0](x_o)
        c_o = None if self.context_pre_only else self.to_add_out(c_o)
        return x_o, c_o


class TFFgelu(nn.Module):
    """SD3 FeedForward(gelu-approximate): net.0.proj Linear → tanh-gelu →
    net.2 Linear."""

    def __init__(self, dim):
        super().__init__()
        proj = nn.Module()
        proj.proj = nn.Linear(dim, 4 * dim)
        self.net = nn.ModuleList([proj, nn.Identity(), nn.Linear(4 * dim, dim)])

    def forward(self, x):
        return self.net[2](F.gelu(self.net[0].proj(x), approximate="tanh"))


class TJointBlock(nn.Module):
    def __init__(self, dim, heads, context_pre_only, qk_norm=None):
        super().__init__()
        self.context_pre_only = context_pre_only
        self.norm1 = TAdaLNZero(dim)
        self.norm1_context = (TAdaLNContinuous(dim) if context_pre_only
                              else TAdaLNZero(dim))
        self.attn = TJointAttn(dim, heads, context_pre_only, qk_norm)
        self.norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.ff = TFFgelu(dim)
        if not context_pre_only:
            self.norm2_context = nn.LayerNorm(dim, elementwise_affine=False,
                                              eps=1e-6)
            self.ff_context = TFFgelu(dim)

    def forward(self, x, context, emb):
        xh, x_gate, x_shift_mlp, x_scale_mlp, x_gate_mlp = self.norm1(x, emb)
        if self.context_pre_only:
            ch = self.norm1_context(context, emb)
        else:
            ch, c_gate, c_shift_mlp, c_scale_mlp, c_gate_mlp = (
                self.norm1_context(context, emb))
        x_attn, c_attn = self.attn(xh, ch)
        x = x + x_gate[:, None] * x_attn
        h = self.norm2(x) * (1 + x_scale_mlp[:, None]) + x_shift_mlp[:, None]
        x = x + x_gate_mlp[:, None] * self.ff(h)
        if self.context_pre_only:
            return x, None
        context = context + c_gate[:, None] * c_attn
        h = (self.norm2_context(context) * (1 + c_scale_mlp[:, None])
             + c_shift_mlp[:, None])
        context = context + c_gate_mlp[:, None] * self.ff_context(h)
        return x, context


class TMMDiT(nn.Module):
    """Tiny diffusers SD3Transformer2DModel (the transformer the reference's
    SD3 pipelines sample through, models/sdv3/sdv3_pipeline.py)."""

    def __init__(self, dim=32, heads=2, layers=2, cin=4, patch=2,
                 joint_dim=24, pooled_dim=20, sample_size=16,
                 pos_embed_max_size=12, qk_norm=None):
        super().__init__()
        self.dim, self.patch, self.cin = dim, patch, cin
        self.pos_embed_max_size = pos_embed_max_size
        self.base_size = sample_size // patch
        pe = nn.Module()
        pe.proj = nn.Conv2d(cin, dim, patch, stride=patch)
        self.pos_embed = pe
        tte = nn.Module()
        tte.timestep_embedder = TTimeEmbedding(256, dim)
        tte.text_embedder = TTimeEmbedding(pooled_dim, dim)
        self.time_text_embed = tte
        self.context_embedder = nn.Linear(joint_dim, dim)
        self.transformer_blocks = nn.ModuleList(
            [TJointBlock(dim, heads, context_pre_only=(i == layers - 1),
                         qk_norm=qk_norm)
             for i in range(layers)])
        self.norm_out = TAdaLNContinuous(dim)
        self.proj_out = nn.Linear(dim, patch * patch * cin)

    def forward(self, x, t, context, pooled):
        b, c, h, w = x.shape
        p = self.patch
        gh, gw = h // p, w // p
        x = self.pos_embed.proj(x).flatten(2).transpose(1, 2)  # [B, ghw, D]
        table = t_get_2d_sincos_pos_embed(self.dim, self.pos_embed_max_size,
                                          self.base_size)
        table = table.reshape(self.pos_embed_max_size,
                              self.pos_embed_max_size, self.dim)
        top = (self.pos_embed_max_size - gh) // 2
        left = (self.pos_embed_max_size - gw) // 2
        pos = table[top:top + gh, left:left + gw].reshape(gh * gw, self.dim)
        x = x + torch.as_tensor(pos, dtype=torch.float32)[None]

        emb = self.time_text_embed.timestep_embedder(
            t_timestep_embedding(t, 256))
        emb = emb + self.time_text_embed.text_embedder(pooled)
        context = self.context_embedder(context)

        for blk in self.transformer_blocks:
            x, context = blk(x, context, emb)
        x = self.norm_out(x, emb)
        x = self.proj_out(x)
        # diffusers unpatchify: nhwpqc -> nchpwq
        x = x.reshape(b, gh, gw, p, p, self.cin)
        x = torch.einsum("nhwpqc->nchpwq", x)
        return x.reshape(b, self.cin, gh * p, gw * p)


@pytest.mark.parametrize("qk_norm", [None, "rms_norm"])
def test_mmdit_matches_torch(qk_norm):
    from safe_denoiser_tpu.models.mmdit import MMDiT, MMDiTConfig

    torch.manual_seed(7)
    tm = TMMDiT(dim=32, heads=2, layers=2, cin=4, patch=2, joint_dim=24,
                pooled_dim=20, sample_size=16, pos_embed_max_size=12,
                qk_norm=qk_norm).eval()
    # non-square grid (gh=4, gw=6) pins the pos-embed crop orientation
    x = torch.randn(2, 4, 8, 12)
    t = torch.tensor([500.0, 31.0])
    ctx = torch.randn(2, 7, 24)
    pooled = torch.randn(2, 20)
    with torch.no_grad():
        want = tm(x, t, ctx, pooled)

    cfg = MMDiTConfig(sample_size=16, patch_size=2, in_channels=4,
                      out_channels=4, num_layers=2, num_heads=2, head_dim=16,
                      joint_attention_dim=24, caption_projection_dim=32,
                      pooled_projection_dim=20, pos_embed_max_size=12,
                      qk_norm=qk_norm)
    params = W.convert_mmdit(_sd(tm), cfg)
    out = MMDiT(cfg).apply(params, _nhwc(x), jnp.asarray(t.numpy()),
                           jnp.asarray(ctx.numpy()),
                           jnp.asarray(pooled.numpy()))
    _assert_close(out, want, atol=2e-4, label=f"MMDiT qk_norm={qk_norm}")
