"""Block-level numerical parity vs inline torch replicas of the reference
modules (VERDICT round-1 item 1a): BasicTransformerBlock (geglu + gelu/
masked prior variants), ResnetBlock3D, Transformer3DModel (spatial),
VanillaTemporalModule (PE-into-qkv, both GroupNorm/LayerNorm-in modes), and
the full SD VAE (encoder + mid attention + decoder + quant convs).

Each torch module reproduces the reference's math and state-dict naming
(`src/models/attention.py:368-526`, `src/models/resnet.py:109-212`,
`src/models/motion_module.py:96-353`, diffusers AutoencoderKL as loaded at
`train_stage2.py:248`), so these tests simultaneously verify the forward
math AND execute the io/convert.py mapping functions on full-key state
dicts."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from rcdms_tpu.configs import TemporalConfig, VAEConfig
from rcdms_tpu.core.attention import BasicTransformerBlock, SpatialTransformer
from rcdms_tpu.core.resnet import ResnetBlock
from rcdms_tpu.core.temporal import TemporalModule
from rcdms_tpu.io.convert import (
    _basic_block,
    _resnet,
    _spatial_transformer,
    _temporal_module,
    convert_sd_vae,
    to_numpy_state_dict,
)
from rcdms_tpu.models.vae import VAE

pytestmark = pytest.mark.slow  # compile-heavy; excluded from -m 'not slow'


def _prefixed(sd, prefix):
    return {f"{prefix}.{k}": v for k, v in sd.items()}


# ---------------------------------------------------------------------------
# torch replicas (reference math + state-dict naming)
# ---------------------------------------------------------------------------


class TCrossAttention(tnn.Module):
    """Reference `CrossAttention` (`attention.py:31-199`): baddbmm+softmax
    with additive mask; to_out is ModuleList([Linear, Dropout])."""

    def __init__(self, query_dim, cross_attention_dim=None, heads=2,
                 dim_head=8, bias=False):
        super().__init__()
        inner = heads * dim_head
        ctx = cross_attention_dim or query_dim
        self.heads, self.dim_head = heads, dim_head
        self.to_q = tnn.Linear(query_dim, inner, bias=bias)
        self.to_k = tnn.Linear(ctx, inner, bias=bias)
        self.to_v = tnn.Linear(ctx, inner, bias=bias)
        self.to_out = tnn.ModuleList([tnn.Linear(inner, query_dim),
                                      tnn.Dropout(0.0)])

    def forward(self, x, encoder_hidden_states=None, attention_mask=None):
        ctx = x if encoder_hidden_states is None else encoder_hidden_states
        b, n, _ = x.shape
        q, k, v = self.to_q(x), self.to_k(ctx), self.to_v(ctx)

        def split(t):
            return t.reshape(b, -1, self.heads, self.dim_head).transpose(1, 2)

        q, k, v = split(q), split(k), split(v)
        scores = (q @ k.transpose(-1, -2)) * self.dim_head ** -0.5
        if attention_mask is not None:
            scores = scores + attention_mask
        out = scores.softmax(-1) @ v
        out = out.transpose(1, 2).reshape(b, n, -1)
        return self.to_out[0](out)


class TGEGLU(tnn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = tnn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class TGELU(tnn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = tnn.Linear(dim, inner)

    def forward(self, x):
        return F.gelu(self.proj(x))


class TFeedForward(tnn.Module):
    """diffusers FeedForward: net = [act(.proj), Dropout, Linear]."""

    def __init__(self, dim, activation="geglu", mult=4):
        super().__init__()
        act = TGEGLU(dim, dim * mult) if activation == "geglu" else TGELU(
            dim, dim * mult)
        self.net = tnn.ModuleList([act, tnn.Dropout(0.0),
                                   tnn.Linear(dim * mult, dim)])

    def forward(self, x):
        for layer in self.net:
            x = layer(x)
        return x


class TBasicBlock(tnn.Module):
    """Reference BasicTransformerBlock forward (`attention.py:480-526`)."""

    def __init__(self, dim, heads, dim_head, cross_attention_dim=None,
                 activation="geglu", attention_bias=False):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TCrossAttention(dim, None, heads, dim_head,
                                     bias=attention_bias)
        if cross_attention_dim is not None:
            self.norm2 = tnn.LayerNorm(dim)
            self.attn2 = TCrossAttention(dim, cross_attention_dim, heads,
                                         dim_head, bias=attention_bias)
        else:
            self.attn2 = None
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = TFeedForward(dim, activation)

    def forward(self, x, encoder_hidden_states=None, attention_mask=None):
        x = self.attn1(self.norm1(x), attention_mask=attention_mask) + x
        if self.attn2 is not None:
            x = self.attn2(self.norm2(x),
                           encoder_hidden_states=encoder_hidden_states) + x
        return self.ff(self.norm3(x)) + x


class TResnetBlock3D(tnn.Module):
    """Reference ResnetBlock3D (`resnet.py:109-212`) on a folded (b*f)
    frame axis (InflatedConv3d == per-frame Conv2d)."""

    def __init__(self, in_ch, out_ch, temb_dim, groups=8, eps=1e-6):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = tnn.Linear(temb_dim, out_ch)
        self.norm2 = tnn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (tnn.Conv2d(in_ch, out_ch, 1)
                              if in_ch != out_ch else None)

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TSpatialTransformer(tnn.Module):
    """Reference Transformer3DModel (`attention.py:254-365`) per frame:
    GroupNorm -> conv1x1 proj_in -> tokens -> blocks -> conv1x1 proj_out."""

    def __init__(self, ch, heads, dim_head, ctx_dim, groups=8,
                 num_layers=1):
        super().__init__()
        inner = heads * dim_head
        self.norm = tnn.GroupNorm(groups, ch, eps=1e-6)
        self.proj_in = tnn.Conv2d(ch, inner, 1)
        self.transformer_blocks = tnn.ModuleList([
            TBasicBlock(inner, heads, dim_head, cross_attention_dim=ctx_dim)
            for _ in range(num_layers)])
        self.proj_out = tnn.Conv2d(inner, ch, 1)

    def forward(self, x, ctx):
        b, c, hh, ww = x.shape
        res = x
        h = self.proj_in(self.norm(x))
        h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, -1)
        for blk in self.transformer_blocks:
            h = blk(h, encoder_hidden_states=ctx)
        h = h.reshape(b, hh, ww, -1).permute(0, 3, 1, 2)
        return self.proj_out(h) + res


class TPositionalEncoding(tnn.Module):
    """Reference PositionalEncoding (`motion_module.py:249-267`)."""

    def __init__(self, d_model, max_len=5):
        super().__init__()
        position = torch.arange(max_len).unsqueeze(1)
        div = torch.exp(torch.arange(0, d_model, 2)
                        * (-math.log(10000.0) / d_model))
        pe = torch.zeros(1, max_len, d_model)
        pe[0, :, 0::2] = torch.sin(position * div)
        pe[0, :, 1::2] = torch.cos(position * div)
        self.register_buffer("pe", pe)

    def forward(self, x):
        return x + self.pe[:, :x.size(1)]


class TVersatileAttention(TCrossAttention):
    """Reference VersatileAttention Temporal mode (`motion_module.py:270-353`):
    rearrange (b f) d c -> (b d) f c, add PE to the (normed) states BEFORE
    qkv, attend across frames, rearrange back."""

    def __init__(self, dim, heads, dim_head, max_len=5):
        super().__init__(dim, None, heads, dim_head, bias=False)
        self.pos_encoder = TPositionalEncoding(dim, max_len=max_len)

    def forward(self, x, video_length=None):
        bf, d, c = x.shape
        b = bf // video_length
        x = x.reshape(b, video_length, d, c).permute(0, 2, 1, 3)
        x = x.reshape(b * d, video_length, c)
        x = self.pos_encoder(x)
        out = super().forward(x)
        out = out.reshape(b, d, video_length, c).permute(0, 2, 1, 3)
        return out.reshape(bf, d, c)


class TTemporalBlock(tnn.Module):
    """Reference TemporalTransformerBlock (`motion_module.py:185-246`)."""

    def __init__(self, dim, heads, dim_head, n_attn=2, max_len=5):
        super().__init__()
        self.attention_blocks = tnn.ModuleList(
            [TVersatileAttention(dim, heads, dim_head, max_len)
             for _ in range(n_attn)])
        self.norms = tnn.ModuleList([tnn.LayerNorm(dim)
                                     for _ in range(n_attn)])
        self.ff = TFeedForward(dim, "geglu")
        self.ff_norm = tnn.LayerNorm(dim)

    def forward(self, x, video_length):
        for attn, norm in zip(self.attention_blocks, self.norms):
            x = attn(norm(x), video_length=video_length) + x
        return self.ff(self.ff_norm(x)) + x


class TTemporalTransformer3D(tnn.Module):
    """Reference TemporalTransformer3DModel (`motion_module.py:96-182`),
    wrapped like VanillaTemporalModule (attribute `temporal_transformer`
    lives one level up in the state dict; tests add the prefix)."""

    def __init__(self, in_ch, heads, dim_head, groups=8, num_layers=1,
                 max_len=5):
        super().__init__()
        inner = heads * dim_head
        self.norm = tnn.GroupNorm(groups, in_ch, eps=1e-6)
        self.prior_norm = tnn.LayerNorm(in_ch)
        self.proj_in = tnn.Linear(in_ch, inner)
        self.transformer_blocks = tnn.ModuleList(
            [TTemporalBlock(inner, heads, dim_head, max_len=max_len)
             for _ in range(num_layers)])
        self.proj_out = tnn.Linear(inner, in_ch)

    def forward(self, x, prior_state=False, video_length=5):
        if prior_state:
            res = x
            h = self.prior_norm(x)
            h = self.proj_in(h)
            for blk in self.transformer_blocks:
                h = blk(h, video_length=video_length)
            return self.proj_out(h) + res
        # x: (b, c, f, h, w)
        b, c, f, hh, ww = x.shape
        h = x.permute(0, 2, 1, 3, 4).reshape(b * f, c, hh, ww)
        res = h
        h = self.norm(h)
        h = h.permute(0, 2, 3, 1).reshape(b * f, hh * ww, c)
        h = self.proj_in(h)
        for blk in self.transformer_blocks:
            h = blk(h, video_length=f)
        h = self.proj_out(h)
        h = h.reshape(b * f, hh, ww, c).permute(0, 3, 1, 2)
        out = h + res
        return out.reshape(b, f, c, hh, ww).permute(0, 2, 1, 3, 4)


# ---------------------------------------------------------------------------
# torch VAE replica (diffusers AutoencoderKL naming)
# ---------------------------------------------------------------------------


class TVAEResnet(tnn.Module):
    def __init__(self, in_ch, out_ch, groups=4):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, in_ch, eps=1e-6)
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.norm2 = tnn.GroupNorm(groups, out_ch, eps=1e-6)
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (tnn.Conv2d(in_ch, out_ch, 1)
                              if in_ch != out_ch else None)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TVAEAttn(tnn.Module):
    """Single-head bottleneck attention (diffusers Attention w/ Linear
    projections, `to_out.0` naming)."""

    def __init__(self, ch, groups=4):
        super().__init__()
        self.group_norm = tnn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = tnn.Linear(ch, ch)
        self.to_k = tnn.Linear(ch, ch)
        self.to_v = tnn.Linear(ch, ch)
        self.to_out = tnn.ModuleList([tnn.Linear(ch, ch), tnn.Dropout(0.0)])

    def forward(self, x):
        b, c, hh, ww = x.shape
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        scores = (q @ k.transpose(-1, -2)) * c ** -0.5
        o = self.to_out[0](scores.softmax(-1) @ v)
        return x + o.reshape(b, hh, ww, c).permute(0, 3, 1, 2)


class TDownsample(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))  # SD asymmetric pad


class TUpsample(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class TDownBlock(tnn.Module):
    def __init__(self, in_ch, out_ch, n_res, groups, last):
        super().__init__()
        self.resnets = tnn.ModuleList(
            [TVAEResnet(in_ch if j == 0 else out_ch, out_ch, groups)
             for j in range(n_res)])
        self.downsamplers = (None if last
                             else tnn.ModuleList([TDownsample(out_ch)]))

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
        return x


class TUpBlock(tnn.Module):
    def __init__(self, in_ch, out_ch, n_res, groups, last):
        super().__init__()
        self.resnets = tnn.ModuleList(
            [TVAEResnet(in_ch if j == 0 else out_ch, out_ch, groups)
             for j in range(n_res)])
        self.upsamplers = (None if last
                           else tnn.ModuleList([TUpsample(out_ch)]))

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class TMidBlock(tnn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.resnets = tnn.ModuleList([TVAEResnet(ch, ch, groups),
                                       TVAEResnet(ch, ch, groups)])
        self.attentions = tnn.ModuleList([TVAEAttn(ch, groups)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class TVAEEncoder(tnn.Module):
    def __init__(self, channels, n_res, groups, z):
        super().__init__()
        self.conv_in = tnn.Conv2d(3, channels[0], 3, padding=1)
        self.down_blocks = tnn.ModuleList()
        for i, ch in enumerate(channels):
            in_ch = channels[max(i - 1, 0)]
            self.down_blocks.append(
                TDownBlock(in_ch, ch, n_res, groups,
                           last=i == len(channels) - 1))
        self.mid_block = TMidBlock(channels[-1], groups)
        self.conv_norm_out = tnn.GroupNorm(groups, channels[-1], eps=1e-6)
        self.conv_out = tnn.Conv2d(channels[-1], 2 * z, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            x = blk(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TVAEDecoder(tnn.Module):
    def __init__(self, channels, n_res, groups, z):
        super().__init__()
        rev = list(reversed(channels))
        self.conv_in = tnn.Conv2d(z, rev[0], 3, padding=1)
        self.mid_block = TMidBlock(rev[0], groups)
        self.up_blocks = tnn.ModuleList()
        for i, ch in enumerate(rev):
            in_ch = rev[max(i - 1, 0)]
            self.up_blocks.append(
                TUpBlock(in_ch, ch, n_res + 1, groups,
                         last=i == len(rev) - 1))
        self.conv_norm_out = tnn.GroupNorm(groups, rev[-1], eps=1e-6)
        self.conv_out = tnn.Conv2d(rev[-1], 3, 3, padding=1)

    def forward(self, z):
        z = self.conv_in(z)
        z = self.mid_block(z)
        for blk in self.up_blocks:
            z = blk(z)
        return self.conv_out(F.silu(self.conv_norm_out(z)))


class TAutoencoderKL(tnn.Module):
    def __init__(self, channels=(16, 32), n_res=1, groups=4, z=4):
        super().__init__()
        self.encoder = TVAEEncoder(channels, n_res, groups, z)
        self.decoder = TVAEDecoder(channels, n_res, groups, z)
        self.quant_conv = tnn.Conv2d(2 * z, 2 * z, 1)
        self.post_quant_conv = tnn.Conv2d(z, z, 1)

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def _nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def _nchw(a):
    return np.asarray(a).transpose(0, 3, 1, 2)


def test_basic_block_geglu_cross_parity():
    torch.manual_seed(10)
    ref = TBasicBlock(dim=32, heads=4, dim_head=8, cross_attention_dim=20,
                      activation="geglu").eval()
    x = torch.randn(3, 11, 32)
    ctx = torch.randn(3, 6, 20)
    with torch.no_grad():
        want = ref(x, encoder_hidden_states=ctx).numpy()

    params = _basic_block(_prefixed(to_numpy_state_dict(ref.state_dict()),
                                    "blk"), "blk", cross=True)
    ours = BasicTransformerBlock(heads=4, head_dim=8, use_cross=True,
                                 activation="geglu")
    got = ours.apply({"params": params}, jnp.asarray(x.numpy()),
                     context=jnp.asarray(ctx.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_basic_block_prior_variant_masked_parity():
    """gelu FF + biased qkv + causal/padding additive mask — the prior's
    block configuration (`myprior_transformer.py:153-161`)."""
    torch.manual_seed(11)
    ref = TBasicBlock(dim=32, heads=4, dim_head=8, cross_attention_dim=None,
                      activation="gelu", attention_bias=True).eval()
    x = torch.randn(2, 9, 32)
    mask = torch.zeros(1, 1, 9, 9)
    mask[..., torch.triu(torch.ones(9, 9), 1).bool()] = -1e9  # causal
    mask[..., 7:] = -1e9  # padding tail
    with torch.no_grad():
        want = ref(x, attention_mask=mask).numpy()

    params = _basic_block(_prefixed(to_numpy_state_dict(ref.state_dict()),
                                    "blk"), "blk", cross=False)
    ours = BasicTransformerBlock(heads=4, head_dim=8, use_cross=False,
                                 activation="gelu", attention_bias=True)
    got = ours.apply({"params": params}, jnp.asarray(x.numpy()),
                     mask=jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_resnet_block_parity():
    torch.manual_seed(12)
    ref = TResnetBlock3D(in_ch=16, out_ch=24, temb_dim=32, groups=8).eval()
    b, f = 2, 3
    x = torch.randn(b * f, 16, 8, 8)
    temb = torch.randn(b, 32)
    with torch.no_grad():
        want = ref(x, temb.repeat_interleave(f, 0)).numpy()

    params = _resnet(_prefixed(to_numpy_state_dict(ref.state_dict()),
                               "blk"), "blk")
    ours = ResnetBlock(out_channels=24, groups=8, eps=1e-6)
    x_j = _nhwc(x).reshape(b, f, 8, 8, 16)
    got = ours.apply({"params": params}, x_j, jnp.asarray(temb.numpy()))
    np.testing.assert_allclose(
        _nchw(np.asarray(got).reshape(b * f, 8, 8, 24)), want, atol=3e-5)


def test_spatial_transformer_parity():
    torch.manual_seed(13)
    ref = TSpatialTransformer(ch=16, heads=2, dim_head=8, ctx_dim=12,
                              groups=4).eval()
    b, f = 2, 2
    x = torch.randn(b * f, 16, 6, 6)
    ctx = torch.randn(b * f, 5, 12)
    with torch.no_grad():
        want = ref(x, ctx).numpy()

    params = _spatial_transformer(
        _prefixed(to_numpy_state_dict(ref.state_dict()), "st"), "st")
    ours = SpatialTransformer(heads=2, head_dim=8, num_layers=1,
                              norm_groups=4)
    x_j = _nhwc(x).reshape(b, f, 6, 6, 16)
    ctx_j = jnp.asarray(ctx.numpy()).reshape(b, f, 5, 12)
    got = ours.apply({"params": params}, x_j, ctx_j)
    np.testing.assert_allclose(
        _nchw(np.asarray(got).reshape(b * f, 6, 6, 16)), want, atol=3e-5)


def _temporal_pair(seed, ch, heads, groups=32):
    # ch must be a multiple of 32: both the reference and our TemporalModule
    # hardcode 32 GroupNorm groups in spatial mode (`motion_module.py:119`)
    torch.manual_seed(seed)
    ref = TTemporalTransformer3D(in_ch=ch, heads=heads, dim_head=ch // heads,
                                 groups=groups).eval()
    # randomize proj_out (reference zero-inits it; zero would make the
    # module an identity and the test vacuous)
    with torch.no_grad():
        ref.proj_out.weight.normal_()
        ref.proj_out.bias.normal_()
    cfg = TemporalConfig(num_heads=heads, num_blocks=1,
                         attn_layers_per_block=2, max_frames=5)
    ours = TemporalModule(channels=ch, cfg=cfg)
    return ref, ours


def test_temporal_module_spatial_mode_parity():
    """UNet ('motion module') mode: GroupNorm in, PE added to normed states
    before qkv, attention across f at every pixel."""
    ref, ours = _temporal_pair(14, ch=32, heads=4)
    b, f, hh, ww = 2, 5, 4, 4
    x = torch.randn(b, 32, f, hh, ww)
    with torch.no_grad():
        want = ref(x).numpy()

    params = _temporal_module(
        _prefixed(to_numpy_state_dict(ref.state_dict()),
                  "mm.temporal_transformer"), "mm", prior_mode=False)
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))  # b f h w c
    got = ours.apply({"params": params}, x_j)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 4, 1, 2, 3),
                               want, atol=3e-5)


def test_temporal_module_prior_mode_parity():
    """Prior mode: LayerNorm in (`motion_module.py:150-153`), tokens
    (b*f, n, c) with attention across the 5-frame axis."""
    ref, ours = _temporal_pair(15, ch=32, heads=4)
    b, f, n = 2, 5, 7
    x = torch.randn(b * f, n, 32)
    with torch.no_grad():
        want = ref(x, prior_state=True, video_length=f).numpy()

    params = _temporal_module(
        _prefixed(to_numpy_state_dict(ref.state_dict()),
                  "mm.temporal_transformer"), "mm", prior_mode=True)
    x_j = jnp.asarray(x.numpy()).reshape(b, f, n, 32)
    got = ours.apply({"params": params}, x_j)
    np.testing.assert_allclose(np.asarray(got).reshape(b * f, n, 32),
                               want, atol=3e-5)


def test_vae_full_parity():
    """Full tiny AutoencoderKL: encode moments (incl. quant_conv) and
    decode, executing convert_sd_vae on a complete state dict."""
    torch.manual_seed(16)
    ref = TAutoencoderKL(channels=(16, 32), n_res=1, groups=4, z=4).eval()
    x = torch.randn(2, 3, 16, 16)
    z = torch.randn(2, 4, 8, 8)
    with torch.no_grad():
        want_moments = ref.encode_moments(x).numpy()
        want_decoded = ref.decode(z).numpy()

    cfg = VAEConfig.tiny()
    params = convert_sd_vae(to_numpy_state_dict(ref.state_dict()), cfg)
    ours = VAE(cfg)
    mean, logvar = ours.apply({"params": params}, _nhwc(x),
                              method=VAE.encode)
    got_moments = np.concatenate([np.asarray(mean), np.asarray(logvar)],
                                 axis=-1)
    np.testing.assert_allclose(_nchw(got_moments), want_moments, atol=3e-5)
    got_decoded = ours.apply({"params": params}, _nhwc(z),
                             method=VAE.decode)
    np.testing.assert_allclose(_nchw(np.asarray(got_decoded)), want_decoded,
                               atol=3e-5)
