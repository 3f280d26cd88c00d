"""FULL-MODEL numerical parity vs torch replicas of the reference's two
denoisers — this pins the graph composition (97-token assembly + causal/pad
masking + interleaved motion modules for the prior; skip-connection
stash/pop order, downsample/upsample placement and time-embedding flow for
the UNet), which the block-level tests cannot see.

The torch modules replicate `src/models/myprior_transformer.py:275-411` and
`src/models/unet.py:383-462` + `unet_blocks.py` forward semantics with the
reference's state-dict naming, so the tests also execute
convert_rcdms_prior / convert_rcdms_unet3d end to end on realistic keys."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from rcdms_tpu.configs import PriorConfig, StoryUNetConfig, TemporalConfig
from rcdms_tpu.io.convert import (
    convert_rcdms_prior,
    convert_rcdms_unet3d,
    to_numpy_state_dict,
)
from rcdms_tpu.models.prior import FramePrior
from rcdms_tpu.models.unet3d import StoryUNet

from tests.test_parity_torch_blocks import (
    TBasicBlock,
    TResnetBlock3D,
    TSpatialTransformer,
    TTemporalTransformer3D,
)

pytestmark = pytest.mark.slow  # compile-heavy; excluded from -m 'not slow'


def t_timestep_embedding(timesteps, dim):
    """diffusers get_timestep_embedding(flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    freqs = torch.exp(exponent / half)
    args = timesteps.float()[:, None] * freqs[None]
    emb = torch.cat([torch.sin(args), torch.cos(args)], dim=-1)
    return torch.cat([emb[:, half:], emb[:, :half]], dim=-1)


class TTimestepEmbedding(tnn.Module):
    def __init__(self, in_dim, dim):
        super().__init__()
        self.linear_1 = tnn.Linear(in_dim, dim)
        self.linear_2 = tnn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class TVanilla(tnn.Module):
    """VanillaTemporalModule wrapper (attr name `temporal_transformer`
    matches the reference state dict)."""

    def __init__(self, inner, heads, groups=8, max_len=5, prior_state=False):
        super().__init__()
        self.prior_state = prior_state
        self.temporal_transformer = TTemporalTransformer3D(
            inner, heads, inner // heads, groups=groups, max_len=max_len)

    def forward(self, x, video_length=5):
        return self.temporal_transformer(x, prior_state=self.prior_state,
                                         video_length=video_length)


# ---------------------------------------------------------------------------
# Full prior (MyPriorTransformer forward, myprior_transformer.py:275-411)
# ---------------------------------------------------------------------------


class TFullPrior(tnn.Module):
    def __init__(self, heads=2, head_dim=8, layers=2, embed_dim=16,
                 n_text=7, f=5, t_heads=2):
        super().__init__()
        inner = heads * head_dim
        self.inner, self.heads, self.n_text, self.f = inner, heads, n_text, f
        self.seq = n_text + 6
        self.time_embedding = TTimestepEmbedding(inner, inner)
        self.proj_in = tnn.Linear(embed_dim, inner)
        self.embedding_proj = tnn.Linear(embed_dim, inner)
        self.embedding_proj1 = tnn.Linear(embed_dim, inner)
        self.embedding_proj2 = tnn.Linear(embed_dim, inner)
        self.encoder_hidden_states_proj = tnn.Linear(embed_dim, inner)
        self.positional_embedding = tnn.Parameter(
            torch.zeros(1, self.seq, inner))
        self.prd_embedding = tnn.Parameter(torch.zeros(1, 1, inner))
        blocks = []
        for _ in range(layers):
            blocks.append(TBasicBlock(inner, heads, head_dim,
                                      activation="gelu",
                                      attention_bias=True))
            blocks.append(TVanilla(inner, t_heads, prior_state=True))
        self.transformer_blocks = tnn.ModuleList(blocks)
        self.norm_out = tnn.LayerNorm(inner)
        self.proj_to_clip_embeddings = tnn.Linear(inner, embed_dim)
        causal = torch.full([self.seq, self.seq], -10000.0).triu_(1)
        self.register_buffer("causal_attention_mask", causal[None],
                             persistent=False)

    def forward(self, x_t, timesteps, text_embed, text_hidden, image_embed,
                mask_embed, text_mask):
        """All leading dims are (b*f,) like the reference training loop."""
        bf = x_t.shape[0]
        temb = self.time_embedding(t_timestep_embedding(timesteps,
                                                        self.inner))
        tokens = torch.cat([
            self.encoder_hidden_states_proj(text_hidden),
            self.embedding_proj(text_embed)[:, None],
            self.embedding_proj1(image_embed)[:, None],
            self.embedding_proj2(mask_embed)[:, None],
            temb[:, None],
            self.proj_in(x_t)[:, None],
            self.prd_embedding.expand(bf, -1, -1),
        ], dim=1)
        h = tokens + self.positional_embedding

        mask = (1 - text_mask.float()) * -10000.0
        mask = F.pad(mask, (0, 6), value=0.0)
        mask = (mask[:, None, :] + self.causal_attention_mask)
        mask = mask.repeat_interleave(self.heads, dim=0)
        mask = mask.reshape(bf, self.heads, self.seq, self.seq)

        for block in self.transformer_blocks:
            if isinstance(block, TBasicBlock):
                h = block(h, attention_mask=mask)
            else:
                h = block(h, video_length=self.f)
        h = self.norm_out(h)
        return self.proj_to_clip_embeddings(h[:, -1])


def test_full_prior_parity():
    torch.manual_seed(30)
    b, f, d, t = 2, 5, 16, 7
    ref = TFullPrior(heads=2, head_dim=8, layers=2, embed_dim=d,
                     n_text=t, f=f).eval()
    with torch.no_grad():  # randomize the zero-init surgery params
        ref.positional_embedding.normal_()
        ref.prd_embedding.normal_()
        for m in ref.transformer_blocks:
            if isinstance(m, TVanilla):
                m.temporal_transformer.proj_out.weight.normal_()
                m.temporal_transformer.proj_out.bias.normal_()

    x_t = torch.randn(b * f, d)
    timesteps = torch.randint(0, 1000, (b * f,))
    text_embed = torch.randn(b * f, d)
    text_hidden = torch.randn(b * f, t, d)
    image_embed = torch.randn(b * f, d)
    mask_embed = torch.randn(b * f, d)
    text_mask = torch.ones(b * f, t, dtype=torch.bool)
    text_mask[:, 4:] = False
    with torch.no_grad():
        want = ref(x_t, timesteps, text_embed, text_hidden, image_embed,
                   mask_embed, text_mask).numpy()

    cfg = PriorConfig.tiny(
        embedding_dim=d, num_text_tokens=t,
        temporal=TemporalConfig(num_heads=2, num_blocks=1))
    params = convert_rcdms_prior(to_numpy_state_dict(ref.state_dict()), cfg)
    ours = FramePrior(cfg)

    def r(x):
        return jnp.asarray(x.numpy()).reshape((b, f) + x.shape[1:])

    got = ours.apply({"params": params}, r(x_t),
                     jnp.asarray(timesteps.numpy()).reshape(b, f),
                     r(text_embed), r(text_hidden), r(image_embed),
                     r(mask_embed), r(text_mask))
    np.testing.assert_allclose(np.asarray(got).reshape(b * f, d), want,
                               atol=5e-5)


# ---------------------------------------------------------------------------
# Full UNet3D (unet.py:383-462 + unet_blocks.py forward semantics)
# ---------------------------------------------------------------------------


class TDownsample3D(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class TUpsample3D(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class TDownBlock3D(tnn.Module):
    def __init__(self, in_ch, out_ch, temb_dim, n_layers, cross, heads,
                 ctx_dim, groups, t_heads, last):
        super().__init__()
        self.cross = cross
        self.resnets = tnn.ModuleList(
            [TResnetBlock3D(in_ch if j == 0 else out_ch, out_ch, temb_dim,
                            groups=groups, eps=1e-5)
             for j in range(n_layers)])
        if cross:
            self.attentions = tnn.ModuleList(
                [TSpatialTransformer(out_ch, heads, out_ch // heads, ctx_dim,
                                     groups=groups)
                 for _ in range(n_layers)])
        self.motion_modules = tnn.ModuleList(
            [TVanilla(out_ch, t_heads, groups=32)
             for _ in range(n_layers)])
        self.downsamplers = (None if last
                             else tnn.ModuleList([TDownsample3D(out_ch)]))

    def forward(self, x, temb, ctx, b, f):
        outs = ()
        for j, resnet in enumerate(self.resnets):
            x = resnet(x, temb)
            if self.cross:
                x = self.attentions[j](x, ctx)
            x = _apply_motion(self.motion_modules[j], x, b, f)
            outs += (x,)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            outs += (x,)
        return x, outs


class TUpBlock3D(tnn.Module):
    def __init__(self, skip_chs, prev_ch, out_ch, temb_dim, n_layers, cross,
                 heads, ctx_dim, groups, t_heads, last):
        super().__init__()
        self.cross = cross
        resnets = []
        for j in range(n_layers):
            in_ch = (prev_ch if j == 0 else out_ch) + skip_chs[j]
            resnets.append(TResnetBlock3D(in_ch, out_ch, temb_dim,
                                          groups=groups, eps=1e-5))
        self.resnets = tnn.ModuleList(resnets)
        if cross:
            self.attentions = tnn.ModuleList(
                [TSpatialTransformer(out_ch, heads, out_ch // heads, ctx_dim,
                                     groups=groups)
                 for _ in range(n_layers)])
        self.motion_modules = tnn.ModuleList(
            [TVanilla(out_ch, t_heads, groups=32) for _ in range(n_layers)])
        self.upsamplers = (None if last
                           else tnn.ModuleList([TUpsample3D(out_ch)]))

    def forward(self, x, skips, temb, ctx, b, f):
        for j, resnet in enumerate(self.resnets):
            x = torch.cat([x, skips.pop()], dim=1)
            x = resnet(x, temb)
            if self.cross:
                x = self.attentions[j](x, ctx)
            x = _apply_motion(self.motion_modules[j], x, b, f)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class TMidBlock3D(tnn.Module):
    def __init__(self, ch, temb_dim, heads, ctx_dim, groups):
        super().__init__()
        self.resnets = tnn.ModuleList(
            [TResnetBlock3D(ch, ch, temb_dim, groups=groups, eps=1e-5),
             TResnetBlock3D(ch, ch, temb_dim, groups=groups, eps=1e-5)])
        self.attentions = tnn.ModuleList(
            [TSpatialTransformer(ch, heads, ch // heads, ctx_dim,
                                 groups=groups)])

    def forward(self, x, temb, ctx):
        x = self.resnets[0](x, temb)
        x = self.attentions[0](x, ctx)
        return self.resnets[1](x, temb)


def _apply_motion(motion, x, b, f):
    """(b*f, C, H, W) -> reference (b, C, f, H, W) layout and back."""
    bf, c, h, w = x.shape
    y = x.reshape(b, f, c, h, w).permute(0, 2, 1, 3, 4)
    y = motion(y, video_length=f)
    return y.permute(0, 2, 1, 3, 4).reshape(bf, c, h, w)


class TUNet3D(tnn.Module):
    """Tiny reference UNet3DConditionModel: channels (32, 64), 1 layer per
    block, cross-attn at level 0 only, motion everywhere, 9-ch conv_in."""

    def __init__(self, chs=(32, 64), lpb=1, cross=(True, False), in_ch=9,
                 out_ch=4, ctx_dim=24, heads=4, groups=8, t_heads=2):
        super().__init__()
        self.conv_in = tnn.Conv2d(in_ch, chs[0], 3, padding=1)
        temb_dim = chs[0] * 4
        self.ch0 = chs[0]
        self.time_embedding = TTimestepEmbedding(chs[0], temb_dim)
        self.down_blocks = tnn.ModuleList()
        for i, ch in enumerate(chs):
            self.down_blocks.append(TDownBlock3D(
                chs[max(i - 1, 0)], ch, temb_dim, lpb, cross[i], heads,
                ctx_dim, groups, t_heads, last=i == len(chs) - 1))
        self.mid_block = TMidBlock3D(chs[-1], temb_dim, heads, ctx_dim,
                                     groups)
        self.up_blocks = tnn.ModuleList()
        rev = list(reversed(chs))
        rev_cross = list(reversed(cross))
        # skip channels, in pop order per up level (reference unet.py:
        # res stash = [conv_in] + per-sub-block + per-downsample outputs)
        stash = [chs[0]]
        for i, ch in enumerate(chs):
            stash += [ch] * lpb
            if i != len(chs) - 1:
                stash += [ch]
        prev = rev[0]
        for i, ch in enumerate(rev):
            skips = [stash.pop() for _ in range(lpb + 1)]
            self.up_blocks.append(TUpBlock3D(
                skips, prev, ch, temb_dim, lpb + 1, rev_cross[i], heads,
                ctx_dim, groups, t_heads, last=i == len(rev) - 1))
            prev = ch
        self.conv_norm_out = tnn.GroupNorm(groups, chs[0], eps=1e-5)
        self.conv_out = tnn.Conv2d(chs[0], out_ch, 3, padding=1)

    def forward(self, sample, timesteps, ctx):
        """sample (b, C, f, h, w); timesteps (b,); ctx (b, f, T, d)."""
        b, c, f, h, w = sample.shape
        temb = self.time_embedding(t_timestep_embedding(timesteps, self.ch0))
        temb_rep = temb.repeat_interleave(f, 0)
        x = sample.permute(0, 2, 1, 3, 4).reshape(b * f, c, h, w)
        ctx = ctx.reshape(b * f, *ctx.shape[2:])
        x = self.conv_in(x)
        skips = [x]
        for blk in self.down_blocks:
            x, outs = blk(x, temb_rep, ctx, b, f)
            skips += list(outs)
        x = self.mid_block(x, temb_rep, ctx)
        for blk in self.up_blocks:
            x = blk(x, skips, temb_rep, ctx, b, f)
        x = self.conv_out(F.silu(self.conv_norm_out(x)))
        return x.reshape(b, f, *x.shape[1:]).permute(0, 2, 1, 3, 4)


def test_full_unet3d_parity():
    torch.manual_seed(31)
    ref = TUNet3D().eval()
    with torch.no_grad():  # randomize zero-init motion out-projections
        for m in ref.modules():
            if isinstance(m, TVanilla):
                m.temporal_transformer.proj_out.weight.normal_()
                m.temporal_transformer.proj_out.bias.normal_()

    b, f, hw = 1, 5, 16
    sample = torch.randn(b, 9, f, hw, hw)
    timesteps = torch.randint(0, 1000, (b,))
    ctx = torch.randn(b, f, 6, 24)
    with torch.no_grad():
        want = ref(sample, timesteps, ctx).numpy()

    cfg = StoryUNetConfig.tiny()  # (32, 64), lpb 1, cross (T, F), groups 8
    params = convert_rcdms_unet3d(to_numpy_state_dict(ref.state_dict()),
                                  cfg)
    ours = StoryUNet(cfg)
    got = ours.apply(
        {"params": params},
        jnp.asarray(sample.numpy().transpose(0, 2, 3, 4, 1)),
        jnp.asarray(timesteps.numpy()),
        jnp.asarray(ctx.numpy()))
    got_nchw = np.asarray(got).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got_nchw, want, atol=1e-4)
