"""Torch/HF checkpoint -> JAX param-pytree converters.

Replaces the reference's `from_pretrained_2d` weight surgery
(`myprior_transformer.py:416-448`, `unet.py:465-509`) and the DeepSpeed
blob prefix-splitting (`stage2_batchtest_rcdms_model.py:225-243`):

  * SD1.5 UNet  -> StoryUNet params (conv_in dropped: 9-ch trained fresh;
    temporal modules fresh)
  * Kandinsky-2.2 prior -> FramePrior params (positional_embedding dropped:
    97-token table trained fresh; embedding_proj1/2 + temporal fresh)
  * SD1.5 VAE   -> VAE params
  * CLIP text (both towers, with vocab/position resize) and ViT-bigG vision

Input is a plain `dict[str, np.ndarray]` state dict (call `.numpy()` on
torch tensors or load with `torch.load(..., map_location='cpu')` and pass
through `to_numpy_state_dict`). No torch dependency inside this module's
conversion math.

Conventions: torch Linear weight (out,in) -> Dense kernel (in,out);
torch Conv2d (out,in,kh,kw) -> flax Conv kernel (kh,kw,in,out);
{Group,Layer}Norm weight/bias -> scale/bias.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import numpy as np

from rcdms_tpu.configs import (
    CLIPTextConfig,
    CLIPVisionConfig,
    PriorConfig,
    StoryUNetConfig,
    VAEConfig,
)

SD = Mapping[str, np.ndarray]
Params = Dict


def to_numpy_state_dict(torch_state_dict) -> Dict[str, np.ndarray]:
    """Detach/convert a torch state dict to numpy (host-side, fp32)."""
    out = {}
    for k, v in torch_state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().to("cpu").float().numpy()
        out[k] = np.asarray(v)
    return out


def _linear(sd: SD, prefix: str, bias: bool = True) -> Params:
    p = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if bias and f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _conv(sd: SD, prefix: str) -> Params:
    w = sd[f"{prefix}.weight"]  # (out, in, kh, kw)
    p = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _conv1x1_as_dense(sd: SD, prefix: str) -> Params:
    w = sd[f"{prefix}.weight"]
    if w.ndim == 4:  # (out, in, 1, 1)
        w = w[:, :, 0, 0]
    p = {"kernel": np.ascontiguousarray(w.T)}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _norm(sd: SD, prefix: str) -> Params:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _layernorm(sd: SD, prefix: str) -> Params:
    # our LayerNorm wraps flax LayerNorm under the child name "ln"
    return {"ln": _norm(sd, prefix)}


def _attention(sd: SD, prefix: str, out_name: str = "to_out.0") -> Params:
    """Reference/diffusers CrossAttention -> rcdms Attention."""
    return {
        "to_q": _linear(sd, f"{prefix}.to_q"),
        "to_k": _linear(sd, f"{prefix}.to_k"),
        "to_v": _linear(sd, f"{prefix}.to_v"),
        "to_out": _linear(sd, f"{prefix}.{out_name}"),
    }


def _feedforward(sd: SD, prefix: str) -> Params:
    """diffusers FeedForward (geglu or gelu): net.0.proj -> proj_in,
    net.2 -> proj_out."""
    return {
        "proj_in": _linear(sd, f"{prefix}.net.0.proj"),
        "proj_out": _linear(sd, f"{prefix}.net.2"),
    }


def _basic_block(sd: SD, prefix: str, cross: bool) -> Params:
    p = {
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "attn1": _attention(sd, f"{prefix}.attn1"),
        "norm3": _layernorm(sd, f"{prefix}.norm3"),
        "ff": _feedforward(sd, f"{prefix}.ff"),
    }
    if cross:
        p["norm2"] = _layernorm(sd, f"{prefix}.norm2")
        p["attn2"] = _attention(sd, f"{prefix}.attn2")
    return p


def _resnet(sd: SD, prefix: str, temb: bool = True) -> Params:
    p = {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "conv1": {"conv": _conv(sd, f"{prefix}.conv1")},
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "conv2": {"conv": _conv(sd, f"{prefix}.conv2")},
    }
    if temb and f"{prefix}.time_emb_proj.weight" in sd:
        p["time_emb_proj"] = _linear(sd, f"{prefix}.time_emb_proj")
    if f"{prefix}.conv_shortcut.weight" in sd:
        p["conv_shortcut"] = {"conv": _conv(sd, f"{prefix}.conv_shortcut")}
    return p


def _vae_resnet(sd: SD, prefix: str) -> Params:
    p = {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
    }
    for name in ("conv_shortcut", "nin_shortcut"):
        if f"{prefix}.{name}.weight" in sd:
            p["conv_shortcut"] = _conv1x1_as_dense(sd, f"{prefix}.{name}")
            p["conv_shortcut"]["kernel"] = p["conv_shortcut"]["kernel"][None, None]
    return p


def _spatial_transformer(sd: SD, prefix: str, num_layers: int = 1) -> Params:
    p = {
        "norm": _norm(sd, f"{prefix}.norm"),
        "proj_in": _conv1x1_as_dense(sd, f"{prefix}.proj_in"),
        "proj_out": _conv1x1_as_dense(sd, f"{prefix}.proj_out"),
    }
    for i in range(num_layers):
        p[f"block_{i}"] = _basic_block(
            sd, f"{prefix}.transformer_blocks.{i}", cross=True)
    return p


def _time_embedding(sd: SD, prefix: str) -> Params:
    return {"linear_1": _linear(sd, f"{prefix}.linear_1"),
            "linear_2": _linear(sd, f"{prefix}.linear_2")}


# ---------------------------------------------------------------------------
# SD1.5 UNet -> StoryUNet
# ---------------------------------------------------------------------------


def convert_sd_unet(sd: SD, cfg: StoryUNetConfig) -> Params:
    """diffusers UNet2DConditionModel (SD1.5) -> partial StoryUNet params.
    Omits: conv_in (9-channel, trained fresh — reference drops it,
    `unet.py:499`) and all temporal modules (fresh zero-init). Merge over a
    fresh `init()` tree with `merge_params`."""
    p: Params = {"time_embedding": _time_embedding(sd, "time_embedding")}
    n_levels = len(cfg.block_channels)

    for level in range(n_levels):
        cross = cfg.cross_attn_levels[level]
        for j in range(cfg.layers_per_block):
            blk: Params = {"resnet": _resnet(
                sd, f"down_blocks.{level}.resnets.{j}")}
            if cross:
                blk["attn"] = _spatial_transformer(
                    sd, f"down_blocks.{level}.attentions.{j}")
            p[f"down_{level}_{j}"] = blk
        if level != n_levels - 1:
            p[f"down_{level}_downsample"] = {"conv": {"conv": _conv(
                sd, f"down_blocks.{level}.downsamplers.0.conv")}}

    p["mid_resnet_0"] = _resnet(sd, "mid_block.resnets.0")
    p["mid_attn"] = _spatial_transformer(sd, "mid_block.attentions.0")
    p["mid_resnet_1"] = _resnet(sd, "mid_block.resnets.1")

    for level in range(n_levels):
        cross = list(reversed(cfg.cross_attn_levels))[level]
        for j in range(cfg.layers_per_block + 1):
            blk = {"resnet": _resnet(sd, f"up_blocks.{level}.resnets.{j}")}
            if cross:
                blk["attn"] = _spatial_transformer(
                    sd, f"up_blocks.{level}.attentions.{j}")
            p[f"up_{level}_{j}"] = blk
        if level != n_levels - 1:
            p[f"up_{level}_upsample"] = {"conv": {"conv": _conv(
                sd, f"up_blocks.{level}.upsamplers.0.conv")}}

    p["conv_norm_out"] = _norm(sd, "conv_norm_out")
    p["conv_out"] = {"conv": _conv(sd, "conv_out")}
    return p


# ---------------------------------------------------------------------------
# Kandinsky-2.2 prior -> FramePrior
# ---------------------------------------------------------------------------


def convert_kandinsky_prior(sd: SD, cfg: PriorConfig) -> Params:
    """diffusers PriorTransformer (Kandinsky 2.2) -> partial FramePrior
    params. Omits: positional_embedding (97-token table trained fresh —
    reference drops it, `myprior_transformer.py:440`), embedding_proj1/2
    (new conditioning heads) and temporal modules (all fresh).

    NOTE an intentional improvement over the reference: its interleaved
    ModuleList + strict=False load accidentally initializes only blocks 0-9
    from Kandinsky's even-indexed blocks and leaves blocks 10-19 random
    (ckpt `transformer_blocks.{odd}` keys collide with motion-module slots
    and are dropped). We map all 20 pretrained blocks in order."""
    p: Params = {
        "time_embedding": _time_embedding(sd, "time_embedding"),
        "proj_in": _linear(sd, "proj_in"),
        "embedding_proj": _linear(sd, "embedding_proj"),
        "encoder_hidden_states_proj": _linear(sd, "encoder_hidden_states_proj"),
        "norm_out": _layernorm(sd, "norm_out"),
        "proj_to_clip_embeddings": _linear(sd, "proj_to_clip_embeddings"),
    }
    for i in range(cfg.num_layers):
        p[f"block_{i}"] = _basic_block(
            sd, f"transformer_blocks.{i}", cross=False)
    return p


def convert_prior_prd(sd: SD) -> Optional[np.ndarray]:
    """prd token (1,1,inner) -> (1,1,1,inner)."""
    if "prd_embedding" in sd:
        return sd["prd_embedding"][None]
    return None


# ---------------------------------------------------------------------------
# SD VAE -> VAE
# ---------------------------------------------------------------------------


def _vae_attn(sd: SD, prefix: str) -> Params:
    names = {"to_q": "to_q", "to_k": "to_k", "to_v": "to_v"}
    if f"{prefix}.query.weight" in sd:  # old diffusers naming
        names = {"to_q": "query", "to_k": "key", "to_v": "value"}
        out = "proj_attn"
        gn = "group_norm"
    else:
        out = "to_out.0"
        gn = "group_norm"
    p = {"norm": _norm(sd, f"{prefix}.{gn}")}
    for ours, theirs in names.items():
        p[ours] = _conv1x1_as_dense(sd, f"{prefix}.{theirs}")
    p["to_out"] = _conv1x1_as_dense(sd, f"{prefix}.{out}")
    return p


def convert_sd_vae(sd: SD, cfg: VAEConfig) -> Params:
    n = len(cfg.block_channels)
    enc: Params = {"conv_in": _conv(sd, "encoder.conv_in")}
    for level in range(n):
        for j in range(cfg.layers_per_block):
            enc[f"down_{level}_{j}"] = _vae_resnet(
                sd, f"encoder.down_blocks.{level}.resnets.{j}")
        if level != n - 1:
            enc[f"down_{level}_downsample"] = _conv(
                sd, f"encoder.down_blocks.{level}.downsamplers.0.conv")
    enc["mid_block_0"] = _vae_resnet(sd, "encoder.mid_block.resnets.0")
    enc["mid_attn"] = _vae_attn(sd, "encoder.mid_block.attentions.0")
    enc["mid_block_1"] = _vae_resnet(sd, "encoder.mid_block.resnets.1")
    enc["conv_norm_out"] = _norm(sd, "encoder.conv_norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")
    enc["quant_conv"] = _conv(sd, "quant_conv")

    dec: Params = {"post_quant_conv": _conv(sd, "post_quant_conv"),
                   "conv_in": _conv(sd, "decoder.conv_in")}
    dec["mid_block_0"] = _vae_resnet(sd, "decoder.mid_block.resnets.0")
    dec["mid_attn"] = _vae_attn(sd, "decoder.mid_block.attentions.0")
    dec["mid_block_1"] = _vae_resnet(sd, "decoder.mid_block.resnets.1")
    for level in range(n):
        for j in range(cfg.layers_per_block + 1):
            dec[f"up_{level}_{j}"] = _vae_resnet(
                sd, f"decoder.up_blocks.{level}.resnets.{j}")
        if level != n - 1:
            dec[f"up_{level}_upsample"] = _conv(
                sd, f"decoder.up_blocks.{level}.upsamplers.0.conv")
    dec["conv_norm_out"] = _norm(sd, "decoder.conv_norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")
    return {"encoder": enc, "decoder": dec}


# ---------------------------------------------------------------------------
# CLIP towers (HF transformers naming)
# ---------------------------------------------------------------------------


def resize_text_embeddings(token_table: np.ndarray, pos_table: np.ndarray,
                           vocab_size: int, max_positions: int,
                           rng: Optional[np.random.RandomState] = None
                           ) -> tuple:
    """HF `resize_token_embeddings` + position-resize semantics
    (`train_stage1.py:130-137`): new vocab rows ~ N(mean, cov-diagonal) of
    old rows (we use N(mean, std)); new position rows appended the same way;
    shrinking truncates."""
    rng = rng or np.random.RandomState(0)

    def grow(table, n):
        if n <= len(table):
            return table[:n].copy()
        mean = table.mean(axis=0)
        std = table.std(axis=0)
        extra = rng.normal(size=(n - len(table), table.shape[1])) * std + mean
        return np.concatenate([table, extra.astype(table.dtype)], axis=0)

    return grow(token_table, vocab_size), grow(pos_table, max_positions)


def convert_clip_text(sd: SD, cfg: CLIPTextConfig,
                      resize: bool = True) -> Params:
    pre = "text_model." if any(k.startswith("text_model.") for k in sd) else ""
    tok = sd[f"{pre}embeddings.token_embedding.weight"]
    pos = sd[f"{pre}embeddings.position_embedding.weight"]
    if resize:
        tok, pos = resize_text_embeddings(tok, pos, cfg.vocab_size,
                                          cfg.max_positions)
    p: Params = {
        "token_embedding": {"embedding": tok},
        "position_embedding": pos,
        "final_layer_norm": _norm(sd, f"{pre}final_layer_norm"),
    }
    if "text_projection.weight" in sd:
        p["text_projection"] = _linear(sd, "text_projection", bias=False)
    for i in range(cfg.num_layers):
        lp = f"{pre}encoder.layers.{i}"
        p[f"layer_{i}"] = {
            "layer_norm1": _norm(sd, f"{lp}.layer_norm1"),
            "layer_norm2": _norm(sd, f"{lp}.layer_norm2"),
            "q_proj": _linear(sd, f"{lp}.self_attn.q_proj"),
            "k_proj": _linear(sd, f"{lp}.self_attn.k_proj"),
            "v_proj": _linear(sd, f"{lp}.self_attn.v_proj"),
            "out_proj": _linear(sd, f"{lp}.self_attn.out_proj"),
            "fc1": _linear(sd, f"{lp}.mlp.fc1"),
            "fc2": _linear(sd, f"{lp}.mlp.fc2"),
        }
    return p


def convert_clip_vision(sd: SD, cfg: CLIPVisionConfig) -> Params:
    pre = ("vision_model."
           if any(k.startswith("vision_model.") for k in sd) else "")
    patch = sd[f"{pre}embeddings.patch_embedding.weight"]  # (w,3,ps,ps)
    p: Params = {
        "patch_embedding": {
            "kernel": np.ascontiguousarray(patch.transpose(2, 3, 1, 0))},
        "class_embedding": sd[f"{pre}embeddings.class_embedding"].reshape(-1),
        "position_embedding": sd[f"{pre}embeddings.position_embedding.weight"],
        "pre_layernorm": _norm(
            sd, f"{pre}pre_layrnorm"  # HF's historical typo
            if f"{pre}pre_layrnorm.weight" in sd else f"{pre}pre_layernorm"),
        "post_layernorm": _norm(sd, f"{pre}post_layernorm"),
    }
    if "visual_projection.weight" in sd:
        p["visual_projection"] = _linear(sd, "visual_projection", bias=False)
    for i in range(cfg.num_layers):
        lp = f"{pre}encoder.layers.{i}"
        p[f"layer_{i}"] = {
            "layer_norm1": _norm(sd, f"{lp}.layer_norm1"),
            "layer_norm2": _norm(sd, f"{lp}.layer_norm2"),
            "q_proj": _linear(sd, f"{lp}.self_attn.q_proj"),
            "k_proj": _linear(sd, f"{lp}.self_attn.k_proj"),
            "v_proj": _linear(sd, f"{lp}.self_attn.v_proj"),
            "out_proj": _linear(sd, f"{lp}.self_attn.out_proj"),
            "fc1": _linear(sd, f"{lp}.mlp.fc1"),
            "fc2": _linear(sd, f"{lp}.mlp.fc2"),
        }
    return p


# ---------------------------------------------------------------------------
# Fusion stacks (torch nn.MultiheadAttention packing)
# ---------------------------------------------------------------------------


def convert_fusion_stack(sd: SD, prefix: str = "") -> Params:
    """fine_stack/semantic_stack: text_fc/vis_fc Linears + torch
    nn.MultiheadAttention (packed in_proj_weight -> q/k/v)."""
    w = sd[f"{prefix}multihead_attn.in_proj_weight"]
    b = sd[f"{prefix}multihead_attn.in_proj_bias"]
    e = w.shape[1]
    qw, kw, vw = w[:e], w[e:2 * e], w[2 * e:]
    qb, kb, vb = b[:e], b[e:2 * e], b[2 * e:]
    return {
        "text_fc": _linear(sd, f"{prefix}text_fc"),
        "vis_fc": _linear(sd, f"{prefix}vis_fc"),
        "attn": {
            "to_q": {"kernel": np.ascontiguousarray(qw.T), "bias": qb},
            "to_k": {"kernel": np.ascontiguousarray(kw.T), "bias": kb},
            "to_v": {"kernel": np.ascontiguousarray(vw.T), "bias": vb},
            "to_out": _linear(sd, f"{prefix}multihead_attn.out_proj"),
        },
    }


# ---------------------------------------------------------------------------
# Trained RCDMs (reference) checkpoint import
# ---------------------------------------------------------------------------


def split_deepspeed_blob(module_sd: SD) -> Dict[str, Dict[str, np.ndarray]]:
    """Split the reference's DeepSpeed `mp_rank_00_model_states.pt`
    `['module']` dict by prefix — seen_module./unseen_module./unet. —
    exactly as `stage2_batchtest_rcdms_model.py:225-243` does. Also strips a
    leading 'module.' if present (stage-1 resume path,
    `train_stage1.py:57-74`)."""
    out: Dict[str, Dict[str, np.ndarray]] = {
        "seen": {}, "unseen": {}, "unet": {}, "rest": {}}
    for k, v in module_sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.startswith("seen_module."):
            out["seen"][k[len("seen_module."):]] = v
        elif k.startswith("unseen_module."):
            out["unseen"][k[len("unseen_module."):]] = v
        elif k.startswith("unet."):
            out["unet"][k[len("unet."):]] = v
        else:
            out["rest"][k] = v
    return out


def _temporal_module(sd: SD, prefix: str, num_blocks: int = 1,
                     attn_layers: int = 2, prior_mode: bool = False) -> Params:
    """Reference VanillaTemporalModule -> rcdms TemporalModule params."""
    tt = f"{prefix}.temporal_transformer"
    p: Params = {
        "proj_in": _linear(sd, f"{tt}.proj_in"),
        "proj_out": _linear(sd, f"{tt}.proj_out"),
    }
    if prior_mode:
        p["prior_norm"] = _layernorm(sd, f"{tt}.prior_norm")
    else:
        p["norm"] = _norm(sd, f"{tt}.norm")
    for k in range(num_blocks):
        bp = f"{tt}.transformer_blocks.{k}"
        blk: Params = {
            "ff_norm": _layernorm(sd, f"{bp}.ff_norm"),
            "ff": _feedforward(sd, f"{bp}.ff"),
        }
        for l in range(attn_layers):
            blk[f"norm_{l}"] = _layernorm(sd, f"{bp}.norms.{l}")
            blk[f"attn_{l}"] = _attention(sd, f"{bp}.attention_blocks.{l}")
        p[f"block_{k}"] = blk
    return p


def convert_rcdms_unet3d(sd: SD, cfg: StoryUNetConfig) -> Params:
    """TRAINED reference UNet3D (incl. 9-ch conv_in + motion modules) ->
    full StoryUNet params."""
    p = convert_sd_unet(sd, cfg)
    p["conv_in"] = {"conv": _conv(sd, "conv_in")}
    nb = cfg.temporal.num_blocks
    al = cfg.temporal.attn_layers_per_block
    n_levels = len(cfg.block_channels)
    if cfg.use_temporal:
        for level in range(n_levels):
            for j in range(cfg.layers_per_block):
                key = f"down_blocks.{level}.motion_modules.{j}"
                if f"{key}.temporal_transformer.proj_in.weight" in sd:
                    p[f"down_{level}_{j}"]["temporal"] = _temporal_module(
                        sd, key, nb, al)
            for j in range(cfg.layers_per_block + 1):
                key = f"up_blocks.{level}.motion_modules.{j}"
                if f"{key}.temporal_transformer.proj_in.weight" in sd:
                    p[f"up_{level}_{j}"]["temporal"] = _temporal_module(
                        sd, key, nb, al)
    return p


def convert_rcdms_prior(sd: SD, cfg: PriorConfig) -> Params:
    """TRAINED reference MyPriorTransformer -> full FramePrior params.
    The reference interleaves blocks and motion modules in ONE ModuleList
    (`myprior_transformer.py:150-172`): transformer_blocks.{2i} is the i-th
    attention block, transformer_blocks.{2i+1} the i-th temporal module."""
    p: Params = {
        "time_embedding": _time_embedding(sd, "time_embedding"),
        "proj_in": _linear(sd, "proj_in"),
        "embedding_proj": _linear(sd, "embedding_proj"),
        "embedding_proj1": _linear(sd, "embedding_proj1"),
        "embedding_proj2": _linear(sd, "embedding_proj2"),
        "encoder_hidden_states_proj": _linear(sd, "encoder_hidden_states_proj"),
        "norm_out": _layernorm(sd, "norm_out"),
        "proj_to_clip_embeddings": _linear(sd, "proj_to_clip_embeddings"),
        "positional_embedding": sd["positional_embedding"][None],
    }
    prd = convert_prior_prd(sd)
    if prd is not None:
        p["prd_embedding"] = prd
    nb = cfg.temporal.num_blocks
    al = cfg.temporal.attn_layers_per_block
    for i in range(cfg.num_layers):
        p[f"block_{i}"] = _basic_block(sd, f"transformer_blocks.{2 * i}",
                                       cross=False)
        if cfg.use_temporal:
            p[f"temporal_{i}"] = _temporal_module(
                sd, f"transformer_blocks.{2 * i + 1}", nb, al,
                prior_mode=True)
    return p


# ---------------------------------------------------------------------------
# Merge helpers
# ---------------------------------------------------------------------------


def merge_params(fresh: Params, converted: Params, path: str = "") -> Params:
    """Overlay converted leaves onto a fresh init tree, checking shapes.
    Leaves present in `fresh` but not `converted` keep their fresh init
    (temporal modules, conv_in, positional_embedding...)."""
    out = dict(fresh)
    for k, v in converted.items():
        here = f"{path}/{k}"
        if k not in fresh:
            raise KeyError(f"converted param {here} not in model tree "
                           f"(model keys: {sorted(fresh)[:8]}...)")
        if isinstance(v, Mapping):
            out[k] = merge_params(fresh[k], v, here)
        else:
            fs = np.shape(fresh[k])
            vs = np.shape(v)
            if fs != vs:
                raise ValueError(f"shape mismatch at {here}: model {fs} "
                                 f"vs checkpoint {vs}")
            out[k] = np.asarray(v, dtype=np.float32)
    return out


def count_fresh_leaves(fresh: Params, converted: Params) -> int:
    """Number of leaves left at fresh init (sanity print, mirroring the
    reference's missing-keys report)."""
    import jax
    fresh_leaves = {jax.tree_util.keystr(kp)
                    for kp, _ in jax.tree_util.tree_leaves_with_path(fresh)}
    conv_leaves = {jax.tree_util.keystr(kp)
                   for kp, _ in jax.tree_util.tree_leaves_with_path(converted)}
    return len(fresh_leaves - conv_leaves)
