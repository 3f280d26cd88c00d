"""Reference trained-checkpoint ingestion: synthetic full-key DeepSpeed
blobs -> `--rcdms-stage{1,2}-ckpt` loaders -> full param round-trip.

Builds torch-style state dicts with exactly the reference module's key
names/layouts (`myprior_transformer.py`, `unet.py` + motion modules,
`train_stage2.py:138-172` fusion stacks), saves them as a DeepSpeed
`mp_rank_00_model_states.pt` blob, and asserts the CLI loaders reproduce
every leaf bit-exactly with zero fresh-init leaves and zero unused keys."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcdms_tpu.cli import common
from rcdms_tpu.configs import FusionConfig, PriorConfig, StoryUNetConfig

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # compile-heavy; excluded from -m 'not slow'


# ---------------------------------------------------------------------------
# Inverse converters: our param tree -> reference torch state-dict keys.
# These mirror io/convert.py's mapping rules in the opposite direction;
# combined with the loaders they make the mapping a verified bijection.
# ---------------------------------------------------------------------------


def inv_linear(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.asarray(p["kernel"]).T
    if "bias" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def inv_conv(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def inv_conv1x1(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.asarray(p["kernel"]).T[:, :, None, None]
    if "bias" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def inv_norm(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.asarray(p["scale"])
    sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def inv_ln(sd, prefix, p):
    inv_norm(sd, prefix, p["ln"])


def inv_attn(sd, prefix, p, out_name="to_out.0"):
    inv_linear(sd, f"{prefix}.to_q", p["to_q"])
    inv_linear(sd, f"{prefix}.to_k", p["to_k"])
    inv_linear(sd, f"{prefix}.to_v", p["to_v"])
    inv_linear(sd, f"{prefix}.{out_name}", p["to_out"])


def inv_ff(sd, prefix, p):
    inv_linear(sd, f"{prefix}.net.0.proj", p["proj_in"])
    inv_linear(sd, f"{prefix}.net.2", p["proj_out"])


def inv_basic_block(sd, prefix, p):
    inv_ln(sd, f"{prefix}.norm1", p["norm1"])
    inv_attn(sd, f"{prefix}.attn1", p["attn1"])
    if "attn2" in p:
        inv_ln(sd, f"{prefix}.norm2", p["norm2"])
        inv_attn(sd, f"{prefix}.attn2", p["attn2"])
    inv_ln(sd, f"{prefix}.norm3", p["norm3"])
    inv_ff(sd, f"{prefix}.ff", p["ff"])


def inv_temporal(sd, prefix, p, prior_mode):
    tt = f"{prefix}.temporal_transformer"
    inv_linear(sd, f"{tt}.proj_in", p["proj_in"])
    inv_linear(sd, f"{tt}.proj_out", p["proj_out"])
    if prior_mode:
        inv_ln(sd, f"{tt}.prior_norm", p["prior_norm"])
    else:
        inv_norm(sd, f"{tt}.norm", p["norm"])
    k = 0
    while f"block_{k}" in p:
        blk = p[f"block_{k}"]
        bp = f"{tt}.transformer_blocks.{k}"
        inv_ln(sd, f"{bp}.ff_norm", blk["ff_norm"])
        inv_ff(sd, f"{bp}.ff", blk["ff"])
        l = 0
        while f"attn_{l}" in blk:
            inv_ln(sd, f"{bp}.norms.{l}", blk[f"norm_{l}"])
            inv_attn(sd, f"{bp}.attention_blocks.{l}", blk[f"attn_{l}"])
            l += 1
        k += 1


def inv_resnet(sd, prefix, p):
    inv_norm(sd, f"{prefix}.norm1", p["norm1"])
    inv_conv(sd, f"{prefix}.conv1", p["conv1"]["conv"])
    inv_norm(sd, f"{prefix}.norm2", p["norm2"])
    inv_conv(sd, f"{prefix}.conv2", p["conv2"]["conv"])
    if "time_emb_proj" in p:
        inv_linear(sd, f"{prefix}.time_emb_proj", p["time_emb_proj"])
    if "conv_shortcut" in p:
        inv_conv(sd, f"{prefix}.conv_shortcut", p["conv_shortcut"]["conv"])


def inv_spatial_transformer(sd, prefix, p):
    inv_norm(sd, f"{prefix}.norm", p["norm"])
    inv_conv1x1(sd, f"{prefix}.proj_in", p["proj_in"])
    inv_conv1x1(sd, f"{prefix}.proj_out", p["proj_out"])
    i = 0
    while f"block_{i}" in p:
        inv_basic_block(sd, f"{prefix}.transformer_blocks.{i}",
                        p[f"block_{i}"])
        i += 1


def inv_time_embedding(sd, prefix, p):
    inv_linear(sd, f"{prefix}.linear_1", p["linear_1"])
    inv_linear(sd, f"{prefix}.linear_2", p["linear_2"])


def prior_state_dict(P):
    """Our FramePrior params -> reference MyPriorTransformer state dict
    (interleaved transformer_blocks: even=attention, odd=motion)."""
    sd = {}
    inv_time_embedding(sd, "time_embedding", P["time_embedding"])
    for name in ("proj_in", "embedding_proj", "embedding_proj1",
                 "embedding_proj2", "encoder_hidden_states_proj",
                 "proj_to_clip_embeddings"):
        inv_linear(sd, name, P[name])
    inv_ln(sd, "norm_out", P["norm_out"])
    sd["positional_embedding"] = np.asarray(P["positional_embedding"])[0]
    sd["prd_embedding"] = np.asarray(P["prd_embedding"])[0]
    i = 0
    while f"block_{i}" in P:
        inv_basic_block(sd, f"transformer_blocks.{2 * i}", P[f"block_{i}"])
        if f"temporal_{i}" in P:
            inv_temporal(sd, f"transformer_blocks.{2 * i + 1}",
                         P[f"temporal_{i}"], prior_mode=True)
        i += 1
    return sd


def unet_state_dict(P, cfg):
    """Our StoryUNet params -> trained reference UNet3D state dict
    (incl. 9-ch conv_in and motion_modules)."""
    sd = {}
    inv_conv(sd, "conv_in", P["conv_in"]["conv"])
    inv_time_embedding(sd, "time_embedding", P["time_embedding"])
    n = len(cfg.block_channels)
    for level in range(n):
        for j in range(cfg.layers_per_block):
            blk = P[f"down_{level}_{j}"]
            inv_resnet(sd, f"down_blocks.{level}.resnets.{j}", blk["resnet"])
            if "attn" in blk:
                inv_spatial_transformer(
                    sd, f"down_blocks.{level}.attentions.{j}", blk["attn"])
            if "temporal" in blk:
                inv_temporal(sd, f"down_blocks.{level}.motion_modules.{j}",
                             blk["temporal"], prior_mode=False)
        if level != n - 1:
            inv_conv(sd, f"down_blocks.{level}.downsamplers.0.conv",
                     P[f"down_{level}_downsample"]["conv"]["conv"])
    inv_resnet(sd, "mid_block.resnets.0", P["mid_resnet_0"])
    inv_spatial_transformer(sd, "mid_block.attentions.0", P["mid_attn"])
    inv_resnet(sd, "mid_block.resnets.1", P["mid_resnet_1"])
    for level in range(n):
        for j in range(cfg.layers_per_block + 1):
            blk = P[f"up_{level}_{j}"]
            inv_resnet(sd, f"up_blocks.{level}.resnets.{j}", blk["resnet"])
            if "attn" in blk:
                inv_spatial_transformer(
                    sd, f"up_blocks.{level}.attentions.{j}", blk["attn"])
            if "temporal" in blk:
                inv_temporal(sd, f"up_blocks.{level}.motion_modules.{j}",
                             blk["temporal"], prior_mode=False)
        if level != n - 1:
            inv_conv(sd, f"up_blocks.{level}.upsamplers.0.conv",
                     P[f"up_{level}_upsample"]["conv"]["conv"])
    inv_norm(sd, "conv_norm_out", P["conv_norm_out"])
    inv_conv(sd, "conv_out", P["conv_out"]["conv"])
    return sd


def fusion_stack_state_dict(P):
    """Our CrossFeatureStack params -> reference fine/semantic stack state
    dict (torch nn.MultiheadAttention packed in_proj)."""
    sd = {}
    inv_linear(sd, "text_fc", P["text_fc"])
    inv_linear(sd, "vis_fc", P["vis_fc"])
    a = P["attn"]
    sd["multihead_attn.in_proj_weight"] = np.concatenate(
        [np.asarray(a[k]["kernel"]).T for k in ("to_q", "to_k", "to_v")])
    sd["multihead_attn.in_proj_bias"] = np.concatenate(
        [np.asarray(a[k]["bias"]) for k in ("to_q", "to_k", "to_v")])
    inv_linear(sd, "multihead_attn.out_proj", a["to_out"])
    return sd


# ---------------------------------------------------------------------------


def _randomize(params, seed):
    rs = np.random.RandomState(seed)
    return jax.tree_util.tree_map(
        lambda x: np.asarray(rs.normal(size=np.shape(x)), np.float32), params)


def _assert_trees_equal(a, b):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(b))
    # identical structure
    assert {jax.tree_util.keystr(k) for k, _ in flat_a} == {
        jax.tree_util.keystr(k) for k in flat_b}
    for kp, va in flat_a:
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(flat_b[kp]),
            err_msg=jax.tree_util.keystr(kp))


def _leaf_count(tree):
    return len(jax.tree_util.tree_leaves(tree))


def test_rcdms_stage1_blob_roundtrip(tmp_path):
    cfg = PriorConfig.tiny()
    _, fresh = common.build_prior(cfg, None)
    rand = _randomize(fresh, 0)
    sd = prior_state_dict(rand["params"])
    # every state-dict entry must land on exactly one model leaf
    assert len(sd) == _leaf_count(fresh["params"])
    blob = {"module": {f"module.{k}": torch.from_numpy(np.ascontiguousarray(v))
                       for k, v in sd.items()},
            "epoch": 3, "last_global_step": 1234}
    path = os.path.join(tmp_path, "mp_rank_00_model_states.pt")
    torch.save(blob, path)

    loaded = common.load_rcdms_stage1(path, cfg, fresh)
    _assert_trees_equal(loaded["params"], rand["params"])


def test_rcdms_stage2_blob_roundtrip(tmp_path):
    ucfg = StoryUNetConfig.tiny()
    fcfg = FusionConfig.tiny(hidden_dim=ucfg.cross_attention_dim,
                             text_dim=ucfg.cross_attention_dim)
    _, ufresh = common.build_unet(ucfg, None)
    _, ffresh = common.build_fusion(fcfg)
    urand = _randomize(ufresh, 1)
    frand = _randomize(ffresh, 2)

    sd = {}
    for k, v in unet_state_dict(urand["params"], ucfg).items():
        sd[f"unet.{k}"] = v
    for k, v in fusion_stack_state_dict(
            frand["params"]["seen_module"]).items():
        sd[f"seen_module.{k}"] = v
    for k, v in fusion_stack_state_dict(
            frand["params"]["unseen_module"]).items():
        sd[f"unseen_module.{k}"] = v
    # packed MHA in_proj covers 3 leaves per entry -> counts still match
    assert len(sd) == (_leaf_count(ufresh["params"])
                       + _leaf_count(ffresh["params"]) - 2 * 4)
    blob = {"module": {k: torch.from_numpy(np.ascontiguousarray(v))
                       for k, v in sd.items()}}
    # exercise the directory-walk path too
    ckpt_dir = tmp_path / "checkpoint-1000"
    ckpt_dir.mkdir()
    torch.save(blob, str(ckpt_dir / "mp_rank_00_model_states.pt"))

    uloaded, floaded = common.load_rcdms_stage2(str(tmp_path), ucfg,
                                                ufresh, ffresh)
    _assert_trees_equal(uloaded["params"], urand["params"])
    _assert_trees_equal(floaded["params"], frand["params"])


def test_rcdms_stage1_loader_rejects_partial_blob(tmp_path):
    cfg = PriorConfig.tiny()
    _, fresh = common.build_prior(cfg, None)
    sd = prior_state_dict(_randomize(fresh, 3)["params"])
    sd.pop("prd_embedding")  # a truncated/mis-keyed blob
    blob = {"module": {k: torch.from_numpy(np.ascontiguousarray(v))
                       for k, v in sd.items()}}
    path = os.path.join(tmp_path, "mp_rank_00_model_states.pt")
    torch.save(blob, path)
    with pytest.raises(ValueError, match="fresh"):
        common.load_rcdms_stage1(path, cfg, fresh)
