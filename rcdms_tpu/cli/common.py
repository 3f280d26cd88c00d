"""Shared CLI plumbing: model construction, pretrained-weight loading via
the torch->jax converters, and frozen-encoder param trees.

Replaces the reference's scattered `from_pretrained` calls + hardcoded paths
(`train_stage2.py:242-248`, `:311`) with one explicit loader that works in
three modes:
  * --pretrained-dir <hf layout>   load + convert torch weights
  * (absent)                       random init (smoke/bench mode)
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rcdms_tpu.configs import (
    CLIPTextConfig,
    CLIPVisionConfig,
    DatasetConfig,
    FusionConfig,
    PriorConfig,
    StoryUNetConfig,
    VAEConfig,
)
from rcdms_tpu.io import convert as C
from rcdms_tpu.models.clip import CLIPTextEncoder, CLIPVisionEncoder
from rcdms_tpu.models.fusion import FusionModule
from rcdms_tpu.models.prior import FramePrior
from rcdms_tpu.models.unet3d import StoryUNet
from rcdms_tpu.models.vae import VAE

logger = logging.getLogger("rcdms_tpu.cli")


def enable_persistent_compile_cache(path: Optional[str] = None) -> str:
    """Point XLA's persistent compile cache at a durable directory
    (RCDMS_COMPILE_CACHE > arg > ~/.cache/jax) so a process restart pays a
    cache HIT instead of the full XLA optimization pass — measured on the
    default stage-2 program: ~167 s cold vs ~24 s warm (BASELINE.md round
    5). Called by every long-lived CLI (serve/evaluate/generate/train);
    `serve --precompile` warms it ahead of traffic. No reference
    counterpart (torch recompiles per process by design)."""
    path = os.environ.get("RCDMS_COMPILE_CACHE") or path or \
        os.path.expanduser("~/.cache/jax")
    if jax.config.jax_compilation_cache_dir != path:
        jax.config.update("jax_compilation_cache_dir", path)
        # jax initializes its persistent-cache singleton lazily at the
        # first compile and ignores later dir changes — reset it so a
        # redirect AFTER some compilation has happened (e.g. `serve
        # --precompile` into RCDMS_COMPILE_CACHE inside a process that
        # already jitted something) actually lands in the new directory
        try:
            from jax._src import compilation_cache as _cc

            _cc.reset_cache()
        except Exception:
            pass  # private API moved — worst case the old dir keeps working
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path


def _safetensors_sibling(path: str) -> str:
    """The .safetensors file that diffusers/transformers place next to a
    .bin: 'diffusion_pytorch_model.bin' -> 'diffusion_pytorch_model
    .safetensors' (a plain suffix swap; the old 'pytorch_model.bin' ->
    'model.safetensors' replace mangled diffusers names into nonexistent
    files, skipping the safetensors fast path)."""
    base = os.path.basename(path)
    if base == "pytorch_model.bin":  # transformers layout
        return os.path.join(os.path.dirname(path), "model.safetensors")
    return path[: -len(".bin")] + ".safetensors" if path.endswith(".bin") \
        else path


def _load_torch_bin(path: str) -> dict:
    """Load a diffusers/transformers torch weight file (.bin/.safetensors)."""
    if path.endswith(".safetensors") or os.path.exists(
            _safetensors_sibling(path)):
        try:
            from safetensors.numpy import load_file

            p = (path if path.endswith(".safetensors")
                 else _safetensors_sibling(path))
            if os.path.exists(p):
                return dict(load_file(p))
        except ImportError:
            pass
    import torch

    return C.to_numpy_state_dict(torch.load(path, map_location="cpu",
                                            weights_only=True))


def _find_weights(subdir: str) -> Optional[str]:
    for name in ("diffusion_pytorch_model.bin", "pytorch_model.bin",
                 "diffusion_pytorch_model.safetensors", "model.safetensors"):
        p = os.path.join(subdir, name)
        if os.path.exists(p):
            return p
    return None


_LAZY_ZERO_INIT = False


def set_lazy_zero_init(value: bool) -> None:
    """When on, random-init models are built via eval_shape + zeros in the
    compute dtype — no fp32 params ever touch the device. Used by benches
    (zeros give identical compute cost to trained weights); training CLIs
    keep real initializers."""
    global _LAZY_ZERO_INIT
    _LAZY_ZERO_INIT = value


def _init(model, key, *args, dtype=jnp.float32):
    if _LAZY_ZERO_INIT:
        shapes = jax.eval_shape(lambda k: model.init(k, *args), key)
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, dtype if s.dtype == jnp.float32
                                else s.dtype), shapes)
    return model.init(key, *args)


def _merge_into_init(model, init_args, converted, key=None):
    # key default must NOT be a PRNGKey at module scope: evaluating it at
    # import time initializes the XLA backend and breaks a later
    # jax.distributed.initialize() in multi-host launches
    key = jax.random.PRNGKey(0) if key is None else key
    fresh = model.init(key, *init_args)
    n_fresh = C.count_fresh_leaves(fresh["params"], converted)
    logger.info("%s: %d leaves stay fresh-init",
                type(model).__name__, n_fresh)
    return {"params": C.merge_params(fresh["params"], converted)}


def build_text_encoder(cfg: CLIPTextConfig, pretrained: Optional[str],
                       dtype=jnp.float32) -> Tuple[CLIPTextEncoder, dict]:
    model = CLIPTextEncoder(cfg, dtype=dtype)
    ids = jnp.zeros((1, cfg.max_positions), jnp.int32)
    if pretrained:
        sd = _load_torch_bin(_find_weights(pretrained))
        params = {"params": C.convert_clip_text(sd, cfg, resize=True)}
    else:
        params = _init(model, jax.random.PRNGKey(0), ids, dtype=dtype)
    return model, params


def build_vision_encoder(cfg: CLIPVisionConfig, pretrained: Optional[str],
                         dtype=jnp.float32) -> Tuple[CLIPVisionEncoder, dict]:
    model = CLIPVisionEncoder(cfg, dtype=dtype)
    px = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    if pretrained:
        sd = _load_torch_bin(_find_weights(pretrained))
        params = {"params": C.convert_clip_vision(sd, cfg)}
    else:
        params = _init(model, jax.random.PRNGKey(0), px, dtype=dtype)
    return model, params


def build_vae(cfg: VAEConfig, pretrained: Optional[str],
              dtype=jnp.float32) -> Tuple[VAE, dict]:
    model = VAE(cfg, dtype=dtype)
    factor = 2 ** (len(cfg.block_channels) - 1)
    x = jnp.zeros((1, 64, 64, 3))
    z = jnp.zeros((1, 64 // factor, 64 // factor, cfg.latent_channels))
    if pretrained:
        sd = _load_torch_bin(_find_weights(pretrained))
        params = {"params": C.convert_sd_vae(sd, cfg)}
    else:
        params = _init(model, jax.random.PRNGKey(0), x, z, dtype=dtype)
    return model, params


def build_prior(cfg: PriorConfig, pretrained: Optional[str],
                dtype=jnp.float32) -> Tuple[FramePrior, dict]:
    """pretrained = kandinsky prior dir; drops positional_embedding and
    initializes temporal + new conditioning heads fresh (the reference's
    `from_pretrained_2d` surgery)."""
    model = FramePrior(cfg, dtype=dtype)
    b, f, d, t = 1, cfg.num_frames, cfg.embedding_dim, cfg.num_text_tokens
    init_args = (jnp.zeros((b, f, d)), jnp.zeros((b, f), jnp.int32),
                 jnp.zeros((b, f, d)), jnp.zeros((b, f, t, d)),
                 jnp.zeros((b, f, d)), jnp.zeros((b, f, d)),
                 jnp.ones((b, f, t), bool))
    if not pretrained:
        return model, _init(model, jax.random.PRNGKey(0), *init_args,
                            dtype=dtype)
    sd = _load_torch_bin(_find_weights(pretrained))
    converted = C.convert_kandinsky_prior(sd, cfg)
    prd = C.convert_prior_prd(sd)
    if prd is not None:
        converted["prd_embedding"] = prd
    return model, _merge_into_init(model, init_args, converted)


def build_unet(cfg: StoryUNetConfig, pretrained: Optional[str],
               dtype=jnp.float32) -> Tuple[StoryUNet, dict]:
    """pretrained = SD1.5 unet dir; conv_in (9ch) + temporal stay fresh."""
    model = StoryUNet(cfg, dtype=dtype)
    b, f = 1, cfg.num_frames
    init_args = (jnp.zeros((b, f, 16, 16, cfg.in_channels)),
                 jnp.zeros((b,), jnp.int32),
                 jnp.zeros((b, f, 4, cfg.cross_attention_dim)))
    if not pretrained:
        return model, _init(model, jax.random.PRNGKey(0), *init_args,
                            dtype=dtype)
    sd = _load_torch_bin(_find_weights(pretrained))
    converted = C.convert_sd_unet(sd, cfg)
    return model, _merge_into_init(model, init_args, converted)


def build_fusion(cfg: FusionConfig, dtype=jnp.float32
                 ) -> Tuple[FusionModule, dict]:
    model = FusionModule(cfg, dtype=dtype)
    b, f, t = 1, 5, 4
    params = _init(
        model, jax.random.PRNGKey(0),
        jnp.zeros((b, f, 4, cfg.seen_vis_dim)),
        jnp.zeros((b, f, cfg.unseen_vis_dim)),
        jnp.zeros((b, f, t, cfg.text_dim)),
        jnp.zeros((b, f), bool))
    return model, params


def load_rcdms_blob(path: str) -> dict:
    """Load the reference's DeepSpeed `mp_rank_00_model_states.pt` (or a
    bare state-dict .pt) and return the prefix-split numpy dicts
    {seen, unseen, unet, rest} (`stage2_batchtest_rcdms_model.py:225-243`).
    Accepts a checkpoint directory too: DeepSpeed's `latest` tag is
    honored; otherwise exactly one *model_states.pt may exist (several
    step subdirectories without a tag are ambiguous and raise).

    Security note: checkpoints are pickle files. `--rcdms-*-ckpt` paths
    must be trusted — loading falls back to full (code-executing)
    unpickling when the weights-only load cannot parse the blob."""
    import torch

    if os.path.isdir(path):
        # DeepSpeed writes a `latest` tag file naming the current step dir
        # (save_checkpoint default); prefer it when present
        tag_file = os.path.join(path, "latest")
        if os.path.isfile(tag_file):
            with open(tag_file) as fh:
                tag = fh.read().strip()
            tagged = os.path.join(path, tag)
            if os.path.isdir(tagged):
                path = tagged
        candidates = []
        for root, dirs, files in os.walk(path):
            dirs.sort()
            for name in sorted(files):
                if name.endswith("model_states.pt"):
                    candidates.append(os.path.join(root, name))
        if not candidates:
            raise FileNotFoundError(f"no *model_states.pt under {path}")
        if len(candidates) > 1:
            raise ValueError(
                f"ambiguous checkpoint dir {path}: {len(candidates)} "
                f"*model_states.pt files ({candidates[:3]}...) and no "
                f"DeepSpeed 'latest' tag — pass the step directory "
                f"explicitly")
        path = candidates[0]
    try:
        blob = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        import warnings

        warnings.warn(
            f"weights-only load of {path} failed ({type(e).__name__}: {e});"
            " falling back to full unpickling — only do this with TRUSTED"
            " checkpoint files (arbitrary pickle code runs)")
        try:
            blob = torch.load(path, map_location="cpu", weights_only=False)
        except Exception as e2:
            raise RuntimeError(f"could not load checkpoint {path}") from e2
    if isinstance(blob, dict) and "module" in blob:
        blob = blob["module"]
    return C.split_deepspeed_blob(C.to_numpy_state_dict(blob))


def load_rcdms_stage1(path: str, prior_cfg: PriorConfig,
                      prior_params: dict) -> dict:
    """--rcdms-stage1-ckpt: trained reference MyPriorTransformer blob ->
    FramePrior params (stage-1 blobs carry no submodule prefix,
    `stage1_batchtest_rcdms_model.py:99-103`). Raises if any leaf would
    stay fresh — a trained checkpoint must cover the whole tree."""
    parts = load_rcdms_blob(path)
    converted = C.convert_rcdms_prior(parts["rest"], prior_cfg)
    n_fresh = C.count_fresh_leaves(prior_params["params"], converted)
    if n_fresh:
        raise ValueError(f"stage-1 checkpoint leaves {n_fresh} params "
                         f"fresh-init — wrong config or truncated blob?")
    return {"params": C.merge_params(prior_params["params"], converted)}


def load_rcdms_stage2(path: str, unet_cfg: StoryUNetConfig,
                      unet_params: dict, fusion_params: dict) -> tuple:
    """--rcdms-stage2-ckpt: trained reference SDModel blob (seen_module. /
    unseen_module. / unet. prefixes) -> (StoryUNet, FusionModule) params."""
    parts = load_rcdms_blob(path)
    unet_conv = C.convert_rcdms_unet3d(parts["unet"], unet_cfg)
    fusion_conv = {"seen_module": C.convert_fusion_stack(parts["seen"]),
                   "unseen_module": C.convert_fusion_stack(parts["unseen"])}
    for name, fresh, conv in (("unet", unet_params, unet_conv),
                              ("fusion", fusion_params, fusion_conv)):
        n_fresh = C.count_fresh_leaves(fresh["params"], conv)
        if n_fresh:
            raise ValueError(f"stage-2 checkpoint leaves {n_fresh} {name} "
                             f"params fresh-init — wrong config or "
                             f"truncated blob?")
    return ({"params": C.merge_params(unet_params["params"], unet_conv)},
            {"params": C.merge_params(fusion_params["params"], fusion_conv)})


def dataset_from_args(args) -> DatasetConfig:
    return DatasetConfig(name=args.dataset, h5_path=args.h5_path,
                         image_size=args.image_size,
                         sr_dir=getattr(args, "sr_dir", None))


def build_cond_cache(pipeline, params, dataset, ds_cfg,
                     negative_prompt: str = ""):
    """Precompute the story-independent conditioning once per loaded
    checkpoint (sample/pipeline.py::CondCache): the uncond caption through
    both text towers and the white/black mask images through the vision
    tower. One jitted tower pass; every subsequent `generate` call then
    encodes f captions/images per story instead of 2f."""
    utoks = dataset.tokenizer([negative_prompt])
    return cond_cache_from_row(pipeline, params, ds_cfg,
                               utoks["input_ids"][0])


def cond_cache_from_row(pipeline, params, ds_cfg, uncond_row):
    """build_cond_cache given an already-tokenized (T,) uncond row (the
    serve CLI memoizes per distinct negative-prompt row)."""
    import jax
    import jax.numpy as jnp

    from rcdms_tpu.data.protocol import (
        black_image,
        clip_preprocess,
        white_image,
    )

    size, csize = ds_cfg.image_size, ds_cfg.clip_size
    row = jnp.asarray(uncond_row)
    white_cl = jnp.asarray(clip_preprocess(white_image(size), csize))
    black_cl = jnp.asarray(clip_preprocess(black_image(size), csize))
    return jax.jit(pipeline.precompute_cond_cache)(
        params, row, row, white_cl, black_cl)


def build_story_inputs(captions, reference_images, negative_prompt,
                       dataset, ds_cfg):
    """Assemble a batch-1 StoryInputs from raw user inputs.

    captions: list of num_frames strings; reference_images: 0..num_frames
    HxWx3 uint8 arrays forming the known-frame prefix (the reference
    harness's 'visualization'/'continue' modes generalized to any prefix
    length — `stage1_batchtest_rcdms_model.py:164-180`). Shared by the
    generate and serve CLIs."""
    import jax.numpy as jnp
    import numpy as np

    from rcdms_tpu.data.protocol import (
        black_image,
        clip_preprocess,
        pixel_preprocess,
        white_image,
    )
    from rcdms_tpu.sample.pipeline import StoryInputs

    f = ds_cfg.num_frames
    if len(captions) != f:
        raise ValueError(f"need exactly {f} captions, got {len(captions)}")
    if len(reference_images) > f:
        raise ValueError(f"at most {f} reference frames, got "
                         f"{len(reference_images)}")
    size, csize = ds_cfg.image_size, ds_cfg.clip_size
    known = len(reference_images)

    black_px = pixel_preprocess(black_image(size), size)
    black_cl = clip_preprocess(black_image(size), csize)
    white_cl = clip_preprocess(white_image(size), csize)
    source_px = np.stack(
        [pixel_preprocess(reference_images[i], size) if i < known
         else black_px for i in range(f)])
    source_cl = np.stack(
        [clip_preprocess(reference_images[i], csize) if i < known
         else black_cl for i in range(f)])
    mask_cl = np.stack([white_cl if i < known else black_cl
                        for i in range(f)])

    toks = dataset.tokenizer([c.lower() for c in captions])
    utoks = dataset.tokenizer([negative_prompt] * f)
    return StoryInputs(
        tokens_s1=jnp.asarray(toks["input_ids"])[None],
        tokens_s1_u=jnp.asarray(utoks["input_ids"])[None],
        tokens_s2=jnp.asarray(toks["input_ids"])[None],
        tokens_s2_u=jnp.asarray(utoks["input_ids"])[None],
        source_clip=jnp.asarray(source_cl)[None],
        mask_clip=jnp.asarray(mask_cl)[None],
        source_pixels=jnp.asarray(source_px)[None],
        frame_known=jnp.asarray(np.arange(f) < known)[None],
    )
