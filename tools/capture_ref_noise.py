"""Capture the reference's noise + conditioning + outputs as the npz that
`tools/parity_check.py --noise-npz` consumes (VERDICT r4 #6: the capture is
a runnable script, not a docstring procedure).

Two modes:

  TORCH MODE (run inside the REFERENCE's own environment — torch +
  diffusers + the muzishen/RCDMs repo; NOT runnable on this box):

      python tools/capture_ref_noise.py \
          --reference-root /path/to/RCDMs \
          --pretrained-prior /path/to/kandinsky-2-2-prior \
          --pretrained-sd /path/to/stable-diffusion-v1-5 \
          --prior-ckpt logs/.../mp_rank_00_model_states.pt \
          --stage2-ckpt logs/.../mp_rank_00_model_states.pt \
          --images frame0.png ... frame4.png --captions "..." x5 \
          --out ref_noise.npz

  It replicates `stage1_batchtest_rcdms_model.py:70-261` ('continue' mode:
  frame 0 known) and `stage2_batchtest_rcdms_model.py:364-376` for ONE
  story at seed 42 / 20 steps / CFG 2.0, records every tensor the JAX gate
  needs (layouts converted to this repo's (b, f, ...) NHWC), and hooks
  `diffusers.utils.torch_utils.randn_tensor` at its two consumption sites
  (`prior_pipeline.py:116` prepare_latents; UnCLIPScheduler.step's
  variance draw) so the EXACT noise the reference consumed is captured.

  SELF-TEST MODE (JAX, CPU — the CI path; no torch needed):

      python tools/capture_ref_noise.py --self-test /tmp/selftest.npz

  Builds the same tiny pipeline `parity_check.py --synthetic` builds,
  assembles the conditioning through the pipeline's own encoders, runs
  both samplers with explicitly injected noise, and records the outputs
  as `reference_latents`/`reference_prior_embeds`. Feeding the result to
  `parity_check.py --synthetic --noise-npz` must pass the
  reference_equal_noise_fp32 gate with SSIM ~ 1.0 — proving the npz
  schema and every injection point round-trip
  (tests/test_weights_gate.py::test_capture_npz_roundtrip).

npz schema (fp32 unless noted):
  prior_{text_embed,text_hidden,text_mask,text_embed_u,text_hidden_u,
         text_mask_u,image_embed,mask_embed}      PriorConditioning fields
  story_{text_hidden,text_hidden_u,image_tokens,frame_known,
         masked_latents,mask_label}               StoryConditioning minus
                                                  image_proj (the prior's
                                                  output supplies it)
  prior_init_latents (b, f, d)                    RAW randn, pre-sigma
  prior_step_noise (steps, b, f, d)               UnCLIP variance noise
                                                  (zeros where the
                                                  reference draws none)
  story_init_latents (b, f, h8, w8, 4)            RAW randn
  reference_latents (b, f, h8, w8, 4)             final stage-2 latents
                                                  (pre-VAE-decode, still
                                                  VAE-scaled)
  reference_prior_embeds (b, f, d)                post_process_latents out
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# ---------------------------------------------------------------------------
# self-test mode (JAX, CPU): schema + injection-point round-trip
# ---------------------------------------------------------------------------


def self_test(out_path: str, steps: int = 2) -> dict:
    """Generate a self-consistent npz from the tiny JAX pipeline: the gate
    run on it must reproduce reference_latents bit-for-bit (same model,
    same injected noise), so any schema drift or injection regression
    fails CI loudly."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rcdms_tpu.models.vae import VAE
    from rcdms_tpu.sample.pipeline import _padding_mask, build_tiny_pipeline
    from rcdms_tpu.sample.prior_sampler import PriorConditioning
    from rcdms_tpu.sample.story_sampler import StoryConditioning

    # EXACTLY the build parity_check.py --synthetic uses (_build): key 0,
    # lane-aligned unet channels, fp32
    pipeline, params, inputs = build_tiny_pipeline(
        key=jax.random.PRNGKey(0), num_steps=steps, unet_channels=(64, 128))
    b, f = inputs.frame_known.shape

    # --- conditioning through the pipeline's own encoders (the front half
    # of StoryPipeline.generate, without the samplers) ---------------------
    (th_c, te_c), (th_u, te_u) = pipeline._encode_text_pair(
        pipeline.text_encoder_s1, params["text_s1"],
        inputs.tokens_s1, inputs.tokens_s1_u)
    (src_tokens, src_embed), (_, mask_embed) = pipeline._encode_images(
        params["vision"], inputs.source_clip, inputs.mask_clip)
    eos1 = pipeline.text_encoder_s1.cfg.eos_token_id
    cond1 = PriorConditioning(
        text_embed=te_c, text_hidden=th_c,
        text_mask=_padding_mask(inputs.tokens_s1, eos1),
        text_embed_u=te_u, text_hidden_u=th_u,
        text_mask_u=_padding_mask(inputs.tokens_s1_u, eos1),
        image_embed=src_embed, mask_embed=mask_embed)

    # --- explicit noise (what the torch mode captures from the hooks) -----
    rng = np.random.RandomState(42)
    d = pipeline.prior_sampler.model.cfg.embedding_dim
    prior_init = rng.randn(b, f, d).astype(np.float32)
    prior_step = rng.randn(steps, b, f, d).astype(np.float32)

    embeds = pipeline.prior_sampler(
        params["prior"], cond1, jax.random.PRNGKey(0),
        init_latents=jnp.asarray(prior_init),
        step_noise=jnp.asarray(prior_step))

    # --- stage-2 conditioning (masked latents via the VAE, like generate)
    (th2_c, _), (th2_u, _) = pipeline._encode_text_pair(
        pipeline.text_encoder_s2, params["text_s2"],
        inputs.tokens_s2, inputs.tokens_s2_u)
    px = inputs.source_pixels
    mean, logvar = pipeline.vae.apply(
        params["vae"], px.reshape((b * f,) + px.shape[2:]),
        method=VAE.encode)
    vae_noise = rng.randn(*mean.shape).astype(np.float32)
    masked_latents = (VAE.sample_latent(mean, logvar, jnp.asarray(vae_noise))
                      * pipeline.vae_scale)
    masked_latents = masked_latents.reshape((b, f) + masked_latents.shape[1:])
    h8, w8 = masked_latents.shape[2:4]
    mask_label = jnp.broadcast_to(
        inputs.frame_known[:, :, None, None, None].astype(jnp.float32),
        (b, f, h8, w8, 1))
    image_proj = jnp.where(inputs.frame_known[..., None], src_embed, embeds)
    cond2 = StoryConditioning(
        text_hidden=th2_c, text_hidden_u=th2_u, image_tokens=src_tokens,
        image_proj=image_proj, frame_known=inputs.frame_known,
        masked_latents=masked_latents, mask_label=mask_label)

    story_init = rng.randn(b, f, h8, w8, 4).astype(np.float32)
    latents = pipeline.story_sampler(
        params["unet"], params["fusion"], cond2, jax.random.PRNGKey(0),
        init_latents=jnp.asarray(story_init))

    arrays = {}
    for k in PriorConditioning._fields:
        arrays[f"prior_{k}"] = np.asarray(getattr(cond1, k))
    for k in StoryConditioning._fields:
        if k != "image_proj":
            arrays[f"story_{k}"] = np.asarray(getattr(cond2, k))
    arrays.update(
        prior_init_latents=prior_init, prior_step_noise=prior_step,
        story_init_latents=story_init,
        reference_latents=np.asarray(latents, np.float32),
        reference_prior_embeds=np.asarray(embeds, np.float32))
    np.savez(out_path, **arrays)
    return arrays


# ---------------------------------------------------------------------------
# torch mode (reference environment only)
# ---------------------------------------------------------------------------


def _nchw_to_nhwc_bf(x, b: int, f: int) -> np.ndarray:
    """(b*f, c, h, w) torch -> (b, f, h, w, c) numpy fp32."""
    a = x.detach().to("cpu", dtype=__import__("torch").float32).numpy()
    a = a.transpose(0, 2, 3, 1)
    return a.reshape((b, f) + a.shape[1:])


def _bcfhw_to_bfhwc(x) -> np.ndarray:
    """(b, c, f, h, w) torch -> (b, f, h, w, c) numpy fp32."""
    a = x.detach().to("cpu", dtype=__import__("torch").float32).numpy()
    return a.transpose(0, 2, 3, 4, 1)


class _NoiseRecorder:
    """Hook for `diffusers.utils.torch_utils.randn_tensor` at its
    consumption sites: records every draw in order. The reference draws
    (1) the prior init latents (`prior_pipeline.py:116`), then (2) one
    UnCLIP variance tensor per scheduler step that has variance
    (`diffusers/schedulers/scheduling_unclip.py`, inside .step)."""

    def __init__(self, real_fn):
        self.real_fn = real_fn
        self.draws: list[np.ndarray] = []

    def __call__(self, shape, *a, **k):
        out = self.real_fn(shape, *a, **k)
        import torch

        self.draws.append(out.detach().to("cpu", torch.float32).numpy())
        return out


def capture_torch(args) -> dict:
    """One-story capture against the live reference repo. Mirrors the
    'continue'-mode protocol: frame 0 is the known frame
    (`stage1_batchtest_rcdms_model.py:174-180`), captions lowercased
    (`:185`), seed 42, 20 UnCLIP + 20 DDIM steps, CFG 2.0."""
    import torch
    from PIL import Image

    sys.path.insert(0, args.reference_root)
    import diffusers.schedulers.scheduling_unclip as unclip_mod
    from diffusers import AutoencoderKL, DDIMScheduler, UnCLIPScheduler
    from omegaconf import OmegaConf
    from src.models.myprior_transformer import MyPriorTransformer
    from src.pipelines import prior_pipeline as prior_mod
    from src.pipelines.prior_pipeline import Seq_Inpaint_Prior_Pipeline
    from src.pipelines.RCDMs_pipeline import RCDMsPipeline
    from src.models.unet import UNet3DConditionModel
    from transformers import (
        CLIPImageProcessor,
        CLIPTextModelWithProjection,
        CLIPTokenizer,
        CLIPVisionModelWithProjection,
    )

    # dataset-specific tokenizer surgery (stage{1,2}_batchtest:34-38):
    # [max_length, resized vocab, added character tokens]
    dataset_config = {
        "flintstones": [91, 49412, ["fred", "barney", "wilma", "betty",
                                    "pebbles", "dino", "slate"]],
        "pororosv": [85, 49416, ["pororo", "loopy", "eddy", "harry",
                                 "poby", "tongtong", "crong", "rody",
                                 "petty"]],
    }[args.dataset]

    def resize_text_tower(text_encoder, tokenizer):
        """The vocab + position-embedding surgery both batchtest scripts
        apply (`stage1_batchtest_rcdms_model.py:106-120`)."""
        tokenizer.add_tokens(dataset_config[2])
        text_encoder.resize_token_embeddings(dataset_config[1])
        max_lengths = dataset_config[0]
        old = text_encoder.text_model.embeddings.position_embedding
        new = text_encoder._get_resized_embeddings(old, max_lengths)
        text_encoder.text_model.embeddings.position_embedding = new
        text_encoder.config.max_position_embeddings = max_lengths
        text_encoder.max_position_embeddings = max_lengths
        text_encoder.text_model.embeddings.position_ids = (
            torch.arange(max_lengths).expand((1, -1)))

    device = torch.device(args.device)
    torch.set_grad_enabled(False)
    f = 5
    steps, guidance = args.steps, args.guidance

    # ---- stage-1 models (stage1_batchtest_rcdms_model.py:98-122) ---------
    cfg_all = OmegaConf.load(os.path.join(args.reference_root,
                                          args.unet_additional_kwargs))
    ucfg = cfg_all.unet_additional_kwargs
    prior = MyPriorTransformer.from_pretrained_2d(
        args.pretrained_prior, subfolder="prior",
        unet_additional_kwargs=OmegaConf.to_container(ucfg))
    prior.load_state_dict(
        torch.load(args.prior_ckpt, map_location="cpu")["module"])
    scheduler1 = UnCLIPScheduler.from_pretrained(args.pretrained_prior,
                                                 subfolder="scheduler")
    image_encoder = CLIPVisionModelWithProjection.from_pretrained(
        args.pretrained_prior, subfolder="image_encoder").to(device)
    tokenizer1 = CLIPTokenizer.from_pretrained(args.pretrained_prior,
                                               subfolder="tokenizer")
    text_encoder1 = CLIPTextModelWithProjection.from_pretrained(
        args.pretrained_prior, subfolder="text_encoder")
    resize_text_tower(text_encoder1, tokenizer1)
    pipe1 = Seq_Inpaint_Prior_Pipeline(
        prior=prior, image_encoder=image_encoder,
        text_encoder=text_encoder1, tokenizer=tokenizer1,
        scheduler=scheduler1).to(device)

    # ---- conditioning images ('continue': frame 0 known) -----------------
    proc = CLIPImageProcessor()
    imgs = [np.array(Image.open(p).convert("RGB")) for p in args.images]
    black = Image.new("RGB", (args.size, args.size), (0, 0, 0))
    white = Image.new("RGB", (args.size, args.size), (255, 255, 255))

    def clip_pix(im):
        return proc(images=im, return_tensors="pt").pixel_values.squeeze(0)

    source_clip = torch.stack([clip_pix(imgs[0])]
                              + [clip_pix(black)] * (f - 1))
    mask_clip = torch.stack([clip_pix(white)] + [clip_pix(black)] * (f - 1))
    imgs_proj = image_encoder(source_clip.to(device)).image_embeds[:, None]
    mask_embeds = image_encoder(mask_clip.to(device)).image_embeds[:, None]

    texts = [t.lower() for t in args.captions]

    # ---- hook the noise draws and run the prior pipeline ------------------
    rec1 = _NoiseRecorder(prior_mod.randn_tensor)
    prior_mod.randn_tensor = rec1
    rec_step = _NoiseRecorder(unclip_mod.randn_tensor)
    unclip_mod.randn_tensor = rec_step
    try:
        # capture the conditioning exactly where the model consumes it
        pe, th, tm = pipe1._encode_prompt(texts, device, 1, True, None)
        gen = torch.Generator(device=device).manual_seed(args.seed)
        out1 = pipe1(prompt=texts, imgs_proj_embeds1=imgs_proj,
                     mask_label=mask_embeds, video_length=f,
                     height=args.size, width=args.size,
                     guidance_scale=guidance, generator=gen,
                     num_inference_steps=steps)
    finally:
        prior_mod.randn_tensor = rec1.real_fn
        unclip_mod.randn_tensor = rec_step.real_fn
    prior_embeds = out1[0]  # (f, d) post_process_latents output

    def split_cfg(t):
        a = t.detach().to("cpu", torch.float32).numpy()
        u, c = a[:f], a[f:]
        return (c.reshape((1, f) + c.shape[1:]),
                u.reshape((1, f) + u.shape[1:]))

    th_c, th_u = split_cfg(th)
    te_c, te_u = split_cfg(pe)
    tm_np = tm.detach().cpu().numpy().astype(bool)
    tm_c, tm_u = (tm_np[f:].reshape(1, f, -1), tm_np[:f].reshape(1, f, -1))

    arrays = {
        "prior_text_embed": te_c, "prior_text_embed_u": te_u,
        "prior_text_hidden": th_c, "prior_text_hidden_u": th_u,
        "prior_text_mask": tm_c, "prior_text_mask_u": tm_u,
        "prior_image_embed":
            imgs_proj.squeeze(1)[None].detach().cpu().float().numpy(),
        "prior_mask_embed":
            mask_embeds.squeeze(1)[None].detach().cpu().float().numpy(),
    }
    # draw #1 in rec1 is prepare_latents' RAW randn (pre-init_noise_sigma,
    # prior_pipeline.py:116); UnCLIP variance draws live in rec_step
    arrays["prior_init_latents"] = rec1.draws[0].reshape(1, f, -1)
    d = arrays["prior_init_latents"].shape[-1]
    step_noise = np.zeros((steps, 1, f, d), np.float32)
    for i, draw in enumerate(rec_step.draws[:steps]):
        step_noise[i] = draw.reshape(1, f, d)
    arrays["prior_step_noise"] = step_noise
    arrays["reference_prior_embeds"] = (
        prior_embeds.detach().cpu().float().numpy().reshape(1, f, -1))

    # ---- stage 2 (stage2_batchtest_rcdms_model.py:198-310) ---------------
    sd = args.pretrained_sd
    # the stage-2 text tower is the SD text encoder with the SAME
    # kandinsky tokenizer + vocab/position surgery as stage 1
    # (stage2_batchtest:200-217)
    tokenizer2 = CLIPTokenizer.from_pretrained(args.pretrained_prior,
                                               subfolder="tokenizer")
    text_encoder2 = CLIPTextModelWithProjection.from_pretrained(
        sd, subfolder="text_encoder")
    resize_text_tower(text_encoder2, tokenizer2)
    vae = AutoencoderKL.from_pretrained(sd, subfolder="vae")
    unet = UNet3DConditionModel.from_pretrained_2d(
        sd, subfolder="unet",
        unet_additional_kwargs=OmegaConf.to_container(ucfg))

    # split the joint DeepSpeed blob by module prefix and rebuild the two
    # fusion stacks (stage2_batchtest:131-243; fine_stack text_dim=768
    # vis_dim=1664, semantic_stack vis_dim=1280)
    from stage2_batchtest_rcdms_model import fine_stack, semantic_stack

    blob = torch.load(args.stage2_ckpt, map_location="cpu")["module"]
    seen, unseen, unet_sd = {}, {}, {}
    for k, v in blob.items():
        if k.startswith("seen_module"):
            seen[k.replace("seen_module.", "")] = v
        elif k.startswith("unseen_module"):
            unseen[k.replace("unseen_module.", "")] = v
        elif k.startswith("unet"):
            unet_sd[k.replace("unet.", "")] = v
    local_module = fine_stack(text_dim=768, vis_dim=1664)
    global_module = semantic_stack(text_dim=768, vis_dim=1280)
    local_module.load_state_dict(seen)
    global_module.load_state_dict(unseen)
    unet.load_state_dict(unet_sd)
    pipe2 = RCDMsPipeline(
        vae=vae, text_encoder=text_encoder2, tokenizer=tokenizer2,
        unet=unet, local_module=local_module, global_module=global_module,
        scheduler=DDIMScheduler(**OmegaConf.to_container(
            cfg_all.noise_scheduler_kwargs))).to(device)

    # stage-2 conditioning, 'continue' mode (stage2_batchtest:285-298):
    # frame 0's 512px pixels (img_augment) + black frames (mask_augment —
    # note: no resize on the black image), CLIP tokens of frame 0,
    # prior embeds for frames 1..4
    import torchvision.transforms as T

    img_augment = T.Compose([T.ToPILImage(), T.Resize([args.size,
                                                       args.size]),
                             T.ToTensor(), T.Normalize([0.5], [0.5])])
    mask_augment = T.Compose([T.ToTensor(), T.Normalize([0.5], [0.5])])
    black_px = mask_augment(black)
    src_px = torch.stack([img_augment(imgs[0])]
                         + [black_px] * (f - 1))           # (f, 3, H, W)
    tokens_known = image_encoder(
        clip_pix(imgs[0])[None].to(device)).last_hidden_state  # (1,257,d)
    # the JAX fusion takes tokens for ALL frames and routes by frame_known;
    # unknown frames' tokens are never consumed, so capture the encoder
    # run on the full source_clip batch (what pipeline.generate computes)
    clip_tokens_all = image_encoder(
        source_clip.to(device)).last_hidden_state          # (f, 257, d)
    arrays["story_image_tokens"] = (
        clip_tokens_all.detach().cpu().float().numpy()[None])
    arrays["story_frame_known"] = np.array([[True] + [False] * (f - 1)])

    pe2 = pipe2._encode_prompt(texts, device, 1, True, None)  # (2f, 91, 768)
    th2 = pe2.detach().cpu().float().numpy()
    arrays["story_text_hidden"] = th2[f:].reshape((1, f) + th2.shape[1:])
    arrays["story_text_hidden_u"] = th2[:f].reshape((1, f) + th2.shape[1:])

    h8 = args.size // 8
    black0 = torch.zeros((1, h8, h8))
    white1 = torch.ones((1, h8, h8))
    mask_label = torch.stack([white1] + [black0] * (f - 1))

    # capture what the UNet actually consumes: its first-step input is
    # cat([init latents (DDIM scale=1), mask label, masked latents*0.18215],
    # dim=1) (RCDMs_pipeline.py:485-489) — hooking it avoids replaying the
    # generator draw order (VAE sample + prepare_latents) by hand
    first_input = {}
    final = {}

    def unet_pre_hook(module, hook_args, hook_kwargs):
        if "x" not in first_input:
            first_input["x"] = hook_args[0].detach().cpu().float()

    handle = pipe2.unet.register_forward_pre_hook(unet_pre_hook,
                                                  with_kwargs=True)

    def cb(i, t, latents):
        final["latents"] = latents.detach().cpu().float()

    try:
        pipe2(prompt=texts, source_img=src_px,
              image_embeds_1=tokens_known,
              proj_embeds_0=prior_embeds[1:].unsqueeze(1),
              mask_label=mask_label,
              video_length=f, height=args.size, width=args.size,
              num_inference_steps=steps, guidance_scale=guidance,
              generator=torch.Generator(device=device).manual_seed(
                  args.seed),
              callback=cb, callback_steps=1)
    finally:
        handle.remove()

    x0 = first_input["x"]                 # (2b, 9, f, h8, w8), [u | c]
    cond_half = x0[x0.shape[0] // 2:]
    arrays["story_init_latents"] = _bcfhw_to_bfhwc(cond_half[:, 0:4])
    arrays["story_mask_label"] = _bcfhw_to_bfhwc(cond_half[:, 4:5])
    arrays["story_masked_latents"] = _bcfhw_to_bfhwc(cond_half[:, 5:9])
    arrays["reference_latents"] = _bcfhw_to_bfhwc(final["latents"])
    return arrays


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--self-test", metavar="OUT_NPZ",
                    help="JAX tiny-pipeline schema round-trip (CI mode)")
    ap.add_argument("--out", help="output npz (torch mode)")
    ap.add_argument("--reference-root", help="path to the RCDMs checkout")
    ap.add_argument("--pretrained-prior", help="kandinsky-2-2-prior dir")
    ap.add_argument("--pretrained-sd", help="stable-diffusion-v1-5 dir")
    ap.add_argument("--prior-ckpt", help="stage-1 mp_rank_00 blob")
    ap.add_argument("--stage2-ckpt", help="stage-2 mp_rank_00 blob")
    ap.add_argument("--unet-additional-kwargs",
                    default="configs/training.yaml")
    ap.add_argument("--images", nargs=5, help="the 5 ground-truth frames")
    ap.add_argument("--captions", nargs=5, help="the 5 captions")
    ap.add_argument("--dataset", default="pororosv",
                    choices=["pororosv", "flintstones"],
                    help="selects the tokenizer/text-tower surgery")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--guidance", type=float, default=2.0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--device", default="cuda:0")
    a = ap.parse_args(argv)

    if a.self_test:
        arrays = self_test(a.self_test)
        print(f"wrote {a.self_test}: "
              + ", ".join(f"{k}{list(v.shape)}"
                          for k, v in sorted(arrays.items())))
        return 0

    for req in ("out", "reference_root", "pretrained_prior",
                "pretrained_sd", "prior_ckpt", "stage2_ckpt", "images",
                "captions"):
        if getattr(a, req) is None:
            ap.error(f"--{req.replace('_', '-')} required in torch mode")
    arrays = capture_torch(a)
    np.savez(a.out, **arrays)
    print(f"wrote {a.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
