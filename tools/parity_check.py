"""Numerical-parity harness vs the PyTorch reference (SSIM >= 0.99 gate).

Runs when BOTH the torch reference environment (diffusers + the reference
repo) and converted pretrained weights are available — neither ships in this
repo, so this is an operator tool, not a unit test. Everything needed for
equal-seed comparison is already wired in the framework:

  * samplers accept injected `init_latents` and per-step `step_noise`
    (rcdms_tpu/sample/prior_sampler.py, story_sampler.py) so both sides can
    consume the SAME noise tensors (generate them once with
    `torch.Generator(seed)` and hand the numpy arrays to both),
  * `io/convert.py` maps every reference checkpoint format (HF pretrained
    bases AND trained DeepSpeed blobs via `split_deepspeed_blob` /
    `convert_rcdms_prior` / `convert_rcdms_unet3d`),
  * parity should run in fp32 (`dtype=jnp.float32` on all modules) to
    isolate porting errors from precision.

Procedure per BASELINE.json config:
  1. load the reference pipeline in torch, fix `torch.Generator(42)`;
     capture: initial latents, per-step scheduler noise (UnCLIP), VAE
     posterior noise; save as .npz.
  2. run the torch pipeline -> reference frames + prior embeddings.
  3. run `run_jax_side(npz, weights)` below -> our frames + embeddings.
  4. compare: per-frame SSIM (sample/eval.py::ssim) >= 0.99, prior embeds
     cosine >= 0.999.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def run_jax_side(noise_npz: str, weights_root: str, dataset: str = "pororosv",
                 steps: int = 20, guidance: float = 2.0):
    import jax
    import jax.numpy as jnp

    from rcdms_tpu.cli import evaluate

    ns = np.load(noise_npz)
    args = evaluate.parse_args([
        "--dataset", dataset,
        "--sd-pretrained", f"{weights_root}/stable-diffusion-v1-5",
        "--prior-pretrained", f"{weights_root}/kandinsky-2-2-prior/prior",
        "--text-s1-pretrained",
        f"{weights_root}/kandinsky-2-2-prior/text_encoder",
        "--vision-pretrained",
        f"{weights_root}/kandinsky-2-2-prior/image_encoder",
        "--num-inference-steps", str(steps),
        "--guidance-scale", str(guidance),
    ])
    pipeline, params, dataset_obj, ds_cfg = evaluate.build_pipeline(args)

    # drive the two samplers with the reference's noise
    prior_out = pipeline.prior_sampler(
        params["prior"], _prior_cond_from_npz(ns), jax.random.PRNGKey(0),
        init_latents=jnp.asarray(ns["prior_init_latents"]),
        step_noise=jnp.asarray(ns["prior_step_noise"]))
    story_out = pipeline.story_sampler(
        params["unet"], params["fusion"], _story_cond_from_npz(ns, prior_out),
        jax.random.PRNGKey(0),
        init_latents=jnp.asarray(ns["story_init_latents"]))
    return np.asarray(prior_out), np.asarray(story_out)


def _prior_cond_from_npz(ns):
    import jax.numpy as jnp

    from rcdms_tpu.sample.prior_sampler import PriorConditioning

    return PriorConditioning(**{k: jnp.asarray(ns[f"prior_{k}"])
                                for k in PriorConditioning._fields})


def _story_cond_from_npz(ns, image_proj):
    import jax.numpy as jnp

    from rcdms_tpu.sample.story_sampler import StoryConditioning

    d = {k: jnp.asarray(ns[f"story_{k}"])
         for k in StoryConditioning._fields if k != "image_proj"}
    return StoryConditioning(image_proj=image_proj, **d)


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--noise-npz", required=True)
    ap.add_argument("--weights-root", required=True)
    ap.add_argument("--reference-frames-npz", default=None)
    a = ap.parse_args()
    embeds, latents = run_jax_side(a.noise_npz, a.weights_root)
    print("prior embeds:", embeds.shape, "story latents:", latents.shape)
    if a.reference_frames_npz:
        from rcdms_tpu.sample.eval import ssim

        ref = np.load(a.reference_frames_npz)
        sims = [ssim(latents[0, i], ref["latents"][0, i], data_range=4.0)
                for i in range(latents.shape[1])]
        print("per-frame latent SSIM:", sims)
        sys.exit(0 if min(sims) >= 0.99 else 1)
