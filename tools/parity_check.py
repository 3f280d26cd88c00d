"""One-command real-weights parity gate (SSIM >= 0.99) + mode deltas.

The reference's whole value is the trained two-stage pipeline
(`/root/reference/src/pipelines/RCDMs_pipeline.py:374-517`,
`stage1_batchtest_rcdms_model.py:70-261`); this gate is the insurance
policy that the TPU rebuild reproduces it the moment weights exist, and
that every opt-in speed mode's quality cost is MEASURED, not assumed.

    # full gate against converted reference weights (operator runbook in
    # PARITY.md; needs RCDMS_WEIGHTS_ROOT layout, torch + transformers):
    python tools/parity_check.py --weights-root $RCDMS_WEIGHTS_ROOT \
        [--noise-npz ref_noise.npz] --out parity_report.json

    # CI dry-run on tiny synthetic weights (CPU, no downloads) — exercises
    # every branch of the gate machinery end to end:
    python tools/parity_check.py --synthetic --out /tmp/report.json

Checks (each a row in the JSON report; 'skipped' rows name what was
missing):

  hf_text_parity / hf_vision_parity   full-config CLIP towers vs torch
                                      transformers (shells out to
                                      tests/test_weights_gate.py)
  reference_equal_noise_fp32          fp32 two-stage run on the
                                      reference's captured noise
                                      (--noise-npz) vs its latents:
                                      per-frame SSIM >= 0.99, prior
                                      cosine >= 0.999 — THE parity gate
  bf16_vs_fp32                        same weights + key, bf16 build vs
                                      fp32 build: frame SSIM (what TPU
                                      serving costs vs the parity dtype)
  int8_vs_bf16                        opt-in w8a8 mode delta at equal
                                      noise (ops/quant.py)
  encoder_prop2_vs_bf16               opt-in --encoder-propagation 2
                                      delta at equal noise

Equal noise across modes works WITHOUT noise injection for the mode
deltas: all sampler randomness is derived from the one PRNG key in fp32,
so two builds given the same key consume identical noise.

Noise-npz schema for the reference check: `prior_{field}` for every
PriorConditioning field, `story_{field}` for every StoryConditioning
field except image_proj, `prior_init_latents`, `prior_step_noise`,
`story_init_latents`, `reference_latents` (+ optional
`reference_prior_embeds`) — captured on the torch side with
`torch.Generator(42)` per the procedure in PARITY.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# ---------------------------------------------------------------------------
# pipeline builders (weights vs synthetic), one per dtype
# ---------------------------------------------------------------------------


def _build(weights_root: str | None, dtype: str, steps: int,
           guidance: float, dataset: str):
    """(pipeline, params, inputs|None). Weights mode loads the converted
    reference weights through the evaluate CLI's builder; synthetic mode
    uses the tiny random pipeline with lane-aligned UNet channels so the
    int8/taps9 formulations actually engage."""
    import jax

    if weights_root is None:
        from rcdms_tpu.sample.pipeline import build_tiny_pipeline

        pipeline, params, inputs = build_tiny_pipeline(
            key=jax.random.PRNGKey(0), num_steps=steps,
            unet_channels=(64, 128))
        if dtype == "bfloat16":
            import jax.numpy as jnp

            params = jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16)
                if p.dtype == jnp.float32 else p, params)
        return pipeline, params, inputs

    from rcdms_tpu.cli import evaluate

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
        "--dtype", dtype,
    ])
    pipeline, params, _, ds_cfg = evaluate.build_pipeline(args)
    return pipeline, params, _default_inputs(pipeline, ds_cfg)


def _default_inputs(pipeline, ds_cfg):
    """Deterministic synthetic StoryInputs at the real pipeline's shapes
    (for the mode-delta checks, which compare the pipeline against
    ITSELF — the conditioning only needs to be fixed, not real)."""
    import jax.numpy as jnp

    from rcdms_tpu.sample.pipeline import StoryInputs

    f, size, csize = (ds_cfg.num_frames, ds_cfg.image_size,
                      ds_cfg.clip_size)
    t1 = pipeline.text_encoder_s1.cfg.max_positions
    t2 = pipeline.text_encoder_s2.cfg.max_positions
    rng = np.random.RandomState(0)
    return StoryInputs(
        tokens_s1=jnp.asarray(rng.randint(1, 1000, (1, f, t1)), jnp.int32),
        tokens_s1_u=jnp.asarray(rng.randint(1, 1000, (1, f, t1)),
                                jnp.int32),
        tokens_s2=jnp.asarray(rng.randint(1, 1000, (1, f, t2)), jnp.int32),
        tokens_s2_u=jnp.asarray(rng.randint(1, 1000, (1, f, t2)),
                                jnp.int32),
        source_clip=jnp.asarray(rng.randn(1, f, csize, csize, 3),
                                jnp.float32),
        mask_clip=jnp.asarray(rng.randn(1, f, csize, csize, 3),
                              jnp.float32),
        source_pixels=jnp.zeros((1, f, size, size, 3), jnp.float32),
        frame_known=jnp.zeros((1, f), bool).at[:, 0].set(True),
    )


def _generate(pipeline, params, inputs, seed: int = 0, prop: int = 0):
    """Full two-stage generate; returns (frames [0,1], prior embeds) as
    fp32 numpy. Fresh jit wrapper per call: the quant mode is a
    trace-time gate and bound methods compare equal, so a shared wrapper
    would silently reuse the first mode's program."""
    import dataclasses

    import jax

    if prop:
        pipeline = dataclasses.replace(
            pipeline, story_sampler=dataclasses.replace(
                pipeline.story_sampler, encoder_propagation=prop))
    frames, embeds = jax.jit(lambda p, i, k: pipeline.generate(p, i, k))(
        params, inputs, jax.random.PRNGKey(seed))
    return (np.asarray(frames, np.float32),
            np.asarray(embeds, np.float32))


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------


def _frame_ssim(a: np.ndarray, b: np.ndarray) -> list[float]:
    from rcdms_tpu.sample.eval import ssim

    return [float(ssim(a[0, i], b[0, i])) for i in range(a.shape[1])]


def _cos(a: np.ndarray, b: np.ndarray) -> float:
    x, y = a.ravel(), b.ravel()
    return float(np.dot(x, y)
                 / (np.linalg.norm(x) * np.linalg.norm(y) + 1e-12))


def _delta_row(frames_ref, embeds_ref, frames_alt, embeds_alt):
    sims = _frame_ssim(frames_ref, frames_alt)
    return {
        "status": "measured",
        "ssim_per_frame": [round(s, 4) for s in sims],
        "ssim_min": round(min(sims), 4),
        "prior_cos": round(_cos(embeds_ref, embeds_alt), 5),
    }


# ---------------------------------------------------------------------------
# the reference equal-noise check (needs the torch-captured noise npz)
# ---------------------------------------------------------------------------


def run_jax_side(noise_npz: str, weights_root: str | None,
                 dataset: str = "pororosv", steps: int = 20,
                 guidance: float = 2.0, dtype: str = "float32"):
    """Drive both samplers with the reference's captured noise; returns
    (prior embeds, story latents) for comparison against the reference's
    outputs. Kept importable — tests/test_weights_gate.py calls it."""
    import jax
    import jax.numpy as jnp

    ns = np.load(noise_npz)
    pipeline, params, _ = _build(weights_root, dtype, steps, guidance,
                                 dataset)
    prior_out = pipeline.prior_sampler(
        params["prior"], _prior_cond_from_npz(ns), jax.random.PRNGKey(0),
        init_latents=jnp.asarray(ns["prior_init_latents"]),
        step_noise=jnp.asarray(ns["prior_step_noise"]))
    story_out = pipeline.story_sampler(
        params["unet"], params["fusion"],
        _story_cond_from_npz(ns, prior_out), jax.random.PRNGKey(0),
        init_latents=jnp.asarray(ns["story_init_latents"]))
    return np.asarray(prior_out, np.float32), np.asarray(story_out,
                                                         np.float32)


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


def _reference_check(noise_npz, weights_root, dataset, steps, guidance):
    from rcdms_tpu.sample.eval import ssim

    embeds, latents = run_jax_side(noise_npz, weights_root, dataset,
                                   steps, guidance, dtype="float32")
    ref = np.load(noise_npz)
    if "reference_latents" not in ref:
        return {"status": "skipped",
                "reason": "npz lacks reference_latents"}
    sims = [float(ssim(latents[0, i], ref["reference_latents"][0, i],
                       data_range=4.0))
            for i in range(latents.shape[1])]
    row = {"status": "measured",
           "ssim_per_frame": [round(s, 4) for s in sims],
           "ssim_min": round(min(sims), 4),
           "passed": min(sims) >= 0.99}
    if "reference_prior_embeds" in ref:
        cos = _cos(embeds, np.asarray(ref["reference_prior_embeds"]))
        row["prior_cos"] = round(cos, 5)
        row["passed"] = bool(row["passed"] and cos >= 0.999)
    return row


def _hf_parity_check(weights_root, keyword):
    """One full-config HF tower parity test, via pytest so its skip
    conditions (transformers/torch availability, weight subdirs) apply
    unchanged. Run once per tower so a failure names which CLIP tower
    broke (ADVICE r4)."""
    env = dict(os.environ, RCDMS_WEIGHTS_ROOT=weights_root)
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "--no-header",
         os.path.join(REPO, "tests", "test_weights_gate.py"),
         "-k", keyword],
        capture_output=True, text=True, env=env, cwd=REPO)
    tail = (proc.stdout.strip().splitlines() or [""])[-1]
    return {"status": "passed" if proc.returncode == 0 else "failed",
            "pytest": tail}


# ---------------------------------------------------------------------------
# gate driver
# ---------------------------------------------------------------------------


def run_gate(weights_root: str | None, noise_npz: str | None,
             dataset: str, steps: int, guidance: float) -> dict:
    from rcdms_tpu.ops import quant

    report: dict = {
        "mode": "synthetic" if weights_root is None else "weights",
        "dataset": dataset, "steps": steps, "checks": {}}
    checks = report["checks"]

    # 1. HF tower parity (weights + torch only)
    if weights_root is not None:
        checks["hf_text_parity"] = _hf_parity_check(
            weights_root, "clip_text_full_config")
        checks["hf_vision_parity"] = _hf_parity_check(
            weights_root, "clip_vision_full_config")
    else:
        checks["hf_text_parity"] = checks["hf_vision_parity"] = {
            "status": "skipped", "reason": "synthetic mode"}

    # 2. the reference equal-noise gate
    if noise_npz and os.path.exists(noise_npz):
        checks["reference_equal_noise_fp32"] = _reference_check(
            noise_npz, weights_root, dataset, steps, guidance)
    else:
        checks["reference_equal_noise_fp32"] = {
            "status": "skipped",
            "reason": "--noise-npz not provided (capture per PARITY.md)"}

    # 3. mode deltas at equal noise (pipeline vs itself; no npz needed)
    quant.set_quant_mode(None)
    pl32, p32, in32 = _build(weights_root, "float32", steps, guidance,
                             dataset)
    f32, e32 = _generate(pl32, p32, in32)
    f32_rerun, _ = _generate(pl32, p32, in32)
    checks["determinism_fp32"] = {
        "status": "measured",
        "identical": bool(np.array_equal(f32, f32_rerun))}
    del pl32, p32

    plb, pb, inb = _build(weights_root, "bfloat16", steps, guidance,
                          dataset)
    fb, eb = _generate(plb, pb, inb)
    checks["bf16_vs_fp32"] = _delta_row(f32, e32, fb, eb)

    quant.set_quant_mode("int8")
    fq, eq = _generate(plb, pb, inb)
    quant.set_quant_mode(None)
    row = _delta_row(fb, eb, fq, eq)
    row["engaged"] = bool(not np.array_equal(fb, fq))
    checks["int8_vs_bf16"] = row

    fp, ep = _generate(plb, pb, inb, prop=2)
    checks["encoder_prop2_vs_bf16"] = _delta_row(fb, eb, fp, ep)

    # verdict: hard-gate only the checks with defined thresholds
    hard = []
    ref_row = checks["reference_equal_noise_fp32"]
    if ref_row["status"] == "measured":
        hard.append(ref_row.get("passed", False))
    for name in ("hf_text_parity", "hf_vision_parity"):
        if checks[name]["status"] == "failed":
            hard.append(False)
    hard.append(checks["determinism_fp32"]["identical"])
    report["gate"] = "PASS" if all(hard) else "FAIL"
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights-root",
                    default=os.environ.get("RCDMS_WEIGHTS_ROOT"))
    ap.add_argument("--synthetic", action="store_true",
                    help="tiny random weights, CPU — the CI dry-run")
    ap.add_argument("--noise-npz",
                    default=os.environ.get("RCDMS_PARITY_NPZ"))
    ap.add_argument("--dataset", default="pororosv")
    ap.add_argument("--steps", type=int, default=None,
                    help="default: 20 (reference eval), 2 in --synthetic")
    ap.add_argument("--guidance", type=float, default=2.0)
    ap.add_argument("--out", default=None, help="report JSON path")
    a = ap.parse_args(argv)

    if a.synthetic:
        import jax

        jax.config.update("jax_platforms", "cpu")
        a.weights_root = None
        # force the kernel formulations on CPU (interpret mode) so the
        # dry-run exercises the same dispatch the TPU path takes
        from rcdms_tpu.ops import flash
        from rcdms_tpu.ops.attention import set_default_attention_impl

        set_default_attention_impl("pallas")
        flash.set_kernel_interpret(True)
    elif not a.weights_root:
        ap.error("--weights-root (or RCDMS_WEIGHTS_ROOT) required "
                 "unless --synthetic")

    steps = a.steps or (2 if a.synthetic else 20)
    report = run_gate(a.weights_root, a.noise_npz, a.dataset, steps,
                      a.guidance)
    text = json.dumps(report, indent=1)
    print(text)
    if a.out:
        with open(a.out, "w") as fh:
            fh.write(text + "\n")
    return 0 if report["gate"] == "PASS" else 1


if __name__ == "__main__":
    sys.exit(main())
