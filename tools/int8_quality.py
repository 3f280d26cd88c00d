"""End-to-end quality delta of the opt-in w8a8 int8 mode (VERDICT r3 #1).

Runs the FULL-SCALE stage-2 sampler (same build as bench.py: SD1.5-scale
StoryUNet + fusion, 512 px, 5 frames, 20 DDIM steps, CFG 2.0) twice with
IDENTICAL synthetic weights and IDENTICAL noise (same PRNG key): once on
the exact bf16 path, once with `set_quant_mode("int8")`. Decodes both
latent stories through the same synthetic SD-scale VAE decoder and
reports:

  * latent relative RMS + cosine similarity (per frame and overall),
  * decoded-frame SSIM int8-vs-bf16 (per frame, min/mean),
  * as a noise floor: the same metrics for bf16-vs-bf16 across two
    adjacent PRNG keys (how different two *unrelated* stories are), so
    the int8 delta can be read against "identical" (1.0) and
    "unrelated" anchors.

Synthetic-weights caveat: random weights make the DDIM trajectory less
contractive than trained SD1.5 weights, so this is a conservative bound;
re-run via tools/parity_check.py when real weights exist
(RCDMS_WEIGHTS_ROOT) — the weights gate runs this same comparison.

Run on the real chip: `python tools/int8_quality.py` (~6 min incl. compile).
CPU smoke: `python tools/int8_quality.py --tiny`.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--encprop", action="store_true",
                    help="also measure the --encoder-propagation 2 mode's "
                         "quality delta vs exact bf16 at equal noise "
                         "(VERDICT r3 weak #6: every opt-in speedup needs "
                         "a quality bound next to it)")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import bench
    from rcdms_tpu.configs import VAEConfig
    from rcdms_tpu.models.vae import Decoder
    from rcdms_tpu.ops import quant
    from rcdms_tpu.sample.eval import ssim

    if args.tiny:
        # the int8 taps9 gate needs lane-aligned channels and (on CPU)
        # forced "pallas" dispatch + interpret-mode kernels
        from rcdms_tpu.ops import flash
        from rcdms_tpu.ops.attention import set_default_attention_impl

        set_default_attention_impl("pallas")
        flash.set_kernel_interpret(True)

    sampler, unet_p, fusion_p, cond, frames, steps = bench.build(
        args.tiny, "bfloat16",
        tiny_channels=(64, 128) if args.tiny else None)

    # bench.build uses ZERO params (identical compute cost for timing but
    # a zero UNet output — useless for quality). Fill every float leaf
    # with fan-in-scaled random values on the HOST (jitting the full-scale
    # flax init on the chip compiles for tens of minutes): kernels get
    # N(0, 1/sqrt(fan_in)) — including the zero-init temporal proj_out
    # kernels, so the temporal path contributes like in a trained model —
    # biases 0, norm scales 1.
    rng = np.random.default_rng(0)

    def randomize(tree):
        def leaf(path, s):
            name = path[-1].key if hasattr(path[-1], "key") else ""
            if s.dtype not in (jnp.float32, jnp.bfloat16) or s.ndim == 0:
                return s
            if s.ndim == 1:
                full = np.ones if "scale" in name else np.zeros
                return jnp.asarray(full(s.shape, np.float32), jnp.bfloat16)
            fan_in = int(np.prod(s.shape[:-1]))
            w = rng.standard_normal(s.shape, np.float32) / np.sqrt(fan_in)
            return jnp.asarray(w, jnp.bfloat16)

        return jax.tree_util.tree_map_with_path(leaf, tree)

    unet_p = randomize(unet_p)
    fusion_p = randomize(fusion_p)
    key = jax.random.PRNGKey(42)

    # the quant mode is a TRACE-time gate: each mode needs its own jit
    # wrapper, and bound methods compare EQUAL so `jit(sampler.__call__)`
    # twice hits one cache entry — fresh lambdas keep the traces separate
    quant.set_quant_mode(None)
    run = jax.jit(lambda *a: sampler(*a))
    lat_bf16 = np.asarray(run(unet_p, fusion_p, cond, key), np.float32)
    lat_bf16_k2 = np.asarray(
        run(unet_p, fusion_p, cond, jax.random.PRNGKey(43)), np.float32)

    quant.set_quant_mode("int8")
    run_q = jax.jit(lambda *a: sampler(*a))
    lat_int8 = np.asarray(run_q(unet_p, fusion_p, cond, key), np.float32)
    quant.set_quant_mode(None)
    assert not np.array_equal(lat_bf16, lat_int8), \
        "int8 mode did not engage (identical outputs)"

    lat_prop = None
    if args.encprop:
        import dataclasses

        sampler_p = dataclasses.replace(sampler, encoder_propagation=2)
        run_p = jax.jit(lambda *a: sampler_p(*a))
        lat_prop = np.asarray(run_p(unet_p, fusion_p, cond, key),
                              np.float32)
        assert not np.array_equal(lat_bf16, lat_prop), \
            "encoder propagation did not engage (identical outputs)"

    vcfg = VAEConfig.tiny() if args.tiny else VAEConfig()
    dec = Decoder(vcfg, dtype=jnp.bfloat16)
    zb = lat_bf16.reshape((-1,) + lat_bf16.shape[2:]) / vcfg.scaling_factor
    dparams = dec.init(jax.random.PRNGKey(7), zb[:1])
    decode = jax.jit(dec.apply)

    def to_frames(lat):
        z = lat.reshape((-1,) + lat.shape[2:]) / vcfg.scaling_factor
        img = np.asarray(decode(dparams, jnp.asarray(z)), np.float32)
        return np.clip(img * 0.5 + 0.5, 0.0, 1.0)  # [-1,1] -> [0,1]

    frames_bf16 = to_frames(lat_bf16)
    frames_int8 = to_frames(lat_int8)
    frames_bf16_k2 = to_frames(lat_bf16_k2)

    def latent_metrics(a, b):
        per_frame_cos = []
        for f in range(a.shape[1]):
            x, y = a[:, f].ravel(), b[:, f].ravel()
            per_frame_cos.append(float(
                np.dot(x, y) / (np.linalg.norm(x) * np.linalg.norm(y)
                                + 1e-12)))
        rel_rms = float(np.sqrt(((a - b) ** 2).mean())
                        / np.sqrt((a ** 2).mean() + 1e-12))
        return rel_rms, per_frame_cos

    def frame_ssims(a, b):
        return [float(ssim(a[f], b[f])) for f in range(a.shape[0])]

    rel_q, cos_q = latent_metrics(lat_bf16, lat_int8)
    rel_u, cos_u = latent_metrics(lat_bf16, lat_bf16_k2)
    ssim_q = frame_ssims(frames_bf16, frames_int8)
    ssim_u = frame_ssims(frames_bf16, frames_bf16_k2)

    out = {
        "config": "tiny" if args.tiny else "full (512px, 5f, 20 steps)",
        "int8_vs_bf16": {
            "latent_rel_rms": round(rel_q, 4),
            "latent_cos_per_frame": [round(c, 4) for c in cos_q],
            "ssim_per_frame": [round(s, 4) for s in ssim_q],
            "ssim_min": round(min(ssim_q), 4),
            "ssim_mean": round(float(np.mean(ssim_q)), 4),
        },
        "unrelated_bf16_noise_floor": {
            "latent_rel_rms": round(rel_u, 4),
            "latent_cos_mean": round(float(np.mean(cos_u)), 4),
            "ssim_mean": round(float(np.mean(ssim_u)), 4),
        },
    }
    if lat_prop is not None:
        rel_p, cos_p = latent_metrics(lat_bf16, lat_prop)
        ssim_p = frame_ssims(frames_bf16, to_frames(lat_prop))
        out["encprop2_vs_bf16"] = {
            "latent_rel_rms": round(rel_p, 4),
            "latent_cos_per_frame": [round(c, 4) for c in cos_p],
            "ssim_per_frame": [round(s, 4) for s in ssim_p],
            "ssim_min": round(min(ssim_p), 4),
            "ssim_mean": round(float(np.mean(ssim_p)), 4),
        }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
