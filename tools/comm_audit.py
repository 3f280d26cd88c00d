"""Compiled-HLO communication audit of sharded single-story inference
(VERDICT r2 next-step #1 — the quantitative case for the <=2 s p50 v5e-8
story-latency target).

Lowers + SPMD-compiles the FULL-SCALE (512 px, SD1.5-size, 20-step) stage-2
sampler over an 8-device **CPU** mesh (no TPU needed — GSPMD partitioning
is platform-independent), extracts every collective from the compiled HLO
(all-gather / all-reduce / collective-permute / all-to-all /
reduce-scatter), attributes in-loop ops to the DDIM step count, totals the
per-chip ICI bytes, and models the v5e-8 story latency as

    t = single_chip_p50 * pad_waste / n_devices            (compute)
      + ici_bytes_per_chip / ICI_BW + n_coll * hop_latency (communication)

for each candidate mesh split of the 8 devices:

    space4   ('cfg' 2, 'frame' 1, 'space' 4)  latent rows sharded (round-2)
    frame4   ('cfg' 2, 'frame' 4, 'space' 1)  frames sharded (pad 5 -> 8)
    f2s2     ('cfg' 2, 'frame' 2, 'space' 2)  hybrid (pad 5 -> 6)

Hardware assumptions (v5e, public specs; stated, not fetched):
  * ICI: 4 links/chip, ~45 GB/s per direction per link on the 2x4 twisted
    torus => ~90 GB/s usable per-chip for ring collectives on one axis
    (conservative; marketing aggregate is 1600 Gbps/chip).
  * per-collective launch+hop latency ~3 us.
  * single-chip stage-2 p50 = 2.235 s (BASELINE.md round 3), of which the
    UNet scan is ~2.62 s.

By default the audited program uses the XLA attention path (CPU-mesh
default). Since round 3 the nt flash and frame-attention Pallas kernels
carry custom-partitioning rules (q rows local, KV gathered — the same
communication as the einsum formulation); pass --kernels to compile the
kernel path (interpret mode) and verify its collective volume directly.

Usage:
  python tools/comm_audit.py [--variants space4,frame4,f2s2] [--steps 2]
  (steps=2 keeps CPU compile time down; collectives per step are identical
   to the 20-step program — the scan body compiles once.)
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402

# ---- hardware model -------------------------------------------------------
ICI_GBPS_PER_CHIP = 90e9      # usable one-axis ring bandwidth, bytes/s
HOP_LATENCY_S = 3e-6          # per collective launch + hop
SINGLE_CHIP_P50_S = 2.235     # measured round-3 stage-2 story (BASELINE.md)
N_DEV = 8

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
               "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8, "c64": 8}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_COLL_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.+?)\s+"
    r"(all-gather|all-reduce|collective-permute|all-to-all|reduce-scatter)"
    r"(?:-start)?\(", re.M)
_GROUPS_RE = re.compile(r"replica_groups=\{\{([^}]*)\}")
# iota v2 form: replica_groups=[num_groups,group_size]<=[...]
_GROUPS_IOTA_RE = re.compile(r"replica_groups=\[(\d+),(\d+)\]")
_PAIRS_RE = re.compile(r"source_target_pairs=\{([^}]*)\}")


def shape_bytes(type_str: str) -> int:
    """Total bytes of an HLO result type (handles tuples)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def parse_computations(hlo: str):
    """Split HLO text into {computation_name: body_text}.

    Brace-depth tracking: computation signatures may wrap over several
    lines (long tuple types), so the name is remembered from the last
    column-0 `%name (`-style line and bound when the opening brace takes
    depth 0 -> 1. Braces inside a single instruction line (replica_groups,
    backend_config JSON) are balanced per line."""
    comps = {}
    cur = None
    buf = []
    depth = 0
    pending = None
    for line in hlo.splitlines():
        if depth == 0:
            m = re.match(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s*\(", line)
            if m:
                pending = m.group(1)
        delta = line.count("{") - line.count("}")
        if depth == 0:
            if delta > 0 and pending is not None:
                cur = pending
                buf = []
                depth = delta
            continue
        depth += delta
        if depth <= 0:
            comps[cur] = "\n".join(buf)
            cur = None
            depth = 0
        else:
            buf.append(line)
    return comps


def find_while_bodies(hlo: str):
    """Names of computations used as while-loop bodies."""
    return set(re.findall(r"while\([^)]*\)[^\n]*body=%?([\w.\-]+)", hlo))


def collective_cost(kind: str, nbytes: int, group: int) -> float:
    """ICI bytes RECEIVED per chip for one collective (ring algorithms)."""
    g = max(group, 2)
    if kind == "all-gather":
        # nbytes is the gathered (output) size
        return nbytes * (g - 1) / g
    if kind == "reduce-scatter":
        return nbytes * (g - 1) / g
    if kind == "all-reduce":
        return 2 * nbytes * (g - 1) / g
    if kind == "collective-permute":
        return nbytes
    if kind == "all-to-all":
        return nbytes * (g - 1) / g
    return nbytes


def audit_hlo(hlo: str, steps: int):
    """Extract collectives; ops inside while bodies count `steps` times.
    Rows carry the computation name so multi-loop programs (the full
    two-stage pipeline has two scans) can attribute comm per loop."""
    comps = parse_computations(hlo)
    bodies = find_while_bodies(hlo)
    rows = []
    for cname, body in comps.items():
        mult = steps if cname in bodies else 1
        for m in _COLL_RE.finditer(body):
            _, type_str, kind = m.groups()
            nbytes = shape_bytes(type_str)
            line = body[m.start():body.find("\n", m.start())]
            if "-start(" in line:
                # async form: the result is a tuple carrying operand AND
                # output buffers — halving avoids double-counting (the sync
                # form counts the output only)
                nbytes //= 2
            # group size: {{0,1,...},...} braces, iota [n_groups,g]<=[...]
            # (what this JAX emits — the brace-only parser silently
            # defaulted every collective to g=2 and undercounted 8-way
            # rings by ~43%), or permute pairs (pairwise)
            g = 2
            gm = _GROUPS_RE.search(line)
            gi = _GROUPS_IOTA_RE.search(line)
            if gm:
                g = len([x for x in gm.group(1).split(",") if x.strip()])
            elif gi:
                g = int(gi.group(2))
            elif _PAIRS_RE.search(line):
                g = 2
            rows.append({"kind": kind, "bytes": nbytes, "group": g,
                         "mult": mult, "in_loop": cname in bodies,
                         "comp": cname})
    return rows


def summarize(rows):
    per_kind = {}
    total_ici = 0.0
    total_count = 0
    for r in rows:
        cost = collective_cost(r["kind"], r["bytes"], r["group"]) * r["mult"]
        total_ici += cost
        total_count += r["mult"]
        k = r["kind"]
        agg = per_kind.setdefault(k, {"count": 0, "ici_bytes": 0.0})
        agg["count"] += r["mult"]
        agg["ici_bytes"] += cost
    return per_kind, total_ici, total_count


def build_sampler(mesh, steps, tiny=False):
    sys.path.insert(0, ".")
    import bench

    sampler, unet_p, fusion_p, cond, f, _ = bench.build(
        tiny=tiny, params_dtype="bfloat16", mesh=mesh)
    import dataclasses

    sampler = dataclasses.replace(sampler, num_steps=steps)

    def abstract(t):
        return jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), t)

    return sampler, abstract(unet_p), abstract(fusion_p), abstract(cond)


VARIANTS = {
    "space4": dict(cfg=2, frame=1),
    "frame4": dict(cfg=2, frame=4),
    "f2s2": dict(cfg=2, frame=2),
}


def frame_pad_waste(frame_ax: int, f: int = 5) -> float:
    """Compute inflation from GSPMD padding f frames over the frame axis."""
    if frame_ax <= 1:
        return 1.0
    per = -(-f // frame_ax)  # ceil
    return per * frame_ax / f


# ---- full two-stage pipeline audit (VERDICT r4 #2) -------------------------
# Measured single-chip component attribution (BASELINE.md round-3 profile,
# op-execution counts): the ratios are what matter; the absolute scale is
# re-anchored to the measured full-pipeline p50 below.
FULL_SINGLE_CHIP_P50_S = 3.26   # bench.py --full-pipeline, round 4
_COMPONENT_S = {"stage2": 2.65, "prior": 0.73, "encoders": 0.19,
                "vae": 0.09}


def audit_full_pipeline(args):
    """Compile the FULL two-stage sharded `pipeline.generate` (both text
    towers + vision tower + prior loop + stage-2 DDIM loop + VAE
    encode/decode, 512 px SD1.5 scale) over the 8-device CPU mesh with
    abstract params, audit every collective, and model the v5e-8 FULL-story
    p50 — the unit the <=2 s target actually prices
    (`/root/reference/stage2_batchtest_rcdms_model.py:364-376`).

    The compute model shards each component by its own axes:
      stage2   1/8 x frame-pad waste (cfg 2 x frame x space)
      prior    1/8 x pad waste over (frame x space) — the prior maps its
               f axis over BOTH axes (sample/prior_sampler.py)
      encoders 1/8 x 1.6 (the (b*f)=5 image / 2(b*f)=10 token batches pad
               to the 8-device extent)
      vae      1/8 (H-sharded; H divides evenly at every scale)
    """
    import dataclasses

    from rcdms_tpu.cli import evaluate
    from rcdms_tpu.cli.common import set_lazy_zero_init
    from rcdms_tpu.ops.attention import configure_for_mesh
    from rcdms_tpu.sample.pipeline import StoryInputs
    from rcdms_tpu.train.sharding import inference_mesh

    S = jax.ShapeDtypeStruct
    if args.tiny:
        from rcdms_tpu.sample.pipeline import build_tiny_pipeline

        pipeline, params, real_inputs = build_tiny_pipeline(
            num_steps=args.steps)
        inputs = jax.tree_util.tree_map(
            lambda x: S(x.shape, x.dtype), real_inputs)
    else:
        set_lazy_zero_init(True)
        eargs = evaluate.parse_args([
            "--dtype", "bfloat16", "--shard-story",
            "--num-inference-steps", str(args.steps),
            "--guidance-scale", "2.0"])
        pipeline, params, _, ds_cfg = evaluate.build_pipeline(eargs)
        b, f = 1, ds_cfg.num_frames
        size, csize = ds_cfg.image_size, ds_cfg.clip_size
        t1 = pipeline.text_encoder_s1.cfg.max_positions
        t2 = pipeline.text_encoder_s2.cfg.max_positions
        inputs = StoryInputs(
            tokens_s1=S((b, f, t1), np.int32),
            tokens_s1_u=S((b, f, t1), np.int32),
            tokens_s2=S((b, f, t2), np.int32),
            tokens_s2_u=S((b, f, t2), np.int32),
            source_clip=S((b, f, csize, csize, 3), np.float32),
            mask_clip=S((b, f, csize, csize, 3), np.float32),
            source_pixels=S((b, f, size, size, 3), np.float32),
            frame_known=S((b, f), np.bool_))
    params = jax.tree_util.tree_map(
        lambda x: S(x.shape, x.dtype), params)

    scale = FULL_SINGLE_CHIP_P50_S / sum(_COMPONENT_S.values())
    results = {}
    for name in args.variants.split(","):
        spec = VARIANTS[name]
        mesh = inference_mesh(jax.devices(), frame=spec["frame"])
        configure_for_mesh(mesh)
        frame_ax = mesh.shape["frame"]
        space_ax = mesh.shape["space"]
        pl2 = dataclasses.replace(
            pipeline, mesh=mesh,
            prior_sampler=dataclasses.replace(pipeline.prior_sampler,
                                              mesh=mesh),
            story_sampler=dataclasses.replace(pipeline.story_sampler,
                                              mesh=mesh))
        print(f"== full pipeline [{name}]: mesh {dict(mesh.shape)} ==",
              flush=True)
        compiled = jax.jit(pl2.generate).lower(
            params, inputs, S((2,), np.uint32)).compile()
        hlo = compiled.as_text()
        if args.dump_hlo:
            os.makedirs(args.dump_hlo, exist_ok=True)
            with open(f"{args.dump_hlo}/full_{name}.hlo", "w") as fh:
                fh.write(hlo)
        rows = audit_hlo(hlo, args.steps)
        for r in rows:
            if r["in_loop"]:
                r["mult"] = args.model_steps
        per_kind, ici_bytes, n_coll = summarize(rows)
        # attribute in-loop comm per while body (two scans: prior, stage-2)
        per_loop = {}
        for r in rows:
            if r["in_loop"]:
                cost = collective_cost(r["kind"], r["bytes"],
                                       r["group"]) * r["mult"]
                agg = per_loop.setdefault(r["comp"],
                                          {"count": 0, "ici_bytes": 0.0})
                agg["count"] += r["mult"]
                agg["ici_bytes"] += cost

        comp = {
            "stage2": _COMPONENT_S["stage2"] * scale
            * frame_pad_waste(frame_ax) / N_DEV,
            "prior": _COMPONENT_S["prior"] * scale
            * frame_pad_waste(frame_ax * space_ax) / N_DEV,
            "encoders": _COMPONENT_S["encoders"] * scale
            * frame_pad_waste(N_DEV // mesh.shape["cfg"]) / N_DEV,
            "vae": _COMPONENT_S["vae"] * scale / N_DEV,
        }
        compute_s = sum(comp.values())
        comm_s = ici_bytes / ICI_GBPS_PER_CHIP + n_coll * HOP_LATENCY_S
        res = {
            "mesh": dict(mesh.shape),
            "collectives": per_kind,
            "n_collectives_total": n_coll,
            "ici_bytes_per_chip": ici_bytes,
            "per_loop_ici": per_loop,
            "modeled_compute_s": {k: round(v, 4) for k, v in comp.items()},
            "modeled_compute_total_s": round(compute_s, 3),
            "modeled_comm_s": round(comm_s, 3),
            "modeled_full_story_p50_s": round(compute_s + comm_s, 3),
        }
        results[name] = res
        print(json.dumps(res, indent=2), flush=True)

    best = min(results,
               key=lambda k: results[k]["modeled_full_story_p50_s"])
    print(f"\nBEST full-pipeline: {best} "
          f"({results[best]['modeled_full_story_p50_s']} s modeled)")
    print(json.dumps({"full_audit": results, "best": best}))
    return results


def audit_train_step(args):
    """Compile the FULL-SCALE stage-2 train step (fp32 params + Adam,
    ZeRO-2 over an 8-device ('data',) mesh, remat) and audit its
    collectives — BASELINE config #5's multi-chip half, quantitative.
    Compile-only: params/opt state stay abstract (ShapeDtypeStructs), so
    no 14 GiB materializes."""
    import jax.numpy as jnp

    from rcdms_tpu.configs import (
        FusionConfig,
        MeshConfig,
        OptimizerConfig,
        StoryUNetConfig,
        TemporalConfig,
    )
    from rcdms_tpu.models.fusion import FusionModule
    from rcdms_tpu.models.unet3d import StoryUNet
    from rcdms_tpu.train.loop import make_sharded_train_step
    from rcdms_tpu.train.optim import make_optimizer
    from rcdms_tpu.train.sharding import make_mesh
    from rcdms_tpu.train.stage2 import Stage2Batch, Stage2Trainer
    from rcdms_tpu.train.train_state import TrainState

    trainer = Stage2Trainer(
        StoryUNet(StoryUNetConfig(remat=True, temporal=TemporalConfig()),
                  dtype=jnp.bfloat16),
        FusionModule(FusionConfig(), dtype=jnp.bfloat16))
    b, f, hw, t = 8, 5, 64, 91

    def abstract(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)

    batch = Stage2Batch(
        latents=jax.ShapeDtypeStruct((b, f, hw, hw, 4), np.float32),
        masked_latents=jax.ShapeDtypeStruct((b, f, hw, hw, 4), np.float32),
        mask_label=jax.ShapeDtypeStruct((b, f, hw, hw, 1), np.float32),
        image_tokens=jax.ShapeDtypeStruct((b, f, 257, 1664), jnp.bfloat16),
        image_proj=jax.ShapeDtypeStruct((b, f, 1280), jnp.bfloat16),
        text_hidden=jax.ShapeDtypeStruct((b, f, t, 768), jnp.bfloat16),
        frame_known=jax.ShapeDtypeStruct((b, f), bool),
    )
    cbatch = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), batch)
    params_s = jax.eval_shape(lambda k: trainer.init_params(k, cbatch),
                              jax.random.PRNGKey(0))
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-5, warmup_steps=0,
                                        grad_clip_norm=1.0))
    state_s = jax.eval_shape(lambda p: TrainState.create(p, tx), params_s)

    mesh = make_mesh(MeshConfig())
    results = {}
    for variant in args.grad_variants.split(","):
        step = make_sharded_train_step(
            trainer.train_step, state_s, mesh, zero2=True, donate=False,
            loss_fn=trainer.loss_fn if variant != "none" else None,
            grad_sharding=variant if variant != "none" else None)
        print(f"== train step [{variant}]: mesh {dict(mesh.shape)}, "
              f"global batch {b}, fp32 params + Adam, ZeRO-2, remat ==",
              flush=True)
        compiled = step.lower(state_s, batch,
                              jax.ShapeDtypeStruct((2,),
                                                   np.uint32)).compile()
        hlo = compiled.as_text()
        if args.dump_hlo:
            os.makedirs(args.dump_hlo, exist_ok=True)
            with open(f"{args.dump_hlo}/train_step_{variant}.hlo",
                      "w") as fh:
                fh.write(hlo)
        rows = audit_hlo(hlo, 1)
        per_kind, ici_bytes, n_coll = summarize(rows)
        # compute: measured single-chip bf16-state step was 0.505 s at
        # batch 1 with remat (fp32 master weights add Adam HBM passes)
        compute_s = 0.505  # per chip, batch 1 each => global batch 8
        comm_s = ici_bytes / ICI_GBPS_PER_CHIP + n_coll * HOP_LATENCY_S
        res = {
            "collectives": per_kind,
            "n_collectives": n_coll,
            "ici_bytes_per_chip": ici_bytes,
            "modeled_v5e8_step_s": round(compute_s + comm_s, 3),
            "of_which_comm_s": round(comm_s, 3),
        }
        results[variant] = res
        print(json.dumps(res, indent=2), flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true",
                    help="audit the sharded full-scale TRAIN step instead "
                         "of the inference sampler")
    ap.add_argument("--full", action="store_true",
                    help="audit the FULL two-stage pipeline (towers + "
                         "prior + stage-2 + VAE) instead of the stage-2 "
                         "sampler alone — models the v5e-8 full-story p50")
    ap.add_argument("--grad-variants", default="none,replicated,zero2",
                    help="(--train) gradient sharding-constraint variants "
                         "to audit: none (propagation decides), "
                         "replicated (pure-DP all-reduce), zero2 "
                         "(reduce-scatter to the opt-state shardings)")
    ap.add_argument("--variants", default="space4,frame4,f2s2")
    ap.add_argument("--steps", type=int, default=2,
                    help="scan length for the audited program (collectives "
                         "per step are length-independent)")
    ap.add_argument("--model-steps", type=int, default=20,
                    help="DDIM steps the latency model scales to")
    ap.add_argument("--dump-hlo", default=None,
                    help="directory to write compiled HLO text per variant")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model (validates the parsing machinery; "
                         "collective BYTES are not representative)")
    ap.add_argument("--kernels", action="store_true",
                    help="compile with the Pallas kernels forced on "
                         "(interpret mode): audits the custom-partitioned "
                         "kernel path instead of the XLA-attention path — "
                         "collective volume should match the einsum "
                         "formulation (KV gathers only)")
    args = ap.parse_args()

    if args.train:
        audit_train_step(args)
        return
    if args.full:
        if args.kernels:
            from rcdms_tpu.ops import flash
            from rcdms_tpu.ops.attention import set_default_attention_impl

            flash.set_kernel_interpret(True)
            set_default_attention_impl("pallas")
        audit_full_pipeline(args)
        return

    from rcdms_tpu.train.sharding import inference_mesh

    if args.kernels:
        from rcdms_tpu.ops import flash
        from rcdms_tpu.ops.attention import set_default_attention_impl

        flash.set_kernel_interpret(True)
        set_default_attention_impl("pallas")

    results = {}
    for name in args.variants.split(","):
        spec = VARIANTS[name]
        mesh = inference_mesh(jax.devices(), frame=spec["frame"])
        if args.kernels:
            from rcdms_tpu.ops.attention import configure_for_mesh

            configure_for_mesh(mesh)
        print(f"== {name}: mesh {dict(mesh.shape)} ==", flush=True)
        sampler, unet_p, fusion_p, cond = build_sampler(mesh, args.steps,
                                                        tiny=args.tiny)
        lowered = jax.jit(sampler.__call__).lower(
            unet_p, fusion_p, cond,
            jax.ShapeDtypeStruct((2,), np.uint32))
        compiled = lowered.compile()
        hlo = compiled.as_text()
        if args.dump_hlo:

            os.makedirs(args.dump_hlo, exist_ok=True)
            with open(f"{args.dump_hlo}/{name}.hlo", "w") as fh:
                fh.write(hlo)
        rows = audit_hlo(hlo, args.steps)
        # rescale in-loop ops from the audited scan length to model steps
        for r in rows:
            if r["in_loop"]:
                r["mult"] = args.model_steps
        per_kind, ici_bytes, n_coll = summarize(rows)

        waste = frame_pad_waste(spec["frame"])
        compute_s = SINGLE_CHIP_P50_S * waste / N_DEV
        comm_s = ici_bytes / ICI_GBPS_PER_CHIP + n_coll * HOP_LATENCY_S
        model_s = compute_s + comm_s
        res = {
            "mesh": dict(mesh.shape),
            "collectives": per_kind,
            "n_collectives_total": n_coll,
            "ici_bytes_per_chip": ici_bytes,
            "pad_waste": waste,
            "modeled_compute_s": round(compute_s, 3),
            "modeled_comm_s": round(comm_s, 3),
            "modeled_story_p50_s": round(model_s, 3),
        }
        results[name] = res
        print(json.dumps(res, indent=2), flush=True)

    best = min(results, key=lambda k: results[k]["modeled_story_p50_s"])
    print(f"\nBEST: {best} "
          f"({results[best]['modeled_story_p50_s']} s modeled)")
    print(json.dumps({"audit": results, "best": best}))


if __name__ == "__main__":
    main()
