"""Story generation CLI: captions (+ optional known reference frames) ->
5-frame story PNGs, running the full two-stage pipeline in one program.

    python -m rcdms_tpu.cli.generate \
        --caption "pororo waves hello" --caption "pororo builds a snowman" \
        --caption "crong joins in" --caption "they laugh together" \
        --caption "the sun sets" \
        --reference frame0.png \
        --sd-pretrained ... --prior-pretrained ... --vision-pretrained ... \
        --out story.png

Known frames are given in order with --reference (0 to 4 of them — the
reference pipeline's 'continue'/'visualization' modes generalized to any
known-prefix length). --synthetic runs tiny random models (smoke)."""

from __future__ import annotations

import argparse

import jax
import numpy as np

from rcdms_tpu.cli.evaluate import build_pipeline
from rcdms_tpu.cli.common import build_story_inputs
from rcdms_tpu.sample.eval import save_story_grid


def parse_args(argv=None):
    from rcdms_tpu.cli.evaluate import parse_args as eval_args

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--caption", action="append", required=True,
                   help="one per frame, in order (repeat 5x)")
    p.add_argument("--reference", action="append", default=[],
                   help="known frame image paths (prefix order)")
    p.add_argument("--negative-prompt", default="",
                   help="text for the unconditional CFG branch")
    p.add_argument("--out", default="story.png")
    # all model/source flags (--synthetic, --sd-pretrained, --stage{1,2}-ckpt,
    # --num-inference-steps, --guidance-scale, --seed, ...) are delegated to
    # the evaluate CLI's parser
    args, rest = p.parse_known_args(argv)
    args.eval = eval_args(rest)
    return args


def main(argv=None):
    args = parse_args(argv)
    from rcdms_tpu.cli.common import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    ev = args.eval
    # validate cheap flags BEFORE the (expensive) model build
    from rcdms_tpu.cli.common import dataset_from_args

    f = 5 if ev.synthetic else dataset_from_args(ev).num_frames
    captions = list(args.caption)
    if len(captions) != f:
        raise SystemExit(f"need exactly {f} --caption flags, got "
                         f"{len(captions)}")
    if len(args.reference) > f:
        raise SystemExit(f"at most {f} --reference frames")

    pipeline, params, dataset, ds_cfg = build_pipeline(ev)

    frames = []
    for path in args.reference:
        from PIL import Image

        frames.append(np.asarray(Image.open(path).convert("RGB")))

    inputs = build_story_inputs(captions, frames, args.negative_prompt,
                                dataset, ds_cfg)
    key = jax.random.PRNGKey(ev.seed)
    images, embeds = jax.jit(pipeline.generate)(params, inputs, key)
    save_story_grid(args.out, np.asarray(images[0]))
    print(f"wrote {args.out} ({f} frames, {len(frames)} known, "
          f"{ev.num_inference_steps} steps, cfg {ev.guidance_scale})")


if __name__ == "__main__":
    main()
