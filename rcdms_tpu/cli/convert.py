"""One-shot checkpoint conversion CLI: torch pretrained bases (HF dirs)
and/or trained reference DeepSpeed blobs -> ONE native orbax checkpoint
holding the full pipeline param tree.

The reference vendors LDM->diffusers converters it never calls
(`src/utils/convert_from_ckpt.py`, dead code — SURVEY.md §2.6); here
conversion is a live workflow step: run it once, then point evaluate at
the result and skip the per-startup torch loads entirely.

    python -m rcdms_tpu.cli.convert \
        --sd-pretrained weights/stable-diffusion-v1-5 \
        --prior-pretrained weights/kandinsky-2-2-prior/prior \
        --text-s1-pretrained weights/kandinsky-2-2-prior/text_encoder \
        --vision-pretrained weights/kandinsky-2-2-prior/image_encoder \
        --rcdms-stage1-ckpt ckpts/stage1/latest-blob.pt \
        --rcdms-stage2-ckpt ckpts/stage2/latest-blob.pt \
        --out weights_jax/pororosv

    python -m rcdms_tpu.cli.evaluate --converted-ckpt weights_jax/pororosv ...

The saved tree matches `StoryPipeline`'s params exactly
({text_s1, text_s2, vision, vae, prior, unet, fusion})."""

from __future__ import annotations

import json
import os


def main(argv=None):
    from rcdms_tpu.cli import evaluate
    from rcdms_tpu.io.checkpoint import save_checkpoint

    parser_args = list(argv) if argv is not None else None
    # reuse evaluate's parser (same model/weights flags); --output-dir is
    # reused as the conversion target
    args = evaluate.parse_args(parser_args)
    pipeline, params, _, ds_cfg = evaluate.build_pipeline(args)

    out = args.output_dir
    os.makedirs(out, exist_ok=True)
    meta = {
        "kind": "rcdms_tpu-converted-pipeline",
        "dataset": args.dataset,
        "sources": {
            "sd_pretrained": args.sd_pretrained,
            "prior_pretrained": args.prior_pretrained,
            "text_s1_pretrained": args.text_s1_pretrained,
            "vision_pretrained": args.vision_pretrained,
            "rcdms_stage1_ckpt": args.rcdms_stage1_ckpt,
            "rcdms_stage2_ckpt": args.rcdms_stage2_ckpt,
            "stage1_ckpt": args.stage1_ckpt,
            "stage2_ckpt": args.stage2_ckpt,
        },
    }
    save_checkpoint(out, 0, {"params": params}, meta)
    n = sum(x.size for x in __import__("jax").tree_util.tree_leaves(params))
    print(json.dumps({"saved": out, "total_params": int(n),
                      "components": sorted(params.keys())}))


if __name__ == "__main__":
    main()
