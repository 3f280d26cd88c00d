"""Evaluate-CLI tests on tiny synthetic models: the three reference eval
protocols (visualization / continue / --autoreg) run end to end and write
metrics (`stage1_batchtest_rcdms_model.py:164-242`)."""

import json
import os

import numpy as np
import pytest

from rcdms_tpu.cli.evaluate import main


def _read_metrics(out_dir):
    with open(os.path.join(out_dir, "metrics_0.jsonl")) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    with open(os.path.join(out_dir, "summary_0.json")) as f:
        summary = json.load(f)
    return lines, summary


@pytest.mark.slow
def test_evaluate_autoreg_synthetic(tmp_path):
    out = str(tmp_path / "autoreg")
    main(["--synthetic", "--autoreg", "--mode", "visualization",
          "--output-dir", out, "--num-stories", "2",
          "--num-inference-steps", "2"])
    lines, summary = _read_metrics(out)
    assert len(lines) == 2
    assert all("clip_cosine" in m for m in lines)
    assert np.isfinite(summary["mean_clip_cosine"])
    assert "mean_ssim" not in summary  # stage-1-only protocol


@pytest.mark.slow
def test_evaluate_batched_synthetic(tmp_path):
    """--eval-batch 2 over 3 stories: one full chunk + one padded tail
    chunk, all three stories get metrics + grids."""
    out = str(tmp_path / "batched")
    main(["--synthetic", "--mode", "continue", "--output-dir", out,
          "--num-stories", "3", "--num-inference-steps", "2",
          "--eval-batch", "2"])
    lines, summary = _read_metrics(out)
    assert [m["story"] for m in lines] == [0, 1, 2]
    assert all({"ssim", "psnr", "clip_cosine"} <= set(m) for m in lines)
    assert summary["num_stories"] == 3
    for i in range(3):
        assert os.path.exists(os.path.join(out, f"story_{i}.png"))


@pytest.mark.slow
def test_evaluate_full_synthetic(tmp_path):
    out = str(tmp_path / "full")
    main(["--synthetic", "--mode", "continue", "--output-dir", out,
          "--num-stories", "1", "--num-inference-steps", "2"])
    lines, summary = _read_metrics(out)
    assert len(lines) == 1
    assert {"ssim", "psnr", "clip_cosine"} <= set(lines[0])
    assert -1.0 <= summary["mean_ssim"] <= 1.0  # SSIM range; random-model
    # output vs random GT is near 0, not near 1
    assert os.path.exists(os.path.join(out, "story_0.png"))


@pytest.mark.slow
def test_quantize_flag_sets_mode():
    """--quantize int8 must flip the global quant mode at build time (so
    the later jit traces take the w8a8 path) and reject unknown modes."""
    from rcdms_tpu.cli.evaluate import build_pipeline, parse_args
    from rcdms_tpu.ops import quant

    args = parse_args(["--synthetic", "--quantize", "int8"])
    assert args.quantize == "int8"
    try:
        build_pipeline(args)
        assert quant.int8_enabled()
    finally:
        quant.set_quant_mode(None)
    with pytest.raises(SystemExit):
        parse_args(["--synthetic", "--quantize", "int4"])
