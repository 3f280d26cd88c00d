"""Convert-CLI round trip: convert once (tiny synthetic weights) ->
evaluate loads the full tree via --converted-ckpt and produces the SAME
story as the in-memory params."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_convert_then_evaluate_roundtrip(tmp_path, capsys):
    from rcdms_tpu.cli import convert, evaluate

    out = str(tmp_path / "converted")
    convert.main(["--synthetic", "--output-dir", out])
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed["components"] == sorted(
        ["text_s1", "text_s2", "vision", "vae", "prior", "unet", "fusion"])
    assert os.path.isdir(out)

    # evaluate with the converted tree == evaluate with fresh-built params
    # (same synthetic seed -> identical fresh params, so outputs match)
    e1 = str(tmp_path / "eval_fresh")
    evaluate.main(["--synthetic", "--mode", "continue", "--output-dir", e1,
                   "--num-stories", "1", "--num-inference-steps", "2"])
    e2 = str(tmp_path / "eval_conv")
    evaluate.main(["--synthetic", "--mode", "continue", "--output-dir", e2,
                   "--num-stories", "1", "--num-inference-steps", "2",
                   "--converted-ckpt", out])
    m1 = json.loads(open(os.path.join(e1, "metrics_0.jsonl")).read())
    m2 = json.loads(open(os.path.join(e2, "metrics_0.jsonl")).read())
    assert m1["ssim"] == pytest.approx(m2["ssim"], abs=1e-6)
    assert m1["clip_cosine"] == pytest.approx(m2["clip_cosine"], abs=1e-6)

    # a non-convert checkpoint is rejected with a clear error
    from rcdms_tpu.io.checkpoint import save_checkpoint

    bogus = str(tmp_path / "bogus")
    save_checkpoint(bogus, 0, {"params": {"x": np.zeros(2)}}, {})
    with pytest.raises(Exception):
        evaluate.main(["--synthetic", "--output-dir",
                       str(tmp_path / "e3"), "--num-stories", "1",
                       "--num-inference-steps", "2",
                       "--converted-ckpt", bogus])
