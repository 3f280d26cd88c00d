"""Story-generation CLI smoke: captions (+ a reference frame) -> story PNG
grid through the full two-stage pipeline on tiny synthetic models."""

import os

import numpy as np
import pytest

from rcdms_tpu.cli.generate import main

pytestmark = pytest.mark.slow  # compile-heavy; excluded from -m 'not slow'


def test_generate_cli_synthetic(tmp_path):
    from PIL import Image

    ref = tmp_path / "frame0.png"
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(ref)
    out = tmp_path / "story.png"

    argv = []
    for i in range(5):
        argv += ["--caption", f"caption number {i}"]
    argv += ["--reference", str(ref), "--out", str(out),
             "--synthetic", "--num-inference-steps", "2"]
    main(argv)

    assert out.exists()
    grid = np.asarray(Image.open(out))
    # 1xF grid of 64px synthetic frames plus per-frame files
    assert grid.shape[1] == 5 * grid.shape[0]
    for i in range(5):
        assert os.path.exists(str(tmp_path / f"story_frame{i}.png"))


def test_generate_cli_validates_caption_count():
    with pytest.raises(SystemExit):
        main(["--caption", "only one", "--synthetic"])
