"""Native C++ feeder vs numpy protocol parity (skipped when the .so isn't
built — `make -C native`)."""

import numpy as np
import pytest

from rcdms_tpu.configs import DatasetConfig
from rcdms_tpu.data import native_feeder
from rcdms_tpu.data.protocol import StoryTokenizer, build_story_example

pytestmark = pytest.mark.skipif(not native_feeder.available(),
                                reason="libstory_feeder.so not built")


def test_native_pack_matches_protocol():
    cfg = DatasetConfig(image_size=64, clip_size=28)
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (5, 64, 64, 3), np.uint8)
    feeder = native_feeder.NativeFeeder(num_threads=2)
    out = feeder.pack_batch([frames], [2], size=64, csize=28)
    feeder.close()

    tok = StoryTokenizer(cfg)
    ref = build_story_example(list(frames), ["c"] * 5, 2, tok, cfg=cfg)

    assert out["target"].shape == (1, 5, 64, 64, 3)
    # same-size input -> resize is identity; normalization must match exactly
    np.testing.assert_allclose(out["target"][0], ref["target"], atol=2e-3)
    np.testing.assert_allclose(out["source"][0], ref["source"], atol=2e-3)
    np.testing.assert_allclose(out["mask_label"][0], ref["mask_label"])
    assert out["frame_known"][0].tolist() == ref["frame_known"].tolist()
    # CLIP tensors: bilinear (native) vs bicubic (PIL) differ slightly on
    # downsampled content — check black/white mask images exactly instead
    np.testing.assert_allclose(out["mask_clip"][0], ref["mask_clip"],
                               atol=2e-2)


def test_native_feeder_many_stories_threads():
    rng = np.random.RandomState(1)
    stories = [rng.randint(0, 255, (5, 32, 32, 3), np.uint8)
               for _ in range(8)]
    feeder = native_feeder.NativeFeeder(num_threads=4)
    out = feeder.pack_batch(stories, [0, 1, 2, 3, 4, 0, 1, 2],
                            size=32, csize=28)
    feeder.close()
    assert out["target"].shape == (8, 5, 32, 32, 3)
    assert np.isfinite(out["target"]).all()
    np.testing.assert_allclose(out["source"][0], -1.0)  # known_length 0
