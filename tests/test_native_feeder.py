"""Native C++ feeder vs numpy protocol parity (skipped when the .so isn't
built — `make -C native`). The feeder's bicubic resize replicates PIL's
fixed-point resampling BIT-EXACTLY, so every packed tensor must equal the
python protocol output exactly — enabling the feeder can never change
training numerics."""

import ctypes
import os

import numpy as np
import pytest

from rcdms_tpu.configs import DatasetConfig
from rcdms_tpu.data import native_feeder
from rcdms_tpu.data.protocol import (
    StoryTokenizer,
    build_story_example,
    clip_preprocess,
    pixel_preprocess,
)

pytestmark = pytest.mark.skipif(not native_feeder.available(),
                                reason="libstory_feeder.so not built")


def _resize_native(img, oh, ow):
    lib = native_feeder.load_library()
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.resize_bicubic.restype = None
    lib.resize_bicubic.argtypes = [u8p] + [ctypes.c_int] * 4 + [u8p]
    out = np.empty((oh, ow, 3), np.uint8)
    img = np.ascontiguousarray(img)
    lib.resize_bicubic(img.ctypes.data_as(u8p), img.shape[0], img.shape[1],
                       oh, ow, out.ctypes.data_as(u8p))
    return out


def test_resize_bicubic_matches_pil_exactly():
    from PIL import Image

    rng = np.random.RandomState(0)
    for (h, w, oh, ow) in [(128, 128, 512, 512), (128, 128, 224, 224),
                           (97, 133, 224, 307), (512, 512, 64, 64),
                           (70, 130, 224, 416)]:
        img = rng.randint(0, 256, (h, w, 3), np.uint8)
        want = np.asarray(Image.fromarray(img).resize((ow, oh),
                                                      Image.BICUBIC))
        np.testing.assert_array_equal(_resize_native(img, oh, ow), want)


def test_native_pack_matches_protocol_exactly():
    cfg = DatasetConfig(image_size=64, clip_size=28)
    rng = np.random.RandomState(0)
    # non-square, non-identity sizes exercise the full resize path
    frames = rng.randint(0, 255, (5, 48, 80, 3), np.uint8)
    feeder = native_feeder.NativeFeeder(num_threads=2)
    out = feeder.pack_batch([frames], [2], size=64, csize=28)
    feeder.close()

    tok = StoryTokenizer(cfg)
    ref = build_story_example(list(frames), ["c"] * 5, 2, tok, cfg=cfg)

    for key in ("target", "source", "reference_clip", "source_clip",
                "mask_clip", "mask_label"):
        np.testing.assert_array_equal(out[key][0], ref[key], err_msg=key)
    assert out["frame_known"][0].tolist() == ref["frame_known"].tolist()


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


def _write_tiny_h5(path, n=4, f=5, row=48):
    import cv2
    import h5py

    rng = np.random.RandomState(7)
    with h5py.File(path, "w") as hf:
        grp = hf.create_group("train")
        dt = h5py.vlen_dtype(np.uint8)
        for i in range(f):
            ds = grp.create_dataset(f"image{i}", (n,), dtype=dt)
            for j in range(n):
                # stack of 2 candidate frames, JPEG-encoded
                img = rng.randint(0, 256, (2 * row, row, 3), np.uint8)
                ok, enc = cv2.imencode(".jpg", img)
                assert ok
                ds[j] = np.frombuffer(enc.tobytes(), np.uint8)
        texts = [("|".join(f"story {j} frame {i}" for i in range(f))).encode()
                 for j in range(n)]
        grp.create_dataset("text", data=texts)


def test_dataset_native_batches_match_python(tmp_path):
    pytest.importorskip("h5py")
    pytest.importorskip("cv2")
    from rcdms_tpu.data.datasets import StoryH5Dataset

    path = str(tmp_path / "tiny.h5")
    _write_tiny_h5(path)
    cfg = DatasetConfig(h5_path=path, image_size=64, clip_size=28)

    py = StoryH5Dataset(cfg, "train")
    nat = StoryH5Dataset(cfg, "train", use_native_feeder=True,
                         feeder_threads=2)
    b_py = next(py.batches(2, seed=3))
    b_nat = next(nat.batches(2, seed=3))
    assert set(b_py) == set(b_nat)
    for key in b_py:
        np.testing.assert_array_equal(b_py[key], b_nat[key], err_msg=key)


def test_resize_bilinear_matches_pil_exactly():
    """The pixel path's BILINEAR resize (reference transforms.Resize
    default — `mydatasets/flintstones.py:78`) replicates PIL bit-exactly,
    like the bicubic CLIP path."""
    import ctypes

    from PIL import Image

    lib = native_feeder.load_library()
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.resize_bilinear.restype = None
    lib.resize_bilinear.argtypes = [u8p] + [ctypes.c_int] * 4 + [u8p]
    rng = np.random.default_rng(11)
    for (h, w), (oh, ow) in [((128, 128), (512, 512)),
                             ((300, 200), (64, 64)),
                             ((57, 91), (128, 128))]:
        img = np.ascontiguousarray(
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
        out = np.empty((oh, ow, 3), np.uint8)
        lib.resize_bilinear(img.ctypes.data_as(u8p), h, w, oh, ow,
                            out.ctypes.data_as(u8p))
        ref = np.asarray(Image.fromarray(img).resize((ow, oh),
                                                     Image.BILINEAR))
        np.testing.assert_array_equal(out, ref)
