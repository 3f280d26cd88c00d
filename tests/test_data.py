"""Data protocol tests: masking semantics, CLIP preprocessing stats,
tokenizer fallback, collate layout, synthetic dataset determinism."""

import os

import pytest

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from rcdms_tpu.configs import DatasetConfig
from rcdms_tpu.data.datasets import SyntheticStoryDataset
from rcdms_tpu.data.protocol import (
    StoryTokenizer,
    build_story_example,
    clip_preprocess,
    collate,
    pixel_preprocess,
    white_image,
)


def _cfg():
    return DatasetConfig(image_size=64, clip_size=28)


def test_pixel_preprocess_range_and_shape():
    img = np.full((30, 40, 3), 255, np.uint8)
    out = pixel_preprocess(img, 64)
    assert out.shape == (64, 64, 3)
    np.testing.assert_allclose(out, 1.0, atol=1e-6)
    out0 = pixel_preprocess(np.zeros((30, 40, 3), np.uint8), 64)
    np.testing.assert_allclose(out0, -1.0, atol=1e-6)


def test_clip_preprocess_center_crop_and_norm():
    out = clip_preprocess(white_image(50), 28)
    assert out.shape == (28, 28, 3)
    # white pixel: (1 - mean) / std per channel
    expect = (1.0 - np.array([0.48145466, 0.4578275, 0.40821073])) / np.array(
        [0.26862954, 0.26130258, 0.27577711])
    np.testing.assert_allclose(out[0, 0], expect, atol=1e-5)
    # non-square input: shortest side scaled, center crop
    rect = np.zeros((100, 200, 3), np.uint8)
    rect[:, 90:110] = 255  # center stripe survives crop
    out = clip_preprocess(rect, 28)
    assert out.shape == (28, 28, 3)


def test_masking_protocol_known_prefix():
    cfg = _cfg()
    tok = StoryTokenizer(cfg)
    frames = [np.full((64, 64, 3), 40 * i, np.uint8) for i in range(5)]
    ex = build_story_example(frames, [f"cap {i}" for i in range(5)],
                             known_length=2, tokenizer=tok, cfg=cfg)
    assert ex["frame_known"].tolist() == [True, True, False, False, False]
    # unknown source frames are black (-1 after normalize)
    np.testing.assert_allclose(ex["source"][2:], -1.0, atol=1e-6)
    # known source frames equal the target
    np.testing.assert_allclose(ex["source"][:2], ex["target"][:2], atol=1e-6)
    # mask maps: ones for known, zeros for unknown, at size/8
    assert ex["mask_label"].shape == (5, 8, 8, 1)
    np.testing.assert_allclose(ex["mask_label"][:2], 1.0)
    np.testing.assert_allclose(ex["mask_label"][2:], 0.0)
    # clip mask images: white for known, black for unknown
    assert not np.allclose(ex["mask_clip"][0], ex["mask_clip"][4])
    # token shapes
    assert ex["input_ids"].shape == (5, cfg.max_text_len)
    assert ex["text_mask"].dtype == bool


def test_text_drop_produces_empty_caption_tokens():
    cfg = _cfg()
    tok = StoryTokenizer(cfg)
    frames = [np.zeros((64, 64, 3), np.uint8)] * 5
    ex_drop = build_story_example(frames, ["hello world"] * 5, 0, tok,
                                  cfg=cfg, text_drop_mask=[True] * 5)
    ex_keep = build_story_example(frames, ["hello world"] * 5, 0, tok,
                                  cfg=cfg, text_drop_mask=[False] * 5)
    assert not np.array_equal(ex_drop["input_ids"], ex_keep["input_ids"])
    # dropped caption = bos+eos only
    assert ex_drop["text_mask"][0].sum() == 2


def test_collate_shapes():
    ds = SyntheticStoryDataset(cfg=_cfg(), num_items=4)
    rng = np.random.RandomState(0)
    batch = collate([ds.example(i, rng) for i in range(2)])
    assert batch["target"].shape == (2, 5, 64, 64, 3)
    assert batch["input_ids"].shape[:2] == (2, 5)


def test_synthetic_batches_sharding_disjoint():
    ds = SyntheticStoryDataset(cfg=_cfg(), num_items=8)
    b0 = next(ds.batches(2, shard_id=0, num_shards=2))
    b1 = next(ds.batches(2, shard_id=1, num_shards=2))
    assert not np.array_equal(b0["target"], b1["target"])


def test_batches_raises_on_undersized_shard():
    """A shard smaller than batch_size must raise, not busy-spin forever
    (review finding)."""
    from rcdms_tpu.data.datasets import SyntheticStoryDataset

    ds = SyntheticStoryDataset()
    it = ds.batches(ds.num_items + 1)
    with pytest.raises(ValueError, match="batch_size"):
        next(it)
    it = ds.batches(4, shard_id=0, num_shards=ds.num_items)
    with pytest.raises(ValueError):
        next(it)


def test_hash_fallback_tokenizer_is_process_stable():
    """The fallback tokenizer must produce the same ids in a fresh process
    (builtin hash() is salted per process; crc32 is not)."""
    import json
    import subprocess
    import sys

    prog = (
        "import json, sys; sys.path.insert(0, %r);"
        "from rcdms_tpu.configs import DatasetConfig;"
        "from rcdms_tpu.data.protocol import StoryTokenizer;"
        "t = StoryTokenizer(DatasetConfig(name='pororosv', h5_path='x'));"
        "print(json.dumps(t(['pororo builds a snowman'])"
        "['input_ids'].tolist()))" % ROOT)
    outs = [
        json.loads(subprocess.run(
            [sys.executable, "-c", prog], capture_output=True, text=True,
            check=True).stdout.strip())
        for _ in range(2)
    ]
    assert outs[0] == outs[1]


def test_tokenizer_overflow_clamps(tmp_path):
    """Captions longer than max_text_len are truncated with a terminal EOS
    instead of crashing HF's array conversion (the reference would crash —
    flintstones.py:218-226 passes truncation=False + return_tensors)."""
    pytest.importorskip("transformers")
    import transformers

    try:
        # local_files_only: without it HF retries the hub with long
        # timeouts on this no-egress box (222 s test instead of 4 s)
        tok = transformers.CLIPTokenizer.from_pretrained(
            "openai/clip-vit-base-patch32", local_files_only=True)
    except Exception:
        pytest.skip("no local CLIP tokenizer files (no egress)")
    d = tmp_path / "tok"
    tok.save_pretrained(str(d))
    from rcdms_tpu.configs import DatasetConfig
    from rcdms_tpu.data.protocol import StoryTokenizer

    cfg = DatasetConfig(name="pororosv", h5_path="x")
    st = StoryTokenizer(cfg, str(d))
    long = "word " * (cfg.max_text_len + 30)
    out = st([long, "short caption"])
    assert out["input_ids"].shape == (2, cfg.max_text_len)
    assert out["input_ids"][0, -1] == st.eos_token_id
    assert out["attention_mask"][0].all()
    assert not out["attention_mask"][1].all()


def test_prefetch_next_after_close_stops():
    import itertools

    from rcdms_tpu.data.prefetch import PrefetchIterator

    it = PrefetchIterator(itertools.count(), depth=1)
    assert next(it) == 0
    it.close()
    with pytest.raises(StopIteration):
        next(it)
