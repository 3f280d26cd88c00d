"""Converter unit tests (torch-free): DeepSpeed blob splitting, linear/conv
transposition conventions, merge_params shape guards."""

import numpy as np
import pytest

from rcdms_tpu.io.convert import (
    _conv,
    _conv1x1_as_dense,
    _linear,
    merge_params,
    resize_text_embeddings,
    split_deepspeed_blob,
)


def test_split_deepspeed_blob_prefixes():
    blob = {
        "module.seen_module.text_fc.weight": np.zeros((2, 3)),
        "unseen_module.vis_fc.bias": np.zeros(2),
        "unet.conv_in.weight": np.zeros((4, 9, 3, 3)),
        "unet.down_blocks.0.resnets.0.conv1.weight": np.zeros((4, 4, 3, 3)),
        "other.thing": np.zeros(1),
    }
    out = split_deepspeed_blob(blob)
    assert list(out["seen"]) == ["text_fc.weight"]
    assert list(out["unseen"]) == ["vis_fc.bias"]
    assert sorted(out["unet"]) == ["conv_in.weight",
                                   "down_blocks.0.resnets.0.conv1.weight"]
    assert list(out["rest"]) == ["other.thing"]


def test_linear_and_conv_transposition():
    sd = {"l.weight": np.arange(6.0).reshape(2, 3), "l.bias": np.ones(2),
          "c.weight": np.arange(24.0).reshape(2, 3, 2, 2),
          "p.weight": np.arange(6.0).reshape(2, 3, 1, 1)}
    lin = _linear(sd, "l")
    assert lin["kernel"].shape == (3, 2)
    np.testing.assert_array_equal(lin["kernel"],
                                  np.arange(6.0).reshape(2, 3).T)
    conv = _conv(sd, "c")
    assert conv["kernel"].shape == (2, 2, 3, 2)  # (kh, kw, in, out)
    dense = _conv1x1_as_dense(sd, "p")
    assert dense["kernel"].shape == (3, 2)


def test_merge_params_guards():
    fresh = {"a": np.zeros((2, 2)), "nested": {"b": np.zeros(3)}}
    merged = merge_params(fresh, {"nested": {"b": np.ones(3)}})
    np.testing.assert_array_equal(merged["nested"]["b"], 1.0)
    np.testing.assert_array_equal(merged["a"], 0.0)  # untouched leaf
    with pytest.raises(ValueError):
        merge_params(fresh, {"a": np.zeros((3, 3))})  # shape mismatch
    with pytest.raises(KeyError):
        merge_params(fresh, {"zz": np.zeros(1)})


def test_resize_text_embeddings_preserves_and_grows():
    rng = np.random.RandomState(0)
    tok = rng.randn(10, 4).astype(np.float32)
    pos = rng.randn(5, 4).astype(np.float32)
    t2, p2 = resize_text_embeddings(tok, pos, 13, 8)
    assert t2.shape == (13, 4) and p2.shape == (8, 4)
    np.testing.assert_array_equal(t2[:10], tok)
    np.testing.assert_array_equal(p2[:5], pos)
    # shrink truncates
    t3, p3 = resize_text_embeddings(tok, pos, 6, 3)
    assert t3.shape == (6, 4) and p3.shape == (3, 4)
