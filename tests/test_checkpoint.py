"""Orbax checkpoint save/restore round-trip with reference-style metadata."""

import jax.numpy as jnp
import numpy as np
import pytest

from rcdms_tpu.io.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)


def test_checkpoint_roundtrip(tmp_path):
    d = str(tmp_path / "ckpt")
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.asarray(7, jnp.int32)}
    save_checkpoint(d, 7, state, {"last_global_step": 7, "epoch": 1})
    save_checkpoint(d, 14, state, {"last_global_step": 14, "epoch": 2})
    assert latest_step(d) == 14

    target = {"params": {"w": jnp.zeros((2, 3))},
              "step": jnp.asarray(0, jnp.int32)}
    restored, meta, step = restore_checkpoint(d, target)
    assert step == 14
    assert meta["last_global_step"] == 14 and meta["epoch"] == 2
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    # explicit older step
    _, meta7, step7 = restore_checkpoint(d, target, step=7)
    assert step7 == 7 and meta7["epoch"] == 1


def test_restore_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        restore_checkpoint(str(tmp_path / "none"), {"x": jnp.zeros(1)})
