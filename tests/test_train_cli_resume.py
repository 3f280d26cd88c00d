"""Train-CLI checkpoint/resume round trip (the reference's
`--resume_from_checkpoint` restart semantics, `train_stage1.py:57-74`,
`:280-291`): train 2 steps, checkpoint, resume, and verify the run
continues from the saved step with restored optimizer state."""

import os

import numpy as np
import pytest

from rcdms_tpu.cli.train_stage1 import main as train_stage1
from rcdms_tpu.io.checkpoint import restore_checkpoint

pytestmark = pytest.mark.slow  # compile-heavy; excluded from -m 'not slow'


def _latest_step(ckpt_dir):
    steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    return max(steps)


def test_stage1_cli_checkpoint_and_resume(tmp_path, capsys):
    out = str(tmp_path / "run")
    common = ["--synthetic", "--batch-size", "8", "--log-every", "1",
              "--checkpointing-steps", "2", "--output-dir", out]

    train_stage1(common + ["--max-train-steps", "2"])
    assert _latest_step(out) == 2

    train_stage1(common + ["--max-train-steps", "4",
                           "--resume-from-checkpoint", out])
    printed = capsys.readouterr().out
    assert "resumed from step 2" in printed
    assert "step 2 loss" in printed  # continued at step 2, not 0
    assert _latest_step(out) == 4

    # the final checkpoint restores with a consistent step counter
    restored, meta, step = restore_checkpoint(out, None)
    assert step == 4
    assert meta["last_global_step"] == 4
    assert int(np.asarray(restored["step"])) == 4
