"""Background prefetch + preemption-safe training (SURVEY.md §5 gap: the
reference has no recovery story beyond manual restarts)."""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from rcdms_tpu.data.prefetch import PrefetchIterator
from rcdms_tpu.utils.preemption import PreemptionGuard


def test_prefetch_preserves_order_and_values():
    it = PrefetchIterator(iter(range(100)), depth=2)
    assert list(it) == list(range(100))


def test_prefetch_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = PrefetchIterator(gen(), depth=1)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_prefetch_overlaps_production():
    """The producer runs ahead while the consumer is busy."""
    times = []

    def gen():
        for i in range(3):
            times.append(time.perf_counter())
            yield i

    it = PrefetchIterator(gen(), depth=2)
    time.sleep(0.3)  # consumer busy; producer should have filled the queue
    assert len(times) >= 2
    assert list(it) == [0, 1, 2]


def test_preemption_guard_flag():
    guard = PreemptionGuard.install(signals=())
    assert not guard.should_stop
    guard.trigger()
    assert guard.should_stop
    guard.uninstall()


_WORKER = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
import sys
from rcdms_tpu.cli import train_stage2
# many steps; the parent SIGTERMs us long before they finish
train_stage2.main(["--synthetic", "--output-dir", sys.argv[1],
                   "--max-train-steps", "100000", "--batch-size", "2",
                   "--checkpointing-steps", "100000", "--log-every", "1"])
print("EXITED-CLEANLY", flush=True)
"""


@pytest.mark.slow
def test_sigterm_saves_checkpoint_and_resumes(tmp_path):
    out = str(tmp_path / "run")
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    proc = subprocess.Popen([sys.executable, str(worker), out],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, env=env, text=True)
    # wait for the first logged step (compile done), then preempt
    deadline = time.time() + 600
    first_line = None
    for line in proc.stdout:
        if line.startswith("step "):
            first_line = line
            break
        assert time.time() < deadline, "no training step before deadline"
    assert first_line is not None
    proc.send_signal(signal.SIGTERM)
    rest, _ = proc.communicate(timeout=300)
    assert proc.returncode == 0, rest[-2000:]
    assert "preempted: checkpoint saved at step" in rest

    # a checkpoint exists at the preempted step, with the preempted marker
    # in its metadata JSON
    import glob

    ckpts = [d for d in os.listdir(out) if d.isdigit()]
    assert ckpts, os.listdir(out)
    step = max(int(c) for c in ckpts)
    meta_files = glob.glob(os.path.join(out, str(step), "metadata", "*"))
    assert meta_files, os.listdir(os.path.join(out, str(step)))
    meta = json.loads(open(meta_files[0]).read())
    assert meta.get("preempted") is True
    assert meta["last_global_step"] == step

def test_prefetch_close_unblocks_blocked_producer():
    """close() must terminate a producer blocked in put() without
    deadlocking on the sentinel (review finding: the finally-put could
    block forever on a full queue)."""
    import itertools

    from rcdms_tpu.data.prefetch import PrefetchIterator

    it = PrefetchIterator(itertools.count(), depth=1)
    assert next(it) == 0  # producer now blocked refilling the queue
    it.close()
    it._thread.join(timeout=5)
    assert not it._thread.is_alive()
    # idempotent
    it.close()


def test_required_feeder_depth():
    from rcdms_tpu.data.prefetch import required_feeder_depth

    # consumer-held + queued + in-flight pack
    assert required_feeder_depth(1) == 3
    assert required_feeder_depth(2) == 4


def test_should_stop_global_single_process():
    """On a single process the collective stop flag equals the local flag
    (multi-host agreement is exercised by the 2-process multihost
    harness)."""
    from rcdms_tpu.utils.preemption import PreemptionGuard

    guard = PreemptionGuard()
    assert not guard.should_stop_global()
    guard.trigger()
    assert guard.should_stop_global()


def test_geglu_fp32_blocks_respect_vmem():
    """The measured-best bf16 block table must not be applied to fp32
    inputs when it busts the kernel's VMEM limit (review finding)."""
    from rcdms_tpu.ops.geglu import (
        VMEM_BUDGET,
        _pick_block,
        _vmem_estimate,
    )

    bf16 = _pick_block(4096, 320, 1280, 2)
    assert bf16 == (1024, 1280)  # sweep winner applies at bf16
    fp32 = _pick_block(4096, 320, 1280, 4)
    assert fp32 is not None  # still tileable...
    assert _vmem_estimate(*fp32, 320, 4) <= VMEM_BUDGET  # ...within budget
