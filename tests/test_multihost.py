"""Multi-host bring-up smoke: two REAL processes form a jax.distributed
cluster over CPU devices (the idiomatic stand-in for multi-host TPU — each
process sees only its local devices, the mesh spans all of them), run the
sharded stage-2 train step with process-sharded data, and must agree on the
loss. Mirrors the reference's `accelerate launch --num_processes 8`
semantics (`run_stage1_FlintstonesSV.sh:4`)."""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # spawns processes; compile-heavy

_WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)  # per process -> 4 global
import numpy as np

coord, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())
assert len(jax.local_devices()) == 2

from rcdms_tpu.configs import FusionConfig, MeshConfig, OptimizerConfig, \
    StoryUNetConfig
from rcdms_tpu.models.fusion import FusionModule
from rcdms_tpu.models.unet3d import StoryUNet
from rcdms_tpu.train.loop import make_sharded_train_step, place_state
from rcdms_tpu.train.optim import make_optimizer
from rcdms_tpu.train.sharding import make_mesh
from rcdms_tpu.train.stage2 import Stage2Batch, Stage2Trainer
from rcdms_tpu.train.train_state import TrainState
from jax.sharding import NamedSharding, PartitionSpec as P

ucfg = StoryUNetConfig.tiny()
fcfg = FusionConfig.tiny(hidden_dim=ucfg.cross_attention_dim,
                         text_dim=ucfg.cross_attention_dim)
trainer = Stage2Trainer(StoryUNet(ucfg), FusionModule(fcfg))

b_global, f, hw, t = 4, 5, 8, 7
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 6)
# every process builds the same GLOBAL batch deterministically, then places
# only its local shard (process-sharded data loading)
full = Stage2Batch(
    latents=jax.random.normal(ks[0], (b_global, f, hw, hw, 4)),
    masked_latents=jax.random.normal(ks[1], (b_global, f, hw, hw, 4)),
    mask_label=jax.numpy.ones((b_global, f, hw, hw, 1)),
    image_tokens=jax.random.normal(ks[2], (b_global, f, 9,
                                           fcfg.seen_vis_dim)),
    image_proj=jax.random.normal(ks[3], (b_global, f, fcfg.unseen_vis_dim)),
    text_hidden=jax.random.normal(ks[4], (b_global, f, t, fcfg.text_dim)),
    frame_known=jax.numpy.zeros((b_global, f), bool).at[:, :2].set(True),
)
params = trainer.init_params(ks[5], full)
tx = make_optimizer(OptimizerConfig(learning_rate=1e-4, warmup_steps=0))
state = TrainState.create(params, tx)

mesh = make_mesh(MeshConfig())
state = place_state(state, mesh, zero2=True)
sharding = NamedSharding(mesh, P("data"))

def place(x):
    x = np.asarray(x)
    def local_cb(index):
        return x[index]
    return jax.make_array_from_callback(x.shape, sharding, local_cb)

sbatch = jax.tree_util.tree_map(place, full)
step = make_sharded_train_step(trainer.train_step, state, mesh, zero2=True,
                               loss_fn=trainer.loss_fn,
                               grad_sharding="replicated")
state, loss = step(state, sbatch, jax.random.PRNGKey(1))

# --- REAL input path: per-process LOCAL batches -> global arrays ---------
from rcdms_tpu.data.datasets import SyntheticStoryDataset
from rcdms_tpu.train.sharding import global_batch, local_batch_size

ds = SyntheticStoryDataset()
lbs = local_batch_size(4)
assert lbs == 2, lbs  # each process decodes HALF the global batch
it = ds.batches(lbs, seed=0, shard_id=jax.process_index(),
                num_shards=jax.process_count())
raw = next(it)
assert raw["target"].shape[0] == lbs, raw["target"].shape  # local decode
g = global_batch(mesh, raw)
tgt = g["target"]
assert tgt.shape[0] == 4, tgt.shape  # assembled global batch
# this process's addressable shards hold exactly its locally decoded rows
shards = sorted(tgt.addressable_shards,
                key=lambda s: s.index[0].start or 0)
local_rows = np.concatenate([np.asarray(s.data) for s in shards])
np.testing.assert_array_equal(local_rows, np.asarray(raw["target"]))
local_fp = float(np.asarray(raw["target"]).sum())

# --- multi-host checkpoint save/restore (orbax under jax.distributed):
# every process participates in the save of the SHARDED (ZeRO-2) state,
# then restores into the same shardings and must get identical values
import sys as _sys
ckpt_dir = _sys.argv[3]
from rcdms_tpu.io.checkpoint import restore_checkpoint, save_checkpoint
save_checkpoint(ckpt_dir, 1, {"params": state.params,
                              "opt_state": state.opt_state,
                              "step": state.step},
                {"last_global_step": 1})
restored, meta, rstep = restore_checkpoint(
    ckpt_dir, {"params": state.params, "opt_state": state.opt_state,
               "step": state.step})
assert rstep == 1 and meta["last_global_step"] == 1
for a, b in zip(jax.tree_util.tree_leaves(restored["params"]),
                jax.tree_util.tree_leaves(state.params)):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
# opt state round-trips with its ZeRO-2 sharding intact
ol = jax.tree_util.tree_leaves(restored["opt_state"])
sl = jax.tree_util.tree_leaves(state.opt_state)
shard_ok = all(a.sharding == b.sharding for a, b in zip(ol, sl)
               if hasattr(a, "sharding") and hasattr(b, "sharding"))

# --- multi-host-agreed preemption flag: only process 0 sees 'SIGTERM',
# but the collective agreement must stop BOTH processes at the same step
from rcdms_tpu.utils.preemption import PreemptionGuard
guard = PreemptionGuard()
agreed_before = guard.should_stop_global()   # collective: both call it
if pid == 0:
    guard.trigger()
agreed_after = guard.should_stop_global()    # process 1 must now agree
assert not agreed_before and agreed_after, (pid, agreed_before,
                                            agreed_after)

print(json.dumps({"pid": pid, "loss": float(loss),
                  "stop_agreed": bool(agreed_after),
                  "n_dev": len(jax.devices()),
                  "local_rows": int(raw["target"].shape[0]),
                  "local_fingerprint": local_fp,
                  "ckpt_ok": bool(shard_ok)}), flush=True)
jax.distributed.shutdown()
"""


def test_two_process_distributed_train_step(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    ckpt_dir = str(tmp_path / "ckpt")
    procs = [subprocess.Popen(
        [sys.executable, str(worker), coord, str(pid), ckpt_dir],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for pid in (0, 1)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    assert outs[0]["n_dev"] == outs[1]["n_dev"] == 4
    # both processes of the single program must agree on the global loss
    assert outs[0]["loss"] == pytest.approx(outs[1]["loss"], rel=1e-6)
    import numpy as np

    assert np.isfinite(outs[0]["loss"])
    # the real input path: each process decoded only its local half, and
    # the two halves are different shard streams
    assert outs[0]["local_rows"] == outs[1]["local_rows"] == 2
    assert outs[0]["local_fingerprint"] != outs[1]["local_fingerprint"]
    # multi-host orbax checkpoint round-trip kept values + shardings
    assert outs[0]["ckpt_ok"] and outs[1]["ckpt_ok"]
    # preemption flag agreement: only pid 0 'received SIGTERM' but both
    # processes observed the collective stop
    assert outs[0]["stop_agreed"] and outs[1]["stop_agreed"]
