"""Device mesh + GSPMD sharding rules — the TPU-native replacement for the
reference's DeepSpeed ZeRO-2 data parallelism (`zero_stage2_config.json:12-21`
-> SURVEY.md §2.7):

  * batch axis sharded over the ('data',) mesh axis (DP),
  * params replicated,
  * optimizer state sharded over 'data' (ZeRO-2 equivalent: each device holds
    1/N of the Adam moments; XLA inserts the reduce-scatter/all-gather pairs
    that DeepSpeed does by hand, riding ICI),
  * optional ('tensor',) axis reserved for TP over heads/channels.

All collectives are emitted by XLA from these annotations — no NCCL-style
explicit communication anywhere."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rcdms_tpu.configs import MeshConfig


def make_mesh(cfg: MeshConfig = MeshConfig(),
              devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    d, t = cfg.axis_sizes(len(devices))
    arr = np.asarray(devices).reshape(d, t)
    return Mesh(arr, ("data", "tensor"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch dict/pytree with the leading axis over 'data'."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def _zero2_spec_for(shape, data_size: int) -> P:
    """Shard the largest axis divisible by the data-axis size; scalars and
    indivisible leaves stay replicated (same policy ZeRO applies by
    flattening; per-axis sharding keeps layouts XLA-friendly)."""
    if not shape:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % data_size == 0 and shape[i] >= data_size:
            spec = [None] * len(shape)
            spec[i] = "data"
            return P(*spec)
    return P()


def zero2_opt_state_shardings(opt_state, mesh: Mesh):
    """NamedShardings for an optax opt-state pytree: every tensor leaf
    sharded over 'data' where divisible (ZeRO-2), rest replicated."""
    data_size = mesh.shape["data"]

    def spec(leaf):
        if hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
            return NamedSharding(mesh, _zero2_spec_for(leaf.shape, data_size))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, opt_state)


def replicated_shardings(tree, mesh: Mesh):
    return jax.tree_util.tree_map(lambda _: replicated(mesh), tree)


# ---------------------------------------------------------------------------
# Inference (single-story latency) sharding
# ---------------------------------------------------------------------------


def inference_mesh(devices: Optional[list] = None) -> Mesh:
    """Mesh for sharded single-story inference: ('cfg', 'space').

    A single story gives the UNet a batch of just 2 (CFG) x 1 story, so DP
    alone cannot cut latency. Instead: the CFG batch-doubling axis splits
    2-way (communication-free except the per-step guidance mix), and the
    latent *rows* (h) split over 'space' — XLA/GSPMD inserts conv halo
    exchanges and attention gathers over ICI. The reference has no
    equivalent (its 8-GPU eval fan-out is throughput-only,
    `stage2_batchtest_rcdms_model.py:457-468`); this is what attacks the
    <=2 s p50 v5e-8 story-latency target."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    cfg_ax = 2 if n % 2 == 0 and n > 1 else 1
    arr = np.asarray(devices).reshape(cfg_ax, n // cfg_ax)
    return Mesh(arr, ("cfg", "space"))


def constrain(x, mesh: Optional[Mesh], *spec):
    """`with_sharding_constraint` when a mesh is given; identity otherwise
    (so the same sampler code serves 1-chip and sharded runs)."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))
