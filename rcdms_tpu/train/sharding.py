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
    """Place a host batch dict/pytree with the leading axis over 'data'.
    Single-process only: `x` must be the GLOBAL batch (multi-host callers
    use `global_batch`, which takes per-process LOCAL rows)."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def global_batch(mesh: Mesh, local_batch, batch_axis: str = "data"):
    """Assemble GLOBAL device arrays from each process's LOCAL batch rows
    (`jax.make_array_from_process_local_data`): every host decodes only
    batch_size/P stories — the reference's DistributedSampler semantics
    (`train_stage2.py:320-325`) without the P-times-redundant host decode
    the round-2 CLIs had (VERDICT r2 weak #2). Single-process this equals
    shard_batch."""
    s = NamedSharding(mesh, P(batch_axis))

    def put(x):
        return jax.make_array_from_process_local_data(s, np.asarray(x))

    return jax.tree_util.tree_map(put, local_batch)


def local_batch_size(global_batch_size: int) -> int:
    """Per-process rows; validates divisibility by the process count."""
    p = jax.process_count()
    if global_batch_size % p:
        raise ValueError(
            f"global batch size {global_batch_size} must be divisible by "
            f"the process count {p}")
    return global_batch_size // p


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


def inference_mesh(devices: Optional[list] = None,
                   frame: Optional[int] = None) -> Mesh:
    """Mesh for sharded single-story inference: ('cfg', 'frame', 'space').

    A single story gives the UNet a batch of just 2 (CFG) x 1 story, so DP
    alone cannot cut latency. Instead three latency axes (each may be 1):

      * 'cfg'   — the CFG batch-doubling axis splits 2-way
                  (communication-free except the per-step guidance mix),
      * 'frame' — the story's 5 frames split (GSPMD pads 5 -> ceil) — convs,
                  GroupNorm stats, spatial attention and VAE are all
                  per-frame, so this axis is communication-free everywhere
                  except the temporal-attention modules,
      * 'space' — the latent *rows* (h) split — XLA/GSPMD inserts conv halo
                  exchanges and attention KV gathers over ICI.

    The comm audit (tools/comm_audit.py, BASELINE.md round 3) picks the
    default split. The reference has no equivalent (its 8-GPU eval fan-out
    is throughput-only, `stage2_batchtest_rcdms_model.py:457-468`); this is
    what attacks the <=2 s p50 v5e-8 story-latency target."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    cfg_ax = 2 if n % 2 == 0 and n > 1 else 1
    if frame is None:
        frame = _DEFAULT_FRAME_AXIS
    frame = max(1, frame)
    if (n // cfg_ax) % frame != 0:
        frame = 1  # fall back: 'frame' must divide the non-cfg devices
    arr = np.asarray(devices).reshape(cfg_ax, frame, n // cfg_ax // frame)
    return Mesh(arr, ("cfg", "frame", "space"))


# default 'frame' axis size, set by the comm audit (tools/comm_audit.py,
# BASELINE.md round-3 table); 1 = pure ('cfg','space') row sharding
_DEFAULT_FRAME_AXIS = 1


def set_default_frame_axis(frame: int) -> None:
    global _DEFAULT_FRAME_AXIS
    _DEFAULT_FRAME_AXIS = frame


def constrain(x, mesh: Optional[Mesh], *spec):
    """`with_sharding_constraint` when a mesh is given; identity otherwise
    (so the same sampler code serves 1-chip and sharded runs)."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))
