"""Orbax checkpointing: save/restore {params, opt_state, step} + metadata —
the TPU-native replacement for DeepSpeed `save_checkpoint`/`load_checkpoint`
(`train_stage1.py:37-74`, `train_stage2.py:60-89`). Keeps the reference's
resume semantics ({'epoch', 'last_global_step'} metadata)."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple



def _mngr(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True),
    )


def save_checkpoint(directory: str, step: int, state: Any,
                    metadata: Optional[Dict] = None,
                    max_to_keep: int = 3) -> None:
    """state: any pytree (e.g. TrainState fields as a dict)."""
    import orbax.checkpoint as ocp

    mngr = _mngr(directory, max_to_keep)
    args = ocp.args.Composite(
        state=ocp.args.StandardSave(state),
        metadata=ocp.args.JsonSave(metadata or {}),
    )
    mngr.save(step, args=args)
    mngr.wait_until_finished()


def latest_step(directory: str) -> Optional[int]:
    mngr = _mngr(directory)
    return mngr.latest_step()


def restore_checkpoint(directory: str, target: Any,
                       step: Optional[int] = None) -> Tuple[Any, Dict, int]:
    """Restore into the structure/shardings of `target`. Returns
    (state, metadata, step)."""
    import orbax.checkpoint as ocp

    mngr = _mngr(directory)
    step = step if step is not None else mngr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {directory}")
    restored = mngr.restore(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardRestore(target),
            metadata=ocp.args.JsonRestore(),
        ),
    )
    return restored["state"], restored["metadata"], step
