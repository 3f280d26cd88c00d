"""Orbax checkpointing: save/restore {params, opt_state, step} + metadata —
the TPU-native replacement for DeepSpeed `save_checkpoint`/`load_checkpoint`
(`train_stage1.py:37-74`, `train_stage2.py:60-89`). Keeps the reference's
resume semantics ({'epoch', 'last_global_step'} metadata)."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple



# one manager per directory: a CheckpointManager owns background threads,
# so constructing (and never closing) one per save call leaks resources;
# create=False on the read-only paths so probing a wrong path raises
# instead of silently creating the directory
_MANAGERS: Dict[Tuple[str, bool], Any] = {}


def _mngr(directory: str, max_to_keep: int = 3, create: bool = True):
    import orbax.checkpoint as ocp

    key = (os.path.abspath(directory), create)
    mngr = _MANAGERS.get(key)
    if mngr is None:
        mngr = ocp.CheckpointManager(
            key[0],
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=create),
        )
        _MANAGERS[key] = mngr
    elif not create:
        # a cached read manager may predate newer saves in this process —
        # re-scan the directory so latest_step() is current
        try:
            mngr.reload()
        except AttributeError:
            _MANAGERS.pop(key)
            return _mngr(directory, max_to_keep, create)
    return mngr


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
    if not os.path.isdir(directory):
        return None
    return _mngr(directory, create=False).latest_step()


def restore_checkpoint(directory: str, target: Any,
                       step: Optional[int] = None) -> Tuple[Any, Dict, int]:
    """Restore into the structure/shardings of `target`. Returns
    (state, metadata, step)."""
    import orbax.checkpoint as ocp

    if not os.path.isdir(directory):
        raise FileNotFoundError(f"no checkpoint directory {directory}")
    mngr = _mngr(directory, create=False)
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
