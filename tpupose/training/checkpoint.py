"""Checkpoint / resume via Orbax.

The reference checkpoints full weights per epoch (``weights.{epoch}.h5``)
and silently resets optimizer state on resume — a wart we do not
replicate (SURVEY.md section 5.4). Here (params, opt_state, step) are
saved atomically with a retention policy and restored together.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np


def _manager(directory: str, max_to_keep: int = 5):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save(directory: str, state_tree: dict[str, Any], max_to_keep: int = 5) -> int:
    import orbax.checkpoint as ocp

    step = int(np.asarray(state_tree["step"]))
    mgr = _manager(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state_tree))
    mgr.wait_until_finished()
    mgr.close()
    return step


def latest_step(directory: str) -> int | None:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore(directory: str, template_tree: dict[str, Any]) -> dict[str, Any] | None:
    """Restore the latest checkpoint onto a template tree; None if absent."""
    import orbax.checkpoint as ocp

    step = latest_step(directory)
    if step is None:
        return None
    mgr = _manager(directory)
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template_tree))
    mgr.close()
    return restored
