"""Checkpointing: orbax save/restore with step-named dirs + keep-last-N.

TPU-native equivalent of the reference's accelerate-based checkpoints
(``/root/reference/nerf/internal/checkpoints.py:9-38``): checkpoints live in
``{exp}/checkpoints/<step>``, restore picks the highest step, and at most
``checkpoints_total_limit`` checkpoints are kept.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def _ckpt_dir(base_folder: str) -> str:
    return os.path.join(os.path.abspath(base_folder), "checkpoints")


def save_checkpoint(base_folder: str, state, step: int,
                    total_limit: int = 1) -> str:
    """Save `state` (a pytree) under checkpoints/<step>, pruning old ones."""
    root = _ckpt_dir(base_folder)
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, str(step))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    # Keep only the newest `total_limit` checkpoints (checkpoints.py:33-37).
    steps = sorted(int(d) for d in os.listdir(root) if d.isdigit())
    for old in steps[:-total_limit] if total_limit > 0 else []:
        import shutil
        shutil.rmtree(os.path.join(root, str(old)), ignore_errors=True)
    return path


def latest_checkpoint_step(base_folder: str) -> Optional[int]:
    root = _ckpt_dir(base_folder)
    if not os.path.isdir(root):
        return None
    steps = [int(d) for d in os.listdir(root) if d.isdigit()]
    return max(steps) if steps else None


def restore_checkpoint(base_folder: str, abstract_state) -> tuple[Any, int]:
    """Restore the newest checkpoint into the structure of abstract_state.

    Returns (state, step); (abstract_state_as_is, 0) when none exists."""
    step = latest_checkpoint_step(base_folder)
    if step is None:
        return abstract_state, 0
    path = os.path.join(_ckpt_dir(base_folder), str(step))
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(path, abstract_state)
    return state, step
