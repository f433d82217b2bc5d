"""Checkpoint save/restore via Orbax.

Replaces the reference engine's rank-0 torch.save snapshots
(/root/reference/pocket/pocket/core/distributed.py:209-224: iteration,
epoch, model/optimizer/scheduler state) with Orbax PyTree checkpoints; on a
multi-process mesh Orbax handles the single-writer semantics that the
reference guarded with rank checks.
"""
import os
from typing import Any, Optional

import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory: str, step: int, state: Any) -> str:
    """state: arbitrary pytree (trainable params, opt state, counters)."""
    path = os.path.join(os.path.abspath(directory), f"ckpt_{step:08d}")
    _ckptr().save(path, jax.tree.map(np.asarray, state), force=True)
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    cands = sorted(d for d in os.listdir(directory)
                   if d.startswith("ckpt_"))
    return os.path.join(os.path.abspath(directory), cands[-1]) if cands \
        else None


def restore_checkpoint(path: str, like: Any, partial: bool = False) -> Any:
    """Restore into the structure of ``like`` (dtypes/shapes preserved).

    ``partial=True`` restores only the subtree named by ``like`` from a
    larger checkpoint (e.g. trainable params out of a full training state,
    for eval — reference analog: the strict=False-style load in
    main_tip_finetune.py:1013-1021)."""
    if not partial:
        return _ckptr().restore(path, item=jax.tree.map(np.asarray, like))
    # Orbax's partial_restore chokes on None leaves (absent submodules),
    # so restore the raw tree and select the subtree shaped like ``like``.
    full = _ckptr().restore(path)

    def select(saved, template):
        if isinstance(template, dict):
            return {k: select(saved[k], v) for k, v in template.items()}
        if isinstance(template, (list, tuple)):
            return type(template)(select(s, t)
                                  for s, t in zip(saved, template))
        return saved

    return select(full, like)
