"""Checkpointing: orbax for pytrees, torch import for reference weights.

The reference only loads torch checkpoints at runtime (policy.pth,
detector weights; reference: agent.py:768, mass/thor/detectron_utils.py:
30-31).  Here model state saves/restores through orbax, and the torch
import paths live in the respective modules
(search.policy.load_reference_policy, perception.resnet).
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


def save_pytree(path: str, tree: Any) -> str:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckpt:
        ckpt.save(path, tree, force=True)
    return path


def load_pytree(path: str, like: Any = None) -> Any:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckpt:
        if like is not None:
            return ckpt.restore(path, like)
        return ckpt.restore(path)
