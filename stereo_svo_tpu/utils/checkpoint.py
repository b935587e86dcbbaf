"""Checkpoint/resume: the whole SLAM state is one pytree (SURVEY.md §5.4).

The reference has no checkpointing (trajectory export only); here resume is
free by construction — serialize the ``SlamState`` pytree, restore it, and
``step`` continues bit-identically.
"""

from __future__ import annotations

import jax
import numpy as np


def save(path: str, state) -> None:
    leaves, _ = jax.tree.flatten(state)
    np.savez(path, **{f"leaf_{i}": np.asarray(x)
                      for i, x in enumerate(leaves)})


def load(path: str, like):
    """Restore a pytree with the structure of ``like`` from ``path``."""
    leaves, treedef = jax.tree.flatten(like)
    with np.load(path) as data:
        new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, new_leaves)
