"""Checkpoint/resume: the whole SLAM state is one pytree (SURVEY.md §5.4).

The reference has no checkpointing (trajectory export only); here resume is
free by construction — serialize the ``SlamState`` pytree, restore it, and
``step`` continues bit-identically.

Format (v2, ADVICE r4): leaves are keyed by their pytree KEY PATH (e.g.
``.mu``, ``.klt_tmpl.patches``), not by flat index — adding a field to
``SlamState`` no longer breaks every existing checkpoint. Leaves missing
from an older file (fields added since it was written) keep the template's
value, so old checkpoints resume with sane defaults for new state. The v1
``leaf_{i}`` index format is still read when the leaf count matches.
"""

from __future__ import annotations

import jax
import numpy as np

_FORMAT_KEY = "__checkpoint_format__"


def _path_key(path) -> str:
    return "".join(str(p) for p in path) or "."


def save(path: str, state) -> None:
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {_path_key(kp): np.asarray(x) for kp, x in leaves}
    assert len(arrays) == len(leaves), "duplicate key paths in pytree"
    arrays[_FORMAT_KEY] = np.asarray(2)
    np.savez(path, **arrays)


def load(path: str, like):
    """Restore a pytree with the structure of ``like`` from ``path``.

    Fields of ``like`` not present in the file (newer code, older
    checkpoint) keep their ``like`` values.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    with np.load(path) as data:
        if _FORMAT_KEY in data:
            new_leaves = [
                data[k] if (k := _path_key(kp)) in data else x
                for kp, x in flat]
        else:                          # v1: index-keyed, exact match only
            new_leaves = [data[f"leaf_{i}"] for i in range(len(flat))]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
