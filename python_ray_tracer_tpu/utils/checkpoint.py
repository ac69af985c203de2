"""Pytree checkpoint/restore for scenes and optimizer state.

The reference persists nothing but the final PNG (main.py:53). The inverse-rendering
loop (BASELINE configs[3]) needs resumable state: any pytree (scene, optimizer state)
round-trips through a flat ``.npz`` keyed by its flattened leaf paths.
"""
from __future__ import annotations

import jax
import numpy as np


def save_pytree(path: str, tree) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez(path, **arrays)


def load_pytree(path: str, like):
    """Load leaves saved by :func:`save_pytree` into the structure of ``like``."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    assert len(leaves) == len(data.files), (
        f"checkpoint has {len(data.files)} leaves, template has {len(leaves)}")
    new_leaves = [jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
