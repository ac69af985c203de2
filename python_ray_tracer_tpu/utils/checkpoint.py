"""Pytree checkpoint/restore for scenes and optimizer state.

The reference persists nothing but the final PNG (main.py:53). The inverse-rendering
loop (BASELINE configs[3]) needs resumable state: any pytree (scene, optimizer state)
round-trips through a flat ``.npz`` keyed by its flattened **leaf paths** — a
reordered or extended pytree fails loudly on load instead of silently loading
positionally-matched values (``KeyPath`` names are the contract, not leaf order).
"""
from __future__ import annotations

import jax
import numpy as np


def _path_keys(tree):
    """Flatten ``tree`` with path strings as stable npz keys."""
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(tree)
    keys = [jax.tree_util.keystr(path) or "<root>" for path, _ in leaves_with_paths]
    leaves = [leaf for _, leaf in leaves_with_paths]
    return keys, leaves, treedef


def save_pytree(path: str, tree) -> None:
    keys, leaves, _ = _path_keys(tree)
    assert len(set(keys)) == len(keys), "duplicate leaf paths in pytree"
    np.savez(path, **{k: np.asarray(x) for k, x in zip(keys, leaves)})


def load_pytree(path: str, like):
    """Load leaves saved by :func:`save_pytree` into the structure of ``like``.

    Every leaf path of ``like`` must be present in the checkpoint and vice versa;
    a mismatch (renamed field, extra/missing leaf) raises with the offending paths.
    """
    data = np.load(path)
    keys, _, treedef = _path_keys(like)
    saved = set(data.files)
    want = set(keys)
    if saved != want:
        missing = sorted(want - saved)
        extra = sorted(saved - want)
        # set comparison, not sorted-list equality: lexicographic sort puts
        # leaf_10 before leaf_2, which broke detection for >= 11 leaves
        if not (want & saved) and extra and \
                set(extra) == {f"leaf_{i}" for i in range(len(extra))}:
            raise ValueError(
                "checkpoint uses the legacy positional leaf_<i> format; re-save it "
                "with the current save_pytree (path-keyed) to load it")
        raise ValueError(
            f"checkpoint/template leaf-path mismatch: missing={missing} extra={extra}")
    new_leaves = [jax.numpy.asarray(data[k]) for k in keys]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
