"""Flattened-pytree npz persistence (checkpoints, resumable aux params)."""

from __future__ import annotations

import numpy as np


def save_pytree_npz(path: str, tree) -> None:
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    np.savez(path, **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})


def load_pytree_npz(path: str, tree_like):
    """Restore leaves into the structure of `tree_like` (same treedef)."""
    import jax
    import jax.numpy as jnp

    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(tree_like)
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))]
    )
