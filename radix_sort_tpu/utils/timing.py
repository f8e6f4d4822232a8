"""Timing helpers.

Through the axon TPU relay, ``jax.block_until_ready`` can return before the
remote computation finishes; a host fetch of any output element is the only
reliable synchronization point. All bench timing goes through :func:`sync`.
"""

from __future__ import annotations

import jax
import numpy as np

__all__ = ["sync"]


def sync(tree):
    """Force completion of every computation feeding ``tree`` by fetching one
    element of each leaf to the host. Returns the tree unchanged."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if getattr(leaf, "ndim", 0) == 0 or leaf.size == 0:
            np.asarray(leaf)
        else:
            np.asarray(leaf.reshape(-1)[-1:])
    return tree
