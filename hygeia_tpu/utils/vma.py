"""Varying-manual-axes (VMA) helpers for engines that run under shard_map.

Inside ``jax.shard_map`` with its VMA checker on (the default), every value
carries the set of mesh axes it varies over. Engine cold-start state built
from deterministic proposal grids and replicated parameter tables is
*unvarying*, while the scan carry it initialises becomes varying (RNG- and
emission-dependent) — a promotion the checker requires to be declared with
an explicit ``jax.lax.pcast``. Engines take a ``vma_axes`` tuple and call
``pcast_varying`` on their initial carries; unsharded callers pass nothing
and the helper is a no-op.
"""

from __future__ import annotations

import jax


def pcast_varying(tree, axes):
    """Promote every leaf of ``tree`` to varying over ``axes`` (each leaf is
    only promoted over the axes it does not already vary on). No-op when
    ``axes`` is empty."""
    if not axes:
        return tree

    def promote(x):
        missing = tuple(a for a in axes if a not in jax.typeof(x).vma)
        return jax.lax.pcast(x, missing, to="varying") if missing else x

    return jax.tree.map(promote, tree)
