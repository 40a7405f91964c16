"""VALIDATION ORACLE: cross-rank exchange of per-cell focus quantities.

O(R * tree) all_gather formulation of the reference's treelet exchanges
(reference: include/cstone/focus/exchange_focus.hpp — exchangeTreelets:
62-96, exchangeTreeletGeneral:290-344, globalFocusExchange in
octree_focus_mpi.hpp:763-784), kept as a simple cross-check for tests.

The SHIPPED analogs — what Domain.sync actually runs — are the range
services: exact per-cell counts/sums served by each range's owner over
peer-local all_to_all (parallel/exchange.py::range_count_service /
range_sum_service) or surface-total ragged buffers
(parallel/ragged.py::range_*_service_ragged), both O(local+surface) per
rank. This module's all_gather + static rank loop is O(R * tree) per rank
and must not be used on a hot path.

Lookup precondition shared with the reference: each rank's focus tree
resolves peer assignments at least as finely as the owners' trees at
their boundaries (guaranteed by enforce_keys), so a cell owned by rank p
can be looked up by key in p's tree; exact-match masking stands in for
pruneTreelets (exchange_focus.hpp:100-129).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..domain.decomposition import SfcAssignment, find_rank

__all__ = ["exchange_focus_quantities"]


def exchange_focus_quantities(
    my_leaves: jax.Array,
    my_values: jax.Array,
    assignment: SfcAssignment,
    my_rank,
    axis_name: str,
    combine: str = "replace",
) -> Tuple[jax.Array, jax.Array]:
    """Fill per-leaf values of cells owned by other ranks from their owners.

    my_leaves: (cap_leaf+1,) this rank's focus cornerstone keys.
    my_values: (cap_leaf,) or (cap_leaf, k) per-leaf quantities, authoritative
        for cells inside this rank's assignment.
    Returns (values, matched): values updated for foreign-owned cells where
    the owner has an exactly matching cell; `matched` marks those cells.
    """
    n_ranks = assignment.n_ranks
    cap_leaf = my_leaves.shape[0] - 1
    start_keys = my_leaves[:-1]
    end_keys = my_leaves[1:]

    owner = find_rank(assignment, start_keys)
    my_rank = jnp.asarray(my_rank, jnp.int32)

    all_leaves = jax.lax.all_gather(my_leaves, axis_name)  # (R, cap+1)
    all_values = jax.lax.all_gather(my_values, axis_name)  # (R, cap[, k])

    values = my_values
    matched = owner == my_rank

    for r in range(n_ranks):
        row = all_leaves[r]
        pos = jnp.searchsorted(row, start_keys, side="left").astype(jnp.int32)
        pos = jnp.minimum(pos, cap_leaf - 1)
        hit = (row[pos] == start_keys) & (row[pos + 1] == end_keys)
        take = (owner == r) & (jnp.asarray(r, jnp.int32) != my_rank) & hit
        src = all_values[r][pos]
        if my_values.ndim == 1:
            values = jnp.where(take, src, values)
        else:
            values = jnp.where(take[:, None], src, values)
        matched = matched | take
    return values, matched
