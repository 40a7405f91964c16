"""Halo discovery, layout, and exchange as a reusable state machine.

TPU-native equivalent of the reference's Halos class (reference:
include/cstone/halos/halos.hpp:107-268). The Domain drives these steps
inline during sync; this class packages the same discover ->
compute_layout -> exchange sequence for clients that manage their own
trees (mirroring the reference API surface).

Exchange here is index-based: because the Domain's particle pool is
globally SFC-sorted and every local slot records its pool index, a halo
exchange is one scatter of owned values into the pool plus a psum and a
gather (halos.hpp:224-251's epoch-tagged P2P becomes a deterministic
collective; no tags or epochs exist).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..domain.layout import compute_node_layout
from ..ops.primitives import segment_ids_from_offsets
from ..sfc.box import Box
from ..traversal.collisions import find_halos
from ..tree.octree import LinkedOctree

__all__ = ["Halos"]


class Halos:
    """discover/compute_layout/exchange sequence (halos.hpp:107-268)."""

    def __init__(self, my_rank, axis_name: Optional[str] = None):
        self.my_rank = my_rank
        self.axis_name = axis_name

    def discover(
        self,
        tree: LinkedOctree,
        leaf_counts: jax.Array,
        layout_scan: jax.Array,
        h_sorted: jax.Array,
        first_leaf,
        last_leaf,
        box: Box,
        search_ext_factor: float = 1.0,
        curve: str = "hilbert",
    ) -> jax.Array:
        """Per-leaf halo flags (halos.hpp:116-189).

        h_sorted: smoothing lengths of locally owned particles in SFC
        order; layout_scan: particle offsets per leaf for those particles.
        """
        cap_leaf = tree.leaves.shape[0] - 1
        n = h_sorted.shape[0]
        pseg = segment_ids_from_offsets(layout_scan, n, cap_leaf)
        leaf_hmax = jax.ops.segment_max(
            h_sorted, pseg, num_segments=cap_leaf, indices_are_sorted=True
        )
        leaf_hmax = jnp.maximum(leaf_hmax, 0.0)
        li = jnp.arange(cap_leaf, dtype=jnp.int32)
        mine = (li >= first_leaf) & (li < last_leaf)
        radii = jnp.where(
            mine, leaf_hmax * h_sorted.dtype.type(2.0 * search_ext_factor), 0.0
        )
        return find_halos(tree, radii, box, first_leaf, last_leaf, curve)

    def compute_layout(
        self,
        leaf_counts: jax.Array,
        halo_flags: jax.Array,
        first_leaf,
        last_leaf,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Buffer layout including halo cells (halos.hpp:191-222).

        Returns (layout, start_index, end_index).
        """
        layout = compute_node_layout(leaf_counts, halo_flags, first_leaf, last_leaf)
        return layout, layout[first_leaf], layout[last_leaf]

    def exchange(
        self,
        prop: jax.Array,
        global_ids: jax.Array,
        start_index,
        end_index,
        n_ranks: int,
    ) -> jax.Array:
        """Fill halo slots of `prop` from owner ranks (halos.hpp:224-251)."""
        cap = prop.shape[0]
        j = jnp.arange(cap, dtype=jnp.int32)
        owned = (j >= start_index) & (j < end_index)
        n_pool = cap * (n_ranks if self.axis_name is not None else 1)
        pool = jnp.zeros((n_pool,), dtype=prop.dtype)
        pool = pool.at[jnp.where(owned, global_ids, n_pool)].set(prop, mode="drop")
        if self.axis_name is not None:
            pool = jax.lax.psum(pool, self.axis_name)
        return pool[global_ids]
