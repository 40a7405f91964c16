"""Halo collision detection vs brute-force all-to-all cross-check
(mirrors test/unit/traversal/collisions_a2a.{cpp,hpp})."""

import jax.numpy as jnp
import numpy as np
import pytest

from cstone_tpu.sfc import PERIODIC, compute_sfc_keys, make_box
from cstone_tpu.sfc.box import IBox
from cstone_tpu.sfc.encode import sfc_ibox
from cstone_tpu.sfc.keys import node_range, tree_level, max_tree_level
from cstone_tpu.traversal.boxoverlap import make_halo_box, overlap_iboxes, contained_in_keys
from cstone_tpu.traversal.collisions import find_halos
from cstone_tpu.tree import compute_octree
from cstone_tpu.tree.octree import build_linked_octree


def _build_tree(n=2000, periodic=True, seed=3, bucket=16):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    box = make_box(-1.0, 1.0, boundaries=PERIODIC if periodic else 0)
    keys = compute_sfc_keys(
        jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]), jnp.asarray(pos[:, 2]), box, jnp.uint32
    )
    keys = jnp.sort(keys)
    tree = compute_octree(keys, bucket_size=bucket, capacity=2048)
    linked = build_linked_octree(tree.keys, tree.n_nodes)
    return tree, linked, box


def _brute_force_halos(leaves_np, n_leaf, radii, box, first, last, dtype):
    """All-to-all reference: leaf j flagged if any local leaf i's halo box
    overlaps it and j is outside the assignment."""
    leaves = jnp.asarray(leaves_np)
    key = leaves[:-1]
    rng_ = leaves[1:] - key
    safe = jnp.where(rng_ > 0, rng_, node_range(dtype, max_tree_level(dtype)))
    level = tree_level(safe)
    iboxes = sfc_ibox(key, level)
    halo = make_halo_box(iboxes, jnp.asarray(radii), box, dtype)

    flags = np.zeros(len(leaves_np) - 1, dtype=np.int32)
    lowest, highest = leaves_np[first], leaves_np[last]
    inside = np.asarray(contained_in_keys(halo, jnp.asarray(lowest), jnp.asarray(highest), dtype))

    def row(i):
        hb = IBox(
            halo.xmin[i], halo.xmax[i], halo.ymin[i], halo.ymax[i], halo.zmin[i], halo.zmax[i]
        )
        ov = np.asarray(overlap_iboxes(iboxes, hb, dtype))
        return ov

    for i in range(first, last):
        if inside[i]:
            continue
        ov = row(i)
        for j in range(n_leaf):
            n_start, n_end = leaves_np[j], leaves_np[j + 1]
            contained = (n_start >= lowest) & (n_end <= highest)
            if ov[j] and not contained:
                flags[j] = 1
    return flags


@pytest.mark.parametrize("periodic", [True, False])
def test_find_halos_vs_a2a(periodic):
    tree, linked, box = _build_tree(periodic=periodic)
    n_leaf = int(tree.n_nodes)
    cap_leaf = tree.keys.shape[0] - 1

    rng = np.random.RandomState(11)
    radii = np.zeros(cap_leaf, dtype=np.float32)
    radii[:n_leaf] = rng.uniform(0.01, 0.08, size=n_leaf).astype(np.float32)

    first, last = n_leaf // 4, n_leaf // 2
    flags = find_halos(linked, jnp.asarray(radii), box, jnp.int32(first), jnp.int32(last))

    expect = _brute_force_halos(
        np.asarray(tree.keys), n_leaf, radii, box, first, last, jnp.uint32
    )
    np.testing.assert_array_equal(np.asarray(flags)[:n_leaf], expect[:n_leaf])
    # no flags inside the assignment
    assert not np.asarray(flags)[first:last].any()
