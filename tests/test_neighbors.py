"""Neighbor search vs O(n^2) brute-force oracle
(mirrors test/unit/neighbors/all_to_all.hpp + findneighbors.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cstone_tpu.domain.layout import leaf_layout_from_counts
from cstone_tpu.sfc import PERIODIC, compute_sfc_keys, make_box
from cstone_tpu.traversal import find_neighbors, make_ns_view
from cstone_tpu.tree import compute_octree
from cstone_tpu.tree.octree import build_linked_octree


def brute_force_counts(x, y, z, h, box_lims, periodic):
    """O(n^2) reference: count j != i with dist^2 < (2 h_i)^2, PBC-aware."""
    X = np.stack([x, y, z], axis=1).astype(np.float64)
    L = np.array(
        [box_lims[1] - box_lims[0], box_lims[3] - box_lims[2], box_lims[5] - box_lims[4]]
    )
    d = X[:, None, :] - X[None, :, :]
    if periodic:
        d -= L * np.rint(d / L)
    d2 = (d**2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    r2 = (2.0 * h.astype(np.float64)) ** 2
    return (d2 < r2[:, None]).sum(axis=1).astype(np.uint32), d2, r2


def _setup(n, periodic, seed=1234, hval=None, gauss=False):
    rng = np.random.RandomState(seed)
    if gauss:
        pos = np.clip(rng.normal(0, 0.25, size=(n, 3)), -0.99, 0.99).astype(np.float32)
    else:
        pos = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
    if hval is None:
        h = rng.uniform(0.04, 0.12, size=n).astype(np.float32)
    else:
        h = np.full(n, hval, dtype=np.float32)

    box = make_box(-1.0, 1.0, boundaries=PERIODIC if periodic else 0)
    keys = compute_sfc_keys(jnp.asarray(x), jnp.asarray(y), jnp.asarray(z), box, jnp.uint64)
    order = np.argsort(np.asarray(keys), kind="stable")
    x, y, z, h = x[order], y[order], z[order], h[order]
    keys = jnp.asarray(np.asarray(keys)[order])
    return x, y, z, h, keys, box


@pytest.mark.parametrize("periodic", [False, True])
@pytest.mark.parametrize("gauss", [False, True])
def test_neighbor_counts_vs_bruteforce(periodic, gauss):
    n = 2000
    x, y, z, h, keys, box = _setup(n, periodic, gauss=gauss)

    tree = compute_octree(keys, bucket_size=16, capacity=2048)
    linked = build_linked_octree(tree.keys, tree.n_nodes)
    layout = leaf_layout_from_counts(tree.counts)
    view = make_ns_view(linked, layout, box)

    counts, _ = find_neighbors(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(z), jnp.asarray(h),
        view, box, group_size=32, cand_cap=8192, cand_leaf_cap=640, chunk=16,
    )
    expect, _, _ = brute_force_counts(x, y, z, h, np.asarray(box.limits), periodic)
    np.testing.assert_array_equal(np.asarray(counts), expect)


def test_neighbor_indices_vs_bruteforce():
    n = 500
    x, y, z, h, keys, box = _setup(n, periodic=True, seed=7)
    tree = compute_octree(keys, bucket_size=8, capacity=2048)
    linked = build_linked_octree(tree.keys, tree.n_nodes)
    layout = leaf_layout_from_counts(tree.counts)
    view = make_ns_view(linked, layout, box)

    ngmax = 64
    counts, nbs = find_neighbors(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(z), jnp.asarray(h),
        view, box, ng_max=ngmax, group_size=16, cand_cap=8192, cand_leaf_cap=640,
        chunk=8, with_indices=True,
    )
    expect, d2, r2 = brute_force_counts(x, y, z, h, np.asarray(box.limits), True)
    np.testing.assert_array_equal(np.asarray(counts), expect)

    nbs = np.asarray(nbs)
    for i in range(n):
        got = set(int(v) for v in nbs[i] if v >= 0)
        want = set(np.nonzero(d2[i] < r2[i])[0].tolist())
        assert len(got) == min(len(want), ngmax)
        assert got.issubset(want), f"particle {i}"
