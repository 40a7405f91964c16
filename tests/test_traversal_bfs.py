"""BFS leaf collection must match the lockstep-DFS walk exactly
(set-equality per query; order is level-major vs DFS order)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cstone_tpu.sfc import PERIODIC, compute_sfc_keys, make_box
from cstone_tpu.traversal.boxoverlap import min_distance_boxes
from cstone_tpu.traversal.geometry import node_geometry
from cstone_tpu.traversal.traversal import (
    batched_collect_leaves,
    batched_collect_leaves_bfs,
)
from cstone_tpu.tree import compute_octree
from cstone_tpu.tree.octree import build_linked_octree


def _setup(n=3000, periodic=True, seed=7, bucket=16, n_queries=37, radius=0.2):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    box = make_box(-1.0, 1.0, boundaries=PERIODIC if periodic else 0)
    keys = compute_sfc_keys(
        jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]), jnp.asarray(pos[:, 2]),
        box, jnp.uint32,
    )
    keys = jnp.sort(keys)
    tree = compute_octree(keys, bucket_size=bucket, capacity=4096)
    linked = build_linked_octree(tree.keys, tree.n_nodes)
    centers, sizes = node_geometry(linked, box)

    qc = jnp.asarray(rng.uniform(-1, 1, size=(n_queries, 3)).astype(np.float32))
    qs = jnp.asarray(rng.uniform(0.0, 0.3, size=(n_queries, 3)).astype(np.float32))
    qr = jnp.asarray(np.full(n_queries, radius, np.float32))

    def criterion(q_ids, node_ids):
        d = min_distance_boxes(
            qc[q_ids], qs[q_ids], centers[node_ids], sizes[node_ids],
            box if periodic else None,
        )
        return jnp.sum(d * d, axis=-1) < qr[q_ids] * qr[q_ids]

    return linked, criterion, n_queries


@pytest.mark.parametrize("periodic", [True, False])
def test_bfs_matches_dfs(periodic):
    linked, criterion, nq = _setup(periodic=periodic)
    out_cap = 512
    dfs, dfs_n = batched_collect_leaves(
        linked.child_offsets, criterion, nq, out_cap
    )
    bfs, bfs_n, fmax = batched_collect_leaves_bfs(
        linked.child_offsets, criterion, nq, out_cap, frontier_cap=64
    )
    dfs, dfs_n = np.asarray(dfs), np.asarray(dfs_n)
    bfs, bfs_n, fmax = np.asarray(bfs), np.asarray(bfs_n), np.asarray(fmax)
    assert (fmax <= 64).all(), "frontier overflow in test setup"
    np.testing.assert_array_equal(dfs_n, bfs_n)
    for q in range(nq):
        a = set(dfs[q, : dfs_n[q]].tolist())
        b = set(bfs[q, : bfs_n[q]].tolist())
        assert a == b, f"query {q}: DFS/BFS leaf sets differ"


def test_bfs_active_mask_and_root_leaf():
    # single-node tree: root is a leaf; masked queries collect nothing
    child_offsets = jnp.zeros((8,), jnp.int32)
    nq = 5
    mask = jnp.asarray([True, False, True, False, True])

    def crit(q_ids, node_ids):
        return jnp.ones(q_ids.shape, bool)

    out, out_n, fmax = batched_collect_leaves_bfs(
        child_offsets, crit, nq, out_cap=4, frontier_cap=4, active_mask=mask
    )
    np.testing.assert_array_equal(np.asarray(out_n), [1, 0, 1, 0, 1])
    np.testing.assert_array_equal(np.asarray(out[:, 0]), [0, -1, 0, -1, 0])
    assert int(np.asarray(fmax).max()) == 0


def test_bfs_frontier_overflow_reported():
    linked, criterion, nq = _setup(radius=2.0)  # everything passes
    _, _, fmax = batched_collect_leaves_bfs(
        linked.child_offsets, criterion, nq, out_cap=2048, frontier_cap=2
    )
    assert int(np.asarray(fmax).max()) > 2
