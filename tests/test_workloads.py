"""Clustered-workload correctness: Gaussian and Plummer samples
(reference perf workloads, octree.cpp:45-72 + plummer.hpp) through both
neighbor-search paths against the O(n^2) oracle — constant h (the
neighbor_driver.cu regime) and density-adaptive h (the warp-BFS regime,
find_neighbors.cuh:200-343)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cstone_tpu.domain.domain import Domain
from cstone_tpu.sfc import PERIODIC, make_box
from cstone_tpu.traversal.celllist import (
    cell_list_neighbor_counts,
    choose_cell_level,
)
from cstone_tpu.utils.workloads import adaptive_h, gaussian_coords, plummer_coords

from test_domain import brute_force_total, _find_counts


def _sample(dist, n, seed):
    if dist == "gauss":
        pos = gaussian_coords(n, (0.0, 1.0) * 3, seed=seed)
    else:
        p = plummer_coords(n, seed=seed)
        r = np.quantile(np.abs(p), 0.999)
        pos = np.clip(p / (2.05 * r) + 0.5, 0.0, 1.0).astype(np.float32)
    return pos


@pytest.mark.parametrize("dist", ["gauss", "plummer"])
def test_clustered_tree_path_adaptive_h(dist):
    """Domain.sync + tree-traversal neighbor counts with adaptive h."""
    n = 2000
    pos = _sample(dist, n, seed=71)
    h = adaptive_h(pos, (0.0, 1.0) * 3, target_mean_neighbors=40.0, level=4)
    h = np.minimum(h, 0.12).astype(np.float32)
    box = make_box(0.0, 1.0, boundaries=PERIODIC)

    domain = Domain(
        rank=0, n_ranks=1, bucket_size=16, key_dtype=jnp.uint64,
        tree_capacity=2048,
    )
    state = domain.init_state(box=box, boundaries=box.boundaries)
    state, res = domain.sync(
        state, jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]),
        jnp.asarray(pos[:, 2]), jnp.asarray(h),
    )
    assert int(res.overflow) == 0
    counts, ovf, _ = _find_counts(res, state.box, n)
    assert int(ovf) == 0
    total = int(np.asarray(counts[:n]).astype(np.int64).sum())
    expect = brute_force_total(pos, h, np.asarray(box.limits), True)
    assert total == expect
    # the workload is genuinely clustered: neighbor counts vary an order
    # of magnitude even with adaptive h capped from above (median, not
    # mean — the Plummer core's capped-h counts dominate the mean)
    per = np.asarray(counts[:n])
    assert per.max() >= 5 * max(np.median(per), 1.0) or dist == "gauss"


@pytest.mark.parametrize("dist", ["gauss", "plummer"])
def test_clustered_cell_list_constant_h(dist):
    """Cell-list stencil path at constant h on clustered samples: exact
    when the cap covers the measured peak occupancy."""
    n = 3000
    pos = _sample(dist, n, seed=73)
    h_val = 0.04
    h = np.full(n, h_val, np.float32)
    box = make_box(0.0, 1.0, boundaries=PERIODIC)

    domain = Domain(
        rank=0, n_ranks=1, bucket_size=16, key_dtype=jnp.uint64,
        tree_capacity=2048,
    )
    state = domain.init_state(box=box, boundaries=box.boundaries)
    state, res = domain.sync(
        state, jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]),
        jnp.asarray(pos[:, 2]), jnp.asarray(h),
    )
    assert int(res.overflow) == 0

    level = choose_cell_level(box, h_val)
    d = 1 << level
    ijk = np.clip((pos * d).astype(np.int64), 0, d - 1)
    occ = np.bincount((ijk[:, 0] * d + ijk[:, 1]) * d + ijk[:, 2],
                      minlength=d**3).max()
    cap = max(64, -(-int(occ + 8) // 64) * 64)

    counts, ovf = cell_list_neighbor_counts(
        res.keys, res.x, res.y, res.z, res.h, box, level, cap,
        n_valid=res.end_index,
    )
    assert not bool(ovf)
    total = int(np.asarray(counts[:n]).astype(np.int64).sum())
    expect = brute_force_total(pos, h, np.asarray(box.limits), True)
    assert total == expect
