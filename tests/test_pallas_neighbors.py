"""Pallas pairwise kernel vs the XLA path and the brute-force oracle
(interpret mode on CPU; the same kernel compiles for TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cstone_tpu.domain.layout import leaf_layout_from_counts
from cstone_tpu.traversal import make_ns_view
from cstone_tpu.traversal.neighbors import _find_neighbors_impl
from cstone_tpu.tree import compute_octree
from cstone_tpu.tree.octree import build_linked_octree

from test_neighbors import _setup, brute_force_counts


@pytest.mark.parametrize("periodic", [False, True])
def test_pallas_counts_match_oracle(periodic):
    n = 1500
    x, y, z, h, keys, box = _setup(n, periodic, seed=77, hval=0.05)

    tree = compute_octree(keys, bucket_size=16, capacity=2048)
    linked = build_linked_octree(tree.keys, tree.n_nodes)
    layout = leaf_layout_from_counts(tree.counts)
    view = make_ns_view(linked, layout, box)

    args = dict(
        ng_max=1, group_size=32, cand_leaf_cap=512, cand_cap=8192, chunk=8,
        with_indices=False, n_targets=n,
    )
    c_pallas, _, stats = _find_neighbors_impl(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(z), jnp.asarray(h),
        view, box, use_pallas=True, interpret=True, **args,
    )
    assert int(stats.cand_max) <= 8192 and not bool(stats.pbc_bad)
    expect, _, _ = brute_force_counts(x, y, z, h, np.asarray(box.limits), periodic)
    np.testing.assert_array_equal(np.asarray(c_pallas[:n]), expect)
