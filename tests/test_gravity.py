"""Barnes-Hut monopole gravity vs direct summation."""

import jax.numpy as jnp
import numpy as np
import pytest

from cstone_tpu.domain.layout import leaf_layout_from_counts
from cstone_tpu.focus.source_center import (
    compute_leaf_source_centers,
    set_mac_radii,
    upsweep_centers,
)
from cstone_tpu.models.nbody import gravity_monopole
from cstone_tpu.sfc import compute_sfc_keys, make_box
from cstone_tpu.traversal.geometry import node_geometry
from cstone_tpu.tree import compute_octree
from cstone_tpu.tree.octree import build_linked_octree


def direct_gravity(pos, m, G=1.0, eps2=1e-8):
    d = pos[None, :, :] - pos[:, None, :]
    r2 = (d**2).sum(-1) + eps2
    inv_r3 = r2**-1.5
    np.fill_diagonal(inv_r3, 0.0)
    w = G * m[None, :] * inv_r3
    return (w[:, :, None] * d).sum(axis=1)


def _setup(n=3000, seed=12):
    rng = np.random.RandomState(seed)
    pos = rng.normal(0, 0.25, size=(n, 3)).clip(-0.99, 0.99).astype(np.float32)
    m = rng.uniform(0.5, 1.5, size=n).astype(np.float32)
    box = make_box(-1.0, 1.0)
    keys = compute_sfc_keys(
        jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]), jnp.asarray(pos[:, 2]),
        box, jnp.uint64,
    )
    order = np.argsort(np.asarray(keys), kind="stable")
    pos, m = pos[order], m[order]
    keys = jnp.asarray(np.asarray(keys)[order])
    tree = compute_octree(keys, bucket_size=32, capacity=2048)
    linked = build_linked_octree(tree.keys, tree.n_nodes)
    layout = leaf_layout_from_counts(tree.counts)
    return pos, m, box, tree, linked, layout


@pytest.mark.parametrize("theta,tol", [(0.4, 2e-2), (1e-3, 1e-5)])
def test_gravity_vs_direct(theta, tol):
    n = 3000
    pos, m, box, tree, linked, layout = _setup(n)
    x, y, z = (jnp.asarray(pos[:, i]) for i in range(3))
    mj = jnp.asarray(m)

    leaf_centers = compute_leaf_source_centers(x, y, z, mj, layout, 2048)
    centers = upsweep_centers(linked, leaf_centers)
    centers4 = set_mac_radii(linked, centers, 1.0 / theta, box)
    geo_c, geo_s = node_geometry(linked, box)

    ax, ay, az, overflow = gravity_monopole(
        x, y, z, mj, linked, layout, centers, centers4[:, 3], geo_c, geo_s,
        box, group_size=32, leaf_cap=1024, cand_cap=4096, chunk=8, n_targets=n,
    )
    assert int(overflow) == 0
    a = np.stack([np.asarray(ax), np.asarray(ay), np.asarray(az)], axis=-1)
    ref = direct_gravity(pos.astype(np.float64), m.astype(np.float64))
    # relative error in force magnitude
    err = np.linalg.norm(a - ref, axis=1) / (np.linalg.norm(ref, axis=1) + 1e-12)
    assert np.median(err) < tol, f"median rel err {np.median(err)}"
    assert np.percentile(err, 95) < 10 * tol
