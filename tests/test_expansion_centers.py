"""Public expansion-center maintenance (updateCenters + setMacRadius +
updateMacs, octree_focus_mpi.hpp:369-531) against a brute-force oracle:
each focus leaf's mass center must equal the center of mass of ALL global
particles in its key range, regardless of which rank owns them."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from cstone_tpu.domain.domain import Domain
from cstone_tpu.parallel import make_mesh, rank_axis
from cstone_tpu.sfc import HILBERT, compute_sfc_keys, make_box


def _oracle_centers(leaves, n_leaf, keys_all, pos, m):
    """Host f64 center of mass per leaf key range over ALL particles."""
    order = np.argsort(keys_all, kind="stable")
    ks = keys_all[order]
    P_ = pos[order].astype(np.float64)
    M_ = m[order].astype(np.float64)
    out = np.zeros((n_leaf, 4))
    for i in range(n_leaf):
        lo = np.searchsorted(ks, leaves[i], side="left")
        hi = np.searchsorted(ks, leaves[i + 1], side="left")
        mm = M_[lo:hi].sum()
        out[i, 3] = mm
        if mm > 0:
            out[i, :3] = (P_[lo:hi] * M_[lo:hi, None]).sum(0) / mm
    return out


def test_update_expansion_centers_multirank_oracle():
    n_ranks, n_per = 8, 200
    n = n_ranks * n_per
    cap = 4 * n_per
    rng = np.random.RandomState(61)
    pos = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    h = rng.uniform(0.03, 0.06, size=n).astype(np.float32)
    m = rng.uniform(0.5, 2.0, size=n).astype(np.float32)
    box = make_box(-1.0, 1.0)

    mesh = make_mesh(n_ranks)
    sharding = NamedSharding(mesh, P(rank_axis))

    def pad_local(a):
        out = np.zeros((n_ranks, cap), dtype=a.dtype)
        out[:, :n_per] = a.reshape(n_ranks, n_per)
        return jax.device_put(jnp.asarray(out.reshape(-1)), sharding)

    xl, yl, zl = pad_local(pos[:, 0]), pad_local(pos[:, 1]), pad_local(pos[:, 2])
    hl, ml = pad_local(h), pad_local(m)

    def step(xl, yl, zl, hl, ml):
        rank = jax.lax.axis_index(rank_axis)
        domain = Domain(
            rank=rank, n_ranks=n_ranks, bucket_size=16, bucket_size_focus=8,
            key_dtype=jnp.uint64, tree_capacity=1024, focus_capacity=2048,
            axis_name=rank_axis, theta=0.6,
        )
        state = domain.init_state(box=box, boundaries=box.boundaries)
        state, res = domain.sync(
            state, xl, yl, zl, hl, properties=(ml,), n_local=jnp.int32(n_per)
        )
        (m_synced,) = res.properties
        centers, mac_spheres, mac_flags, c_ovf = domain.update_expansion_centers(
            state, res, m_synced
        )
        leaf_centers = centers[res.tree.leaf_order()]
        leaf_spheres = mac_spheres[res.tree.leaf_order()]
        ovf = jax.lax.pmax(res.overflow + c_ovf, rank_axis)
        # gather per-rank focus views for host-side oracle comparison; the
        # synced box limits too — open boundaries refit the box to the
        # global particle AABB, and oracle keys must use the same box
        return (
            res.tree.leaves[None], res.tree.n_leaf[None], leaf_centers[None],
            leaf_spheres[None], mac_flags[None], ovf, state.box.limits,
        )

    fn = jax.jit(shard_map(
        step, mesh=mesh, in_specs=(P(rank_axis),) * 5,
        out_specs=(P(rank_axis),) * 5 + (P(), P()), check_vma=False,
    ))
    leaves_r, nleaf_r, centers_r, spheres_r, macs_r, ovf, lims = (
        jax.block_until_ready(fn(xl, yl, zl, hl, ml))
    )
    assert int(ovf) == 0

    from cstone_tpu.sfc.box import Box

    synced_box = Box(limits=jnp.asarray(lims), boundaries=box.boundaries)
    keys_all = np.asarray(
        compute_sfc_keys(
            jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]), jnp.asarray(pos[:, 2]),
            synced_box, np.dtype(np.uint64), HILBERT,
        )
    ).astype(np.uint64)

    leaves_r = np.asarray(leaves_r).astype(np.uint64)
    nleaf_r = np.asarray(nleaf_r)
    centers_r = np.asarray(centers_r)
    spheres_r = np.asarray(spheres_r)
    macs_r = np.asarray(macs_r)
    total_mass = float(m.astype(np.float64).sum())

    for r in range(n_ranks):
        n_leaf = int(nleaf_r[r])
        oracle = _oracle_centers(leaves_r[r], n_leaf, keys_all, pos, m)
        got = centers_r[r, :n_leaf]
        # mass exact to f32 accumulation, position to mixed-precision tol
        np.testing.assert_allclose(got[:, 3], oracle[:, 3], rtol=2e-5)
        sel = oracle[:, 3] > 0
        np.testing.assert_allclose(
            got[sel, :3], oracle[sel, :3], rtol=1e-4, atol=2e-5
        )
        # per-rank focus leaf masses cover the whole domain exactly once
        assert float(got[:, 3].sum()) == pytest_approx(total_mass)
        # MAC spheres share the centers and carry a positive radius for
        # occupied cells (setMacRadius, source_center.hpp:128-142)
        sph = spheres_r[r, :n_leaf]
        np.testing.assert_allclose(sph[sel, :3], got[sel, :3], rtol=1e-6)
        assert (sph[sel, 3] > 0).all()
        # MAC flags only fire outside my focus: all are 0/1 ints
        assert set(np.unique(macs_r[r, :n_leaf])) <= {0, 1}


def pytest_approx(v):
    import pytest

    return pytest.approx(v, rel=1e-5)


def test_update_expansion_centers_single_rank_oracle():
    n = 1500
    rng = np.random.RandomState(67)
    pos = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    h = rng.uniform(0.04, 0.08, size=n).astype(np.float32)
    m = rng.uniform(0.5, 2.0, size=n).astype(np.float32)
    box = make_box(-1.0, 1.0)

    domain = Domain(
        rank=0, n_ranks=1, bucket_size=16, key_dtype=jnp.uint64,
        tree_capacity=1024, theta=0.6,
    )
    state = domain.init_state()
    state, res = domain.sync(
        state,
        jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]), jnp.asarray(pos[:, 2]),
        jnp.asarray(h), properties=(jnp.asarray(m),),
    )
    assert int(res.overflow) == 0
    (m_synced,) = res.properties
    centers4, _spheres, mac_flags, ovf = domain.update_expansion_centers(
        state, res, m_synced
    )
    assert int(ovf) == 0
    n_leaf = int(res.tree.n_leaf)
    leaves = np.asarray(res.tree.leaves).astype(np.uint64)
    keys_all = np.asarray(res.keys[:n]).astype(np.uint64)
    pos_synced = np.stack(
        [np.asarray(res.x[:n]), np.asarray(res.y[:n]), np.asarray(res.z[:n])],
        axis=-1,
    )
    m_np = np.asarray(m_synced[:n])
    oracle = _oracle_centers(leaves, n_leaf, keys_all, pos_synced, m_np)
    got = np.asarray(centers4[np.asarray(res.tree.leaf_order())])[:n_leaf]
    np.testing.assert_allclose(got[:, 3], oracle[:, 3], rtol=2e-5)
    sel = oracle[:, 3] > 0
    np.testing.assert_allclose(got[sel, :3], oracle[sel, :3], rtol=1e-4, atol=2e-5)
    # single rank: everything is in focus, no MAC can fire
    assert int(np.asarray(mac_flags[:n_leaf]).sum()) == 0
