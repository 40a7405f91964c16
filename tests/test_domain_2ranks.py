"""Handcrafted 2-rank Domain.sync cases with exactly known post-sync
layouts (mirrors test/integration_mpi/domain_2ranks.cpp:42-143): eight
particles at the level-1 octant centers, bucket size 1, so the global
tree, the assignment split, the halo set, and every buffer slot are
predictable by hand."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from cstone_tpu.domain.domain import Domain
from cstone_tpu.parallel import make_mesh, rank_axis
from cstone_tpu.sfc import compute_sfc_keys, make_box

N_RANKS = 2
CAP = 16


def _octant_centers():
    """The 8 level-1 octant centers of the unit box, in Hilbert key order."""
    centers = []
    for ix in (0.25, 0.75):
        for iy in (0.25, 0.75):
            for iz in (0.25, 0.75):
                centers.append((ix, iy, iz))
    pos = np.array(centers, dtype=np.float32)
    box = make_box(0.0, 1.0)
    keys = np.asarray(
        compute_sfc_keys(
            jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]), jnp.asarray(pos[:, 2]),
            box, jnp.uint64,
        )
    )
    order = np.argsort(keys)
    return pos[order], box  # Hilbert-sorted octant centers


def _run_sync(pos, h_val, box, cap=CAP):
    """Each rank starts with an interleaved half of the particles."""
    mesh = make_mesh(N_RANKS)
    sharding = NamedSharding(mesh, P(rank_axis))
    n = pos.shape[0]
    per = n // N_RANKS

    # deal particles round-robin so both ranks must exchange
    deal = np.arange(n).reshape(per, N_RANKS).T  # (ranks, per)

    def pad_local(a):
        out = np.zeros((N_RANKS, cap), dtype=a.dtype)
        out[:, :per] = a[deal]
        return jax.device_put(jnp.asarray(out.reshape(-1)), sharding)

    xl = pad_local(pos[:, 0])
    yl = pad_local(pos[:, 1])
    zl = pad_local(pos[:, 2])
    hl = pad_local(np.full(n, h_val, np.float32))

    def fn(x, y, z, h):
        rank = jax.lax.axis_index(rank_axis)
        domain = Domain(
            rank=rank, n_ranks=N_RANKS, bucket_size=1, bucket_size_focus=1,
            key_dtype=jnp.uint64, tree_capacity=256, focus_capacity=256,
            axis_name=rank_axis,
        )
        state = domain.init_state(box=box, boundaries=box.boundaries)
        state, res = domain.sync(state, x, y, z, h, n_local=jnp.int32(per))
        return (res.x.reshape(1, -1), res.start_index.reshape(1),
                res.end_index.reshape(1), res.n_with_halos.reshape(1),
                jax.lax.pmax(res.overflow, rank_axis))

    f = jax.jit(shard_map(
        fn, mesh=mesh, in_specs=(P(rank_axis),) * 4,
        out_specs=(P(rank_axis), P(rank_axis), P(rank_axis), P(rank_axis), P()),
        check_vma=False,
    ))
    xs, starts, ends, nwh, ovf = f(xl, yl, zl, hl)
    assert int(ovf) == 0
    return (np.asarray(xs), np.asarray(starts), np.asarray(ends),
            np.asarray(nwh))


def test_2ranks_octants_exact_layout():
    """Eight octant cells split 4/4: in a 2x2x2 grid every cell is
    (corner-)adjacent to every other, and halo cell boxes are dilated by
    at least one grid unit (makeHaloBox, boxoverlap.hpp:159-182 — the
    reference flags face/edge/corner neighbors for any h > 0), so each
    rank's buffer holds ALL 8 particles in Hilbert order with its own
    half bracketed by start/end (the [halo | assigned | halo] envelope,
    domain.hpp:144-194)."""
    pos, box = _octant_centers()
    for h_val in (1e-3, 0.3):
        xs, starts, ends, nwh = _run_sync(pos, h_val, box)
        for r in range(N_RANKS):
            assert nwh[r] == 8
            assert ends[r] - starts[r] == 4
            assert starts[r] == (0 if r == 0 else 4)
            np.testing.assert_allclose(xs[r][:8], pos[:, 0])


def _level2_centers():
    """The 64 level-2 cell centers, Hilbert-sorted, with grid coords."""
    g = (np.arange(4) + 0.5) / 4.0
    ix, iy, iz = np.meshgrid(g, g, g, indexing="ij")
    pos = np.stack([ix.ravel(), iy.ravel(), iz.ravel()], 1).astype(np.float32)
    box = make_box(0.0, 1.0)
    keys = np.asarray(
        compute_sfc_keys(
            jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]), jnp.asarray(pos[:, 2]),
            box, jnp.uint64,
        )
    )
    order = np.argsort(keys)
    return pos[order], box


def test_2ranks_level2_halo_set_matches_adjacency_oracle():
    """64 level-2 cells split 32/32 with tiny h: the halo set must be
    exactly the remote cells Chebyshev-adjacent to the own region
    (dilated cell boxes overlap iff the cells share a face, edge, or
    corner). Buffer contents are checked cell-for-cell against the
    NumPy oracle."""
    pos, box = _level2_centers()
    n = 64
    grid = np.floor(pos * 4).astype(int)  # (64, 3) integer cell coords
    xs, starts, ends, nwh = _run_sync(pos, 1e-3, box, cap=128)

    for r in range(N_RANKS):
        own = np.arange(32 * r, 32 * (r + 1))
        remote = np.setdiff1d(np.arange(n), own)
        adj = [
            c for c in remote
            if (np.abs(grid[c] - grid[own]).max(axis=1) <= 1).any()
        ]
        expected = np.sort(np.concatenate([own, adj]))
        assert nwh[r] == len(expected)
        assert ends[r] - starts[r] == 32
        np.testing.assert_allclose(
            xs[r][: len(expected)], pos[expected, 0]
        )
