"""Peer-local exchange primitives on the 8-device virtual mesh.

Mirrors the reference's per-exchange integration tests
(test/integration_mpi/exchange_domain.cpp, exchange_general.cpp,
exchange_keys.cpp): each protocol is exercised in isolation with known
global data and asserted element-exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from cstone_tpu.parallel import make_mesh, rank_axis
from cstone_tpu.parallel.exchange import (
    exchange_particles,
    range_count_service,
    range_sum_service,
    replay_exchange,
)
from cstone_tpu.sfc.keys import remove_key

R = 8
KDT = jnp.uint64


def _sharded(arr_2d):
    mesh = make_mesh(R)
    sharding = NamedSharding(mesh, P(rank_axis))
    return jax.device_put(jnp.asarray(arr_2d.reshape(-1)), sharding), mesh


def _make_particles(seed, n, cap):
    """Random global keys + values, arbitrarily scattered over ranks."""
    rng = np.random.RandomState(seed)
    keys = np.sort(
        rng.randint(0, 2**62, size=n).astype(np.uint64)
    )  # global sorted
    vals = rng.uniform(-1, 1, size=n).astype(np.float32)
    perm = rng.permutation(n)
    rk = np.uint64(np.asarray(remove_key(np.dtype(np.uint64))))
    n_per = n // R
    lk = np.full((R, cap), rk, dtype=np.uint64)
    lv = np.zeros((R, cap), dtype=np.float32)
    for r in range(R):
        mine = np.sort(keys[perm[r * n_per : (r + 1) * n_per]])
        lk[r, :n_per] = mine
        # values keyed to the key so we can check routing exactly
        lv[r, :n_per] = (mine % 1000003).astype(np.float32)
    return keys, lk, lv, n_per


def test_exchange_particles_roundtrip():
    n, cap, move_cap = 2000, 800, 128
    keys, lk, lv, n_per = _make_particles(3, n, cap)

    # equal-count boundaries over the global keys
    bidx = [0] + [int(i * n / R) for i in range(1, R)] + [n]
    bounds = np.zeros(R + 1, np.uint64)
    for i in range(1, R):
        bounds[i] = keys[bidx[i]]
    bounds[R] = np.uint64(1) << np.uint64(63)

    xl, mesh = _sharded(lk)
    vl, _ = _sharded(lv)

    def step(xl, vl):
        me = jax.lax.axis_index(rank_axis)
        nk, (nv,), rec = exchange_particles(
            xl, (vl,), jnp.asarray(bounds), me, jnp.int32(n_per),
            move_cap, rank_axis,
        )
        return nk, nv, rec.n_owned[None], rec.overflow[None]

    nk, nv, n_owned, ovf = jax.jit(
        shard_map(
            step, mesh=mesh, in_specs=(P(rank_axis), P(rank_axis)),
            out_specs=(P(rank_axis), P(rank_axis), P(rank_axis), P(rank_axis)),
        )
    )(xl, vl)
    nk = np.asarray(nk).reshape(R, cap)
    nv = np.asarray(nv).reshape(R, cap)
    n_owned = np.asarray(n_owned).reshape(R)
    assert int(np.asarray(ovf).max()) == 0

    # every rank holds exactly the global particles in its boundary range,
    # sorted, with values routed alongside
    got_total = 0
    for r in range(R):
        no = int(n_owned[r])
        kr = nk[r, :no]
        expect = keys[(keys >= bounds[r]) & (keys < bounds[r + 1])]
        np.testing.assert_array_equal(kr, expect)
        np.testing.assert_array_equal(
            nv[r, :no], (expect % 1000003).astype(np.float32)
        )
        rk = np.uint64(np.asarray(remove_key(np.dtype(np.uint64))))
        assert (nk[r, no:] == rk).all()
        got_total += no
    assert got_total == n


def test_replay_exchange_matches():
    n, cap, move_cap = 1600, 700, 96
    keys, lk, lv, n_per = _make_particles(7, n, cap)
    bounds = np.zeros(R + 1, np.uint64)
    for i in range(1, R):
        bounds[i] = keys[int(i * n / R)]
    bounds[R] = np.uint64(1) << np.uint64(63)

    xl, mesh = _sharded(lk)
    vl, _ = _sharded(lv)

    def step(xl, vl):
        me = jax.lax.axis_index(rank_axis)
        nk, (nv,), rec = exchange_particles(
            xl, (vl,), jnp.asarray(bounds), me, jnp.int32(n_per),
            move_cap, rank_axis,
        )
        # replay the same field through the record: must match exactly
        nv2 = replay_exchange(vl, rec, rank_axis)
        return nk, nv, nv2, rec.n_owned[None]

    nk, nv, nv2, n_owned = jax.jit(
        shard_map(
            step, mesh=mesh, in_specs=(P(rank_axis),) * 2,
            out_specs=(P(rank_axis),) * 4,
        )
    )(xl, vl)
    nv = np.asarray(nv).reshape(R, cap)
    nv2 = np.asarray(nv2).reshape(R, cap)
    for r, no in enumerate(np.asarray(n_owned).reshape(R)):
        np.testing.assert_array_equal(nv[r, : int(no)], nv2[r, : int(no)])


def test_range_count_and_sum_service():
    n, cap = 2400, 600
    rng = np.random.RandomState(11)
    keys = np.sort(rng.randint(0, 2**62, size=n).astype(np.uint64))
    vals = rng.uniform(0.1, 1.0, size=(n, 2)).astype(np.float32)
    rk = np.uint64(np.asarray(remove_key(np.dtype(np.uint64))))

    # rank r owns an equal slice, sorted
    n_per = n // R
    lk = np.full((R, cap), rk, np.uint64)
    lv = np.zeros((R, cap, 2), np.float32)
    bounds = np.zeros(R + 1, np.uint64)
    for r in range(R):
        lk[r, :n_per] = keys[r * n_per : (r + 1) * n_per]
        lv[r, :n_per] = vals[r * n_per : (r + 1) * n_per]
        bounds[r] = keys[r * n_per]
    bounds[0] = np.uint64(0)
    bounds[R] = np.uint64(1) << np.uint64(63)

    # every rank queries Q random ranges, sorted by owner
    Q, q_cap = 64, 64
    qa = np.zeros((R, Q), np.uint64)
    qb = np.zeros((R, Q), np.uint64)
    dest = np.zeros((R, Q), np.int32)
    for r in range(R):
        a = rng.randint(0, 2**62, size=Q).astype(np.uint64)
        b = a + rng.randint(1, 2**55, size=Q).astype(np.uint64)
        # owner of a range start; clip ranges to stay within one owner
        d = np.searchsorted(bounds, a, side="right") - 1
        b = np.minimum(b, bounds[d + 1])
        order = np.argsort(d, kind="stable")
        qa[r], qb[r], dest[r] = a[order], b[order], d[order]

    mesh = make_mesh(R)
    sh = NamedSharding(mesh, P(rank_axis))
    lkj = jax.device_put(jnp.asarray(lk.reshape(-1)), sh)
    lvj = jax.device_put(jnp.asarray(lv.reshape(R * cap, 2)), sh)
    qaj = jax.device_put(jnp.asarray(qa.reshape(-1)), sh)
    qbj = jax.device_put(jnp.asarray(qb.reshape(-1)), sh)
    dj = jax.device_put(jnp.asarray(dest.reshape(-1)), sh)

    def step(lk, lv, qa, qb, d):
        counts, ovf1 = range_count_service(
            qa, qb, d, jnp.ones_like(d, bool), lk, jnp.int32(n_per),
            R, q_cap, rank_axis,
        )
        sums, ovf2 = range_sum_service(
            qa, qb, d, jnp.ones_like(d, bool), lk, jnp.int32(n_per), lv,
            R, q_cap, rank_axis,
        )
        return counts, sums, jnp.maximum(ovf1, ovf2)[None]

    counts, sums, ovf = jax.jit(
        shard_map(
            step, mesh=mesh, in_specs=(P(rank_axis),) * 5,
            out_specs=(P(rank_axis), P(rank_axis), P(rank_axis)),
        )
    )(lkj, lvj, qaj, qbj, dj)
    assert int(np.asarray(ovf).max()) == 0
    counts = np.asarray(counts).reshape(R, Q)
    sums = np.asarray(sums).reshape(R, Q, 2)

    for r in range(R):
        for q in range(Q):
            sel = (keys >= qa[r, q]) & (keys < qb[r, q])
            assert counts[r, q] == int(sel.sum()), (r, q)
            np.testing.assert_allclose(
                sums[r, q], vals[sel].sum(0), rtol=1e-5, atol=1e-5
            )
