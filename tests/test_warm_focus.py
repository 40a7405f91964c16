"""Multi-rank warm-path reuse (VERDICT r4 #4 / r3 task 5).

When a sync's focus converge reports convergence, the next sync's first
iteration reuses the CARRIED linked focus tree instead of rebuilding it
from the (bit-identical) leaf array — the reference's rebalanceStatus
freshness guard (octree_focus_mpi.hpp:669-677) applied past n_ranks == 1.

Verified here on the 8-rank CPU mesh:
  1. focus_converged propagates True through warm steady-state syncs;
  2. a warm sync (carried linked, use_carried=True) is BIT-IDENTICAL to
     the same sync forced cold (focus_converged=False): leaf array, leaf
     counts, neighbor-sum totals;
  3. the carried linked tree equals a fresh one-pass build of the focus
     leaves (so reuse can never change downstream layout/halo decisions).

The boundary-shift scenario (test_focus_transfer.py) carries DomainState
across 10 drifting steps and therefore exercises the warm path with real
structural re-refinement interleaved.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from cstone_tpu.domain.domain import Domain
from cstone_tpu.parallel import make_mesh, rank_axis
from cstone_tpu.sfc import PERIODIC, make_box
from cstone_tpu.tree.octree import build_linked_octree

from test_domain import brute_force_total, _find_counts

N_RANKS, N_PER = 8, 160
CAP = 4 * N_PER


def _setup():
    n = N_RANKS * N_PER
    rng = np.random.RandomState(17)
    pos = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    h = rng.uniform(0.04, 0.06, size=n).astype(np.float32)
    box = make_box(0.0, 1.0, boundaries=PERIODIC)
    mesh = make_mesh(N_RANKS)
    sharding = NamedSharding(mesh, P(rank_axis))

    def pad_local(a):
        out = np.zeros((N_RANKS, CAP), dtype=a.dtype)
        out[:, :N_PER] = a.reshape(N_RANKS, N_PER)
        return jax.device_put(jnp.asarray(out.reshape(-1)), sharding)

    return n, pos, h, box, mesh, sharding, pad_local


def _make_domain(rank):
    return Domain(
        rank=rank, n_ranks=N_RANKS, bucket_size=16, bucket_size_focus=8,
        key_dtype=jnp.uint64, tree_capacity=1024, focus_capacity=2048,
        axis_name=rank_axis,
    )


def test_warm_focus_reuse_is_exact():
    n, pos, h, box, mesh, sharding, pad_local = _setup()

    def step(packed, x, y, z, hh, n_local):
        dstate = jax.tree.map(lambda a: a[0], packed)
        rank = jax.lax.axis_index(rank_axis)
        domain = _make_domain(rank)
        dstate, res = domain.sync(dstate, x, y, z, hh, n_local=n_local[0])
        counts, novf, _ = _find_counts(res, dstate.box, CAP)
        j = jnp.arange(CAP, dtype=jnp.int32)
        owned = (j >= res.start_index) & (j < res.end_index)
        total = jax.lax.psum(
            jnp.sum(jnp.where(owned, counts.astype(jnp.int64), 0)), rank_axis
        )
        ovf = jax.lax.pmax(res.overflow + novf.astype(jnp.int32), rank_axis)
        co = domain.compact_owned
        conv_all = jax.lax.pmin(
            dstate.focus_converged.astype(jnp.int32), rank_axis)
        return (
            jax.tree.map(lambda a: a[None], dstate),
            co(res, res.x), co(res, res.y), co(res, res.z), co(res, res.h),
            (res.end_index - res.start_index).reshape(1),
            total, ovf, conv_all,
            res.tree.leaves[None], res.tree.n_leaf.reshape(1),
            res.leaf_counts[None],
        )

    dstate0 = _make_domain(0).init_state(box=box, boundaries=box.boundaries)
    packed0 = jax.tree.map(
        lambda a: jax.device_put(
            jnp.broadcast_to(a[None], (N_RANKS,) + a.shape), sharding),
        dstate0,
    )
    state_specs = jax.tree.map(lambda _: P(rank_axis), packed0)
    fn = jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(state_specs,) + (P(rank_axis),) * 5,
        out_specs=(state_specs,) + (P(rank_axis),) * 5
        + (P(), P(), P()) + (P(rank_axis),) * 3,
        check_vma=False,
    ))

    arrays = [pad_local(pos[:, 0]), pad_local(pos[:, 1]),
              pad_local(pos[:, 2]), pad_local(h)]
    n_local = jax.device_put(
        jnp.full((N_RANKS,), N_PER, jnp.int32), sharding)
    expect = brute_force_total(pos, h, np.asarray(box.limits), True)

    # sync 1 (cold: first_call) — state converges
    packed, *arrays, n_local, total, ovf, conv, lv1, nl1, lc1 = fn(
        packed0, *arrays, n_local)
    assert int(ovf) == 0
    assert int(total) == expect
    assert int(conv) == 1, "focus must converge on the first sync"

    # the carried linked tree must equal a fresh build of the leaves
    for r in range(N_RANKS):
        st_r = jax.tree.map(lambda a, _r=r: jnp.asarray(np.asarray(a)[_r]),
                            packed)
        fresh = build_linked_octree(st_r.focus_leaves, st_r.focus_n)
        np.testing.assert_array_equal(
            np.asarray(fresh.leaves), np.asarray(st_r.linked.leaves))
        np.testing.assert_array_equal(
            np.asarray(fresh.prefixes), np.asarray(st_r.linked.prefixes))
        np.testing.assert_array_equal(
            np.asarray(fresh.child_offsets),
            np.asarray(st_r.linked.child_offsets))

    # sync 2 warm (focus_converged=True carried) vs forced cold: identical
    import dataclasses

    packed_cold = dataclasses.replace(
        packed, focus_converged=jnp.zeros_like(packed.focus_converged))
    out_warm = fn(packed, *arrays, n_local)
    out_cold = fn(packed_cold, *arrays, n_local)
    (_, *_aw, _nw, total_w, ovf_w, conv_w, lv_w, nl_w, lc_w) = out_warm
    (_, *_ac, _nc, total_c, ovf_c, conv_c, lv_c, nl_c, lc_c) = out_cold
    assert int(ovf_w) == 0 and int(ovf_c) == 0
    assert int(total_w) == expect and int(total_c) == expect
    assert int(conv_w) == 1
    np.testing.assert_array_equal(np.asarray(lv_w), np.asarray(lv_c))
    np.testing.assert_array_equal(np.asarray(nl_w), np.asarray(nl_c))
    np.testing.assert_array_equal(np.asarray(lc_w), np.asarray(lc_c))
