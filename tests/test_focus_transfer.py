"""Boundary-shift scenario: the focusTransfer invariant under drift.

The reference hands the refined treelet of a lost SFC range to its new
owner when assignment boundaries move (exchange_focus.hpp:365-433,
test/integration_mpi/focus_transfer.cpp). Here exact range-count services
re-derive the counts every sync, so the invariant to verify is that a
MOVING assignment — coherent drift strong enough that
limit_boundary_shifts engages across steps — preserves both

  1. the flagship neighbor-sum equality every step, and
  2. focus bucket resolution: every focus leaf fully inside a rank's
     assignment stays at or below bucket_size_focus (no resolution loss
     when a range changes owner).

The DomainState (assignment, global tree, focus tree, linked octree) is
CARRIED across steps, so each sync starts from the previous step's
boundaries — the path domain_nranks-style tests never exercise because
they re-init state every step.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from cstone_tpu.domain.domain import Domain
from cstone_tpu.parallel import make_mesh, rank_axis
from cstone_tpu.sfc import PERIODIC, make_box

from test_domain import brute_force_total, _find_counts


def test_boundary_shift_preserves_invariants():
    n_ranks, n_per = 8, 200
    n = n_ranks * n_per
    cap = 4 * n_per
    bucket_focus = 8
    n_steps = 10
    drift = np.array([0.061, 0.017, 0.0], np.float32)  # per step, box units

    rng = np.random.RandomState(41)
    pos0 = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    h = rng.uniform(0.035, 0.055, size=n).astype(np.float32)
    box = make_box(0.0, 1.0, boundaries=PERIODIC)

    mesh = make_mesh(n_ranks)
    sharding = NamedSharding(mesh, P(rank_axis))

    def pad_local(a):
        out = np.zeros((n_ranks, cap), dtype=a.dtype)
        out[:, :n_per] = a.reshape(n_ranks, n_per)
        return jax.device_put(jnp.asarray(out.reshape(-1)), sharding)

    def make_domain(rank):
        return Domain(
            rank=rank, n_ranks=n_ranks, bucket_size=16,
            bucket_size_focus=bucket_focus, key_dtype=jnp.uint64,
            tree_capacity=1024, focus_capacity=2048, axis_name=rank_axis,
        )

    dv = jnp.asarray(drift)

    def step(packed, x, y, z, hh, n_local):
        dstate = jax.tree.map(lambda a: a[0], packed)
        rank = jax.lax.axis_index(rank_axis)
        domain = make_domain(rank)
        dstate, res = domain.sync(dstate, x, y, z, hh, n_local=n_local[0])

        counts, novf, _ = _find_counts(res, dstate.box, cap)
        j = jnp.arange(cap, dtype=jnp.int32)
        owned = (j >= res.start_index) & (j < res.end_index)
        total = jax.lax.psum(
            jnp.sum(jnp.where(owned, counts.astype(jnp.int64), 0)), rank_axis
        )
        assigned = jax.lax.psum(
            (res.end_index - res.start_index).astype(jnp.int64), rank_axis
        )
        ovf = jax.lax.pmax(res.overflow + novf.astype(jnp.int32), rank_axis)

        # focus resolution: leaves of MY focus tree fully inside MY
        # assignment range must respect the focus bucket size
        linked = res.tree
        li = jnp.arange(linked.leaves.shape[0] - 1, dtype=jnp.int32)
        b = dstate.assignment.boundaries
        inside = (
            (li < linked.n_leaf)
            & (linked.leaves[:-1] >= b[rank])
            & (linked.leaves[1:] <= b[rank + 1])
        )
        max_inside = jnp.max(jnp.where(inside, res.leaf_counts, 0))
        max_focus_count = jax.lax.pmax(max_inside, rank_axis)

        # drift owned particles, compact to the front, carry state
        co = domain.compact_owned
        L = dstate.box.lengths.astype(res.x.dtype)
        mins = dstate.box.mins.astype(res.x.dtype)
        nx = mins[0] + (res.x + dv[0] - mins[0]) % L[0]
        ny = mins[1] + (res.y + dv[1] - mins[1]) % L[1]
        nz = mins[2] + (res.z + dv[2] - mins[2]) % L[2]
        packed_out = jax.tree.map(lambda a: a[None], dstate)
        return (
            packed_out, co(res, nx), co(res, ny), co(res, nz), co(res, res.h),
            (res.end_index - res.start_index).reshape(1),
            total, assigned, ovf, max_focus_count,
            b[None],
        )

    # build the packed initial state: one DomainState per rank, stacked
    dstate0 = make_domain(0).init_state(box=box, boundaries=box.boundaries)
    packed0 = jax.tree.map(
        lambda a: jax.device_put(
            jnp.broadcast_to(a[None], (n_ranks,) + a.shape), sharding
        ),
        dstate0,
    )
    state_specs = jax.tree.map(lambda _: P(rank_axis), packed0)

    fn = jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(state_specs,) + (P(rank_axis),) * 5,
        out_specs=(state_specs,) + (P(rank_axis),) * 5
        + (P(), P(), P(), P(), P(rank_axis)),
        check_vma=False,
    ))

    packed = packed0
    arrays = [pad_local(pos0[:, 0]), pad_local(pos0[:, 1]),
              pad_local(pos0[:, 2]), pad_local(h)]
    n_local = jax.device_put(jnp.full((n_ranks,), n_per, jnp.int32), sharding)

    boundary_snapshots = []
    for t in range(n_steps):
        packed, x, y, z, hh, n_local, total, assigned, ovf, max_fc, bnds = fn(
            packed, *arrays, n_local
        )
        arrays = [x, y, z, hh]
        assert int(ovf) == 0, f"overflow at step {t}"
        assert int(assigned) == n, f"lost particles at step {t}"

        # neighbor-sum invariant against drifted ground-truth positions
        pos_t = (pos0 + t * drift) % 1.0
        expect = brute_force_total(pos_t.astype(np.float32), h,
                                   np.asarray(box.limits), True)
        assert int(total) == expect, f"neighbor sum mismatch at step {t}"

        # focus resolution preserved through ownership changes
        assert int(max_fc) <= bucket_focus, (
            f"focus leaf over bucket size at step {t}: {int(max_fc)}"
        )
        boundary_snapshots.append(np.asarray(bnds)[0].astype(np.uint64))

    # the scenario must actually move boundaries, else it tests nothing
    moved = sum(
        (boundary_snapshots[t] != boundary_snapshots[t + 1]).any()
        for t in range(n_steps - 1)
    )
    assert moved >= 3, f"assignment boundaries barely moved ({moved} steps)"
