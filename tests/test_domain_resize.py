"""domain_resize semantics: the particle count grows mid-simulation.

Mirrors the intent of the reference's integration test that re-sizes the
particle set between sync epochs (test/integration_mpi/domain_resize.cpp):
new particles appear after steps have already run, n_local changes, and
when the local buffer capacity is exceeded the host retry loop grows it
(a re-jit with larger static shapes — the reallocate analog). The
neighbor-sum invariant must hold before and after every growth.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from cstone_tpu.domain.domain import Domain, sync_with_retry
from cstone_tpu.parallel import make_mesh, rank_axis
from cstone_tpu.sfc import PERIODIC, make_box

from test_domain import brute_force_total, _find_counts


def test_resize_single_rank_grows_local_capacity():
    rng = np.random.RandomState(53)
    box = make_box(0.0, 1.0, boundaries=PERIODIC)
    n0 = 800
    pos = rng.uniform(0.0, 1.0, size=(n0, 3)).astype(np.float32)
    h = np.full(n0, 0.05, np.float32)

    calls = []

    def make_run(pos, h):
        n = pos.shape[0]

        def run(caps):
            calls.append(dict(caps))
            if caps["local"] < n:
                # capacity below the new particle count: report the
                # shortfall the way a device-side overflow would
                from cstone_tpu.domain.domain import SyncResult

                detail = jnp.zeros((7,), jnp.int32).at[0].set(n)
                return SyncResult(
                    keys=None, x=None, y=None, z=None, h=None, properties=(),
                    start_index=0, end_index=0, n_with_halos=0,
                    global_ids=None, sort_order=None, pool_perm=None,
                    layout=None, halo_flags=None, tree=None, leaf_counts=None,
                    overflow=jnp.int32(n), overflow_detail=detail,
                )
            domain = Domain(
                rank=0, n_ranks=1, bucket_size=16, key_dtype=jnp.uint64,
                tree_capacity=caps["tree"], focus_capacity=caps["focus"],
            )
            state = domain.init_state(box=box, boundaries=box.boundaries)
            pad = caps["local"] - n
            arrs = [
                jnp.concatenate([jnp.asarray(pos[:, d]), jnp.zeros(pad, jnp.float32)])
                for d in range(3)
            ]
            hh = jnp.concatenate([jnp.asarray(h), jnp.zeros(pad, jnp.float32)])
            state, res = domain.sync(state, *arrs, hh, n_local=jnp.int32(n))
            return state, res

        return run, n

    caps = {"local": n0, "tree": 512, "focus": 512, "move": 512,
            "treelet": 1024, "halo": 1024}

    # epoch 1: initial population fits exactly
    run, n = make_run(pos, h)
    (state, res), caps = sync_with_retry(run, caps)
    assert int(res.overflow) == 0
    counts, ovf, _ = _find_counts(res, state.box, caps["local"])
    assert int(ovf) == 0
    total = int(np.asarray(counts[:n]).astype(np.int64).sum())
    assert total == brute_force_total(pos, h, np.asarray(box.limits), True)

    # epoch 2: the particle set GROWS past the current capacity
    n_new = 700
    pos2 = np.concatenate(
        [pos, rng.uniform(0.0, 1.0, size=(n_new, 3)).astype(np.float32)]
    )
    h2 = np.full(n0 + n_new, 0.05, np.float32)
    n_calls_before = len(calls)
    run2, n2 = make_run(pos2, h2)
    (state2, res2), caps = sync_with_retry(run2, caps)
    assert caps["local"] >= n2, "local capacity did not grow"
    assert len(calls) > n_calls_before + 1, "growth epoch must retry"
    assert int(res2.overflow) == 0
    assert int(res2.end_index) - int(res2.start_index) == n2
    counts2, ovf2, _ = _find_counts(res2, state2.box, caps["local"])
    assert int(ovf2) == 0
    total2 = int(np.asarray(counts2[:n2]).astype(np.int64).sum())
    assert total2 == brute_force_total(pos2, h2, np.asarray(box.limits), True)


def test_resize_multirank_imbalanced_growth():
    """Ranks gain different particle counts between epochs; the assignment
    rebalances and the flagship invariant holds at the new size."""
    n_ranks, n_per = 8, 120
    n0 = n_ranks * n_per
    rng = np.random.RandomState(59)
    box = make_box(0.0, 1.0, boundaries=PERIODIC)
    pos = rng.uniform(0.0, 1.0, size=(n0, 3)).astype(np.float32)
    h = np.full(n0, 0.06, np.float32)

    mesh = make_mesh(n_ranks)
    sharding = NamedSharding(mesh, P(rank_axis))

    def run_epoch(pos_by_rank, h_by_rank, cap):
        counts_per_rank = np.array([p.shape[0] for p in pos_by_rank])
        assert counts_per_rank.max() <= cap

        def pad(list_of, fill=0.0):
            out = np.full((n_ranks, cap), fill, np.float32)
            for r, a in enumerate(list_of):
                out[r, : a.shape[0]] = a
            return jax.device_put(jnp.asarray(out.reshape(-1)), sharding)

        xl = pad([p[:, 0] for p in pos_by_rank])
        yl = pad([p[:, 1] for p in pos_by_rank])
        zl = pad([p[:, 2] for p in pos_by_rank])
        hl = pad(h_by_rank)
        nl = jax.device_put(
            jnp.asarray(counts_per_rank, jnp.int32), sharding
        )

        def step(xl, yl, zl, hl, nl):
            rank = jax.lax.axis_index(rank_axis)
            domain = Domain(
                rank=rank, n_ranks=n_ranks, bucket_size=16,
                bucket_size_focus=8, key_dtype=jnp.uint64,
                tree_capacity=1024, focus_capacity=2048, axis_name=rank_axis,
            )
            state = domain.init_state(box=box, boundaries=box.boundaries)
            state, res = domain.sync(state, xl, yl, zl, hl, n_local=nl[0])
            counts, novf, _ = _find_counts(res, state.box, cap)
            j = jnp.arange(cap, dtype=jnp.int32)
            owned = (j >= res.start_index) & (j < res.end_index)
            n_owned = (res.end_index - res.start_index).astype(jnp.int64)
            return (
                jax.lax.psum(
                    jnp.sum(jnp.where(owned, counts.astype(jnp.int64), 0)),
                    rank_axis,
                ),
                jax.lax.psum(n_owned, rank_axis),
                jax.lax.pmax(res.overflow + novf.astype(jnp.int32), rank_axis),
                jax.lax.pmax(n_owned, rank_axis),
                jax.lax.pmin(n_owned, rank_axis),
            )

        fn = jax.jit(shard_map(
            step, mesh=mesh,
            in_specs=(P(rank_axis),) * 5, out_specs=(P(),) * 5,
            check_vma=False,
        ))
        return [int(v) for v in jax.block_until_ready(fn(xl, yl, zl, hl, nl))]

    pos_by_rank = list(pos.reshape(n_ranks, n_per, 3))
    h_by_rank = list(h.reshape(n_ranks, n_per))
    cap = 6 * n_per

    total, assigned, ovf, mx, mn = run_epoch(pos_by_rank, h_by_rank, cap)
    assert ovf == 0 and assigned == n0
    assert total == brute_force_total(pos, h, np.asarray(box.limits), True)

    # epoch 2: only ranks 0 and 1 gain particles — 3x and 2x their size
    extra0 = rng.uniform(0.0, 1.0, size=(2 * n_per, 3)).astype(np.float32)
    extra1 = rng.uniform(0.0, 1.0, size=(n_per, 3)).astype(np.float32)
    pos_by_rank[0] = np.concatenate([pos_by_rank[0], extra0])
    pos_by_rank[1] = np.concatenate([pos_by_rank[1], extra1])
    h_by_rank[0] = np.full(3 * n_per, 0.06, np.float32)
    h_by_rank[1] = np.full(2 * n_per, 0.06, np.float32)
    n1 = n0 + 3 * n_per

    total, assigned, ovf, mx, mn = run_epoch(pos_by_rank, h_by_rank, cap)
    assert ovf == 0 and assigned == n1
    pos_all = np.concatenate(pos_by_rank)
    h_all = np.concatenate(h_by_rank)
    assert total == brute_force_total(pos_all, h_all, np.asarray(box.limits), True)
    # the new assignment is balanced: no rank holds more than ~2x the mean
    assert mx <= 2 * (n1 // n_ranks) + n1 // 16, (mx, mn)
