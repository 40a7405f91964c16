"""Peer-window protocol tests (findPeersMac scoping, peers.hpp:63-117).

With Domain(peer_window=W), the count/sum services and the halo
request-keys protocol run over (2W+1, cap) peer-window buffers moved by
ppermute rounds, instead of dense (n_ranks, cap) all_to_all — per-rank
protocol memory and traffic scale with the SFC-surface peer count, not
with the rank count. A too-small window is reported in
overflow_detail[6] (the max rank offset actually needed) and grown by
the host retry loop like any other capacity.

The flagship invariant (test/integration_mpi/domain_nranks.cpp analog)
must hold on the windowed path with W strictly below n_ranks-1, i.e.
with the dense fallback genuinely out of the picture.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from cstone_tpu.domain.domain import Domain
from cstone_tpu.parallel import make_mesh, rank_axis
from cstone_tpu.sfc import make_box

from test_domain import brute_force_total, _find_counts


def _run_windowed(pos, h, box, n_ranks, n_per, cap, window):
    """One sync + neighbor count pass with a static peer window; returns
    host scalars (total, assigned, overflow, win_need, halo_rows)."""
    mesh = make_mesh(n_ranks)
    sharding = NamedSharding(mesh, P(rank_axis))

    def pad_local(a):
        out = np.zeros((n_ranks, cap), dtype=a.dtype)
        out[:, :n_per] = a.reshape(n_ranks, n_per)
        return jax.device_put(jnp.asarray(out.reshape(-1)), sharding)

    xl, yl, zl = pad_local(pos[:, 0]), pad_local(pos[:, 1]), pad_local(pos[:, 2])
    hl = pad_local(h)

    halo_rows = {}

    def step(xl, yl, zl, hl):
        rank = jax.lax.axis_index(rank_axis)
        domain = Domain(
            rank=rank, n_ranks=n_ranks, bucket_size=16, bucket_size_focus=8,
            key_dtype=jnp.uint64, tree_capacity=1024, focus_capacity=2048,
            axis_name=rank_axis, peer_window=window,
        )
        state = domain.init_state(box=box, boundaries=box.boundaries)
        state, result = domain.sync(state, xl, yl, zl, hl, n_local=jnp.int32(n_per))
        halo_rows["rows"] = result.halo_record.send_idx.shape[0]
        halo_rows["window"] = result.halo_record.window
        counts, ovf, _ = _find_counts(result, state.box, cap)
        j = jnp.arange(cap, dtype=jnp.int32)
        owned = (j >= result.start_index) & (j < result.end_index)
        local_sum = jnp.sum(jnp.where(owned, counts.astype(jnp.int64), 0))
        return (
            jax.lax.psum(local_sum, rank_axis),
            jax.lax.psum(
                (result.end_index - result.start_index).astype(jnp.int64), rank_axis
            ),
            jax.lax.pmax(result.overflow + ovf.astype(jnp.int32), rank_axis),
            jax.lax.pmax(result.overflow_detail[6], rank_axis),
        )

    fn = jax.jit(
        shard_map(
            step, mesh=mesh, in_specs=(P(rank_axis),) * 4,
            out_specs=(P(),) * 4, check_vma=False,
        )
    )
    total, assigned, ovf, win_need = jax.block_until_ready(fn(xl, yl, zl, hl))
    return (
        int(total), int(assigned), int(ovf), int(win_need),
        halo_rows["rows"], halo_rows["window"],
    )


def test_domain_window_flagship_8ranks():
    """Flagship neighbor-sum invariant on the windowed protocol path, with
    the window grown from 1 by the overflow_detail[6] report — exactly how
    sync_with_retry grows it.

    At 8 ranks every rank is an SFC-surface peer of every other (the
    Hilbert curve does not bound spatial-neighbor rank offsets — measured:
    rank 0's halo owners include rank 7 even on an elongated slab), so the
    window legitimately grows toward the dense bound; what this verifies
    is the growth protocol and that a converged window reproduces the
    exact answer. Surface-proportional buffer scaling is the ragged
    exchange's job (test_exchange_ragged.py)."""
    n_ranks, n_per = 8, 250
    n = n_ranks * n_per
    cap = 4 * n_per
    rng = np.random.RandomState(17)
    pos = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    pos[:, 0] *= 16.0  # slab: 16 x 1 x 1
    h = rng.uniform(0.05, 0.09, size=n).astype(np.float32)
    box = make_box(0.0, 16.0, 0.0, 1.0, 0.0, 1.0)

    window = 1
    attempts = []
    for _ in range(4):
        total, assigned, ovf, win_need, rows, rec_window = _run_windowed(
            pos, h, box, n_ranks, n_per, cap, window
        )
        attempts.append((window, ovf, win_need))
        # protocol buffers must span the peer window, not the rank axis
        assert rows == 2 * window + 1
        assert rec_window == window
        if ovf == 0:
            break
        assert win_need > window, f"overflow without a window report: {attempts}"
        window = win_need
    else:
        raise AssertionError(f"window never converged: {attempts}")

    assert len(attempts) > 1, "growth protocol must actually engage"
    assert assigned == n
    expect = brute_force_total(pos, h, np.asarray(box.limits), False)
    assert total == expect


def test_window_full_width_matches_dense():
    """A full-width window (W = n_ranks-1) covers every rank pair, so the
    windowed ppermute protocol must reproduce the dense all_to_all result
    bit-for-bit on the same particles."""
    n_ranks, n_per = 4, 200
    n = n_ranks * n_per
    cap = 4 * n_per
    rng = np.random.RandomState(31)
    pos = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    h = rng.uniform(0.04, 0.08, size=n).astype(np.float32)
    box = make_box(-1.0, 1.0)

    total_w, assigned_w, ovf_w, _, rows, _ = _run_windowed(
        pos, h, box, n_ranks, n_per, cap, n_ranks - 1
    )
    assert ovf_w == 0
    assert rows == 2 * (n_ranks - 1) + 1
    total_d, assigned_d, ovf_d, _, rows_d, rec_window = _run_windowed(
        pos, h, box, n_ranks, n_per, cap, 0  # 0 = dense all_to_all path
    )
    assert ovf_d == 0
    assert rec_window is None and rows_d == n_ranks
    assert (total_w, assigned_w) == (total_d, assigned_d)
    expect = brute_force_total(pos, h, np.asarray(box.limits), False)
    assert total_w == expect
