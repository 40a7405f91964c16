"""Cross-rank focus-quantity exchange on the 8-device mesh
(mirrors test/integration_mpi/exchange_general.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from cstone_tpu.domain.decomposition import SfcAssignment
from cstone_tpu.focus.exchange_focus import exchange_focus_quantities
from cstone_tpu.parallel import make_mesh, rank_axis
from cstone_tpu.sfc.keys import node_range
from cstone_tpu.tree.csarray import compute_spanning_tree


def test_exchange_focus_quantities_8ranks():
    n_ranks = 8
    mesh = make_mesh(n_ranks)
    dt = np.uint64
    end = np.uint64(1) << np.uint64(63)

    # assignment: 8 equal level-1 octants
    bounds = np.arange(n_ranks + 1, dtype=dt) * (end // np.uint64(8))
    assignment = SfcAssignment(
        boundaries=jnp.asarray(bounds), counts=jnp.zeros((n_ranks,), jnp.int64)
    )

    # every rank uses the same focus tree: all 64 level-2 cells
    cap = 128
    splits = np.full(cap + 1, end, dtype=dt)
    lvl2 = np.arange(65, dtype=np.uint64) * (end // np.uint64(64))
    splits[:65] = lvl2
    leaves = jnp.asarray(splits)

    def step(_):
        rank = jax.lax.axis_index(rank_axis)
        # per-leaf value: authoritative only for own cells = 1000*rank + leaf
        li = jnp.arange(cap, dtype=jnp.int32)
        owner = jnp.clip(li // 8, 0, n_ranks - 1)  # 8 level-2 cells per rank
        values = jnp.where(
            owner == rank, 1000 * rank + li, -1
        ).astype(jnp.int32)
        out, matched = exchange_focus_quantities(
            leaves, values, assignment, rank, rank_axis
        )
        return out, matched.astype(jnp.int32)

    fn = jax.jit(
        shard_map(
            step, mesh=mesh, in_specs=(P(rank_axis),),
            out_specs=(P(rank_axis), P(rank_axis)), check_vma=False,
        )
    )
    dummy = jax.device_put(
        jnp.zeros((n_ranks,), jnp.int32), NamedSharding(mesh, P(rank_axis))
    )
    out, matched = fn(dummy)
    out = np.asarray(out).reshape(n_ranks, cap)
    matched = np.asarray(matched).reshape(n_ranks, cap)

    for r in range(n_ranks):
        for leaf in range(64):
            owner = leaf // 8
            assert matched[r, leaf] == 1
            assert out[r, leaf] == 1000 * owner + leaf, (r, leaf)
