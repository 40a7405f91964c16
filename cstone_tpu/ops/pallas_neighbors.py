"""Pallas TPU kernel for the dense pairwise phase of neighbor search.

The counterpart of the reference's warp all-pairs interaction loop
(reference: traversal/find_neighbors.cuh:94-124 countNeighbors). Candidate
coordinates are pre-gathered per group; the kernel keeps a block of groups'
targets and candidates in VMEM and computes the (targets x candidates)
distance mask without materializing intermediates in HBM — the part XLA's
chunked lax.map formulation spills.

Layout: groups are the grid dimension; per grid step the kernel loads
(GB, G, 3) targets and (GB, C, 3) candidates and emits (GB, G) counts.
Invalid candidates are pre-poisoned with +inf coordinates; self-exclusion
compares candidate indices against target indices computed from the grid
position.
"""

# NOTE: no `from __future__ import annotations` here — postponed (string)
# annotations break Mosaic lowering of the kernel (func.return i32/i64).

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pairwise_count"]


def _kernel(tgt_ref, r2_ref, cand_ref, cidx_ref, out_ref, *, group_size: int):
    gb = tgt_ref.shape[0]
    G = group_size
    C = cand_ref.shape[1]
    # python ints promote through i64 and recurse under tracing (see
    # pallas_neighbors_v2.py) — wrap every scalar constant as int32
    base_group = pl.program_id(0) * jnp.int32(gb)

    def one_group(g, _):
        T = tgt_ref[g]  # (G, 3)
        Cc = cand_ref[g]  # (C, 3)
        r2 = r2_ref[g]  # (G,)
        ci = cidx_ref[g]  # (C,)

        dx = T[:, 0:1] - Cc[:, 0][None, :]
        dy = T[:, 1:2] - Cc[:, 1][None, :]
        dz = T[:, 2:3] - Cc[:, 2][None, :]
        d2 = dx * dx + dy * dy + dz * dz  # (G, C)

        tgt_idx = (
            (base_group + g) * jnp.int32(G)
            + jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
        )
        not_self = ci[None, :] != tgt_idx
        within = (d2 < r2[:, None]) & not_self
        out_ref[g, :] = jnp.sum(within, axis=1, dtype=jnp.int32).astype(jnp.uint32)
        return 0

    jax.lax.fori_loop(0, gb, one_group, 0)


def pairwise_count(
    targets: jax.Array,  # (n_groups, G, 3) f32
    r2: jax.Array,  # (n_groups, G) squared search radii (can be <0 for pad)
    cand: jax.Array,  # (n_groups, C, 3) f32, invalid rows = +inf
    cand_idx: jax.Array,  # (n_groups, C) int32 particle ids
    group_block: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """(n_groups, G) neighbor counts."""
    # x64 tracing leaks i64 scalars into the kernel; Mosaic's i64->u32
    # convert lowering recurses forever. Flip x64 off around the trace,
    # exactly as pallas_neighbors_v2.py does.
    prev_x64 = jax.config.jax_enable_x64
    try:
        if prev_x64:
            jax.config.update("jax_enable_x64", False)
        return _pairwise_count_call(
            targets, r2, cand, cand_idx,
            group_block=group_block, interpret=interpret,
        )
    finally:
        if prev_x64:
            jax.config.update("jax_enable_x64", True)


@partial(jax.jit, static_argnames=("group_block", "interpret"))
def _pairwise_count_call(
    targets, r2, cand, cand_idx, group_block, interpret
) -> jax.Array:
    n_groups, G, _ = targets.shape
    C = cand.shape[1]
    assert n_groups % group_block == 0, "pad n_groups to group_block"
    grid = (n_groups // group_block,)

    return pl.pallas_call(
        partial(_kernel, group_size=G),
        grid=grid,
        in_specs=[
            pl.BlockSpec((group_block, G, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group_block, G), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group_block, C, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group_block, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group_block, G), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_groups, G), jnp.uint32),
        # the (G, C) distance intermediates exceed Mosaic's default 16MB
        # scoped-vmem budget; v5e has 128MB of VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(targets, r2, cand, cand_idx)
