"""Pallas TPU kernel v2: pairwise neighbor counts by streaming candidate runs.

Instead of pre-gathering candidate coordinates (v1, ~670MB of random
gathers per step at 1M particles), this version exploits SFC sortedness:
a group's candidate leaves form a handful of CONTIGUOUS particle-index
runs. The kernel DMAs each run from the sorted coordinate arrays in HBM
into VMEM tiles and accumulates the (targets x tile) distance mask — the
same dataflow as the reference's warp kernel streaming cell by cell
(reference: traversal/find_neighbors.cuh:200-343), recast as DMA tiles.

Correctness: runs cover exactly the candidate leaf ranges (merged when
adjacent); tiles are masked to the run length, so no particle is tested
twice and none is missed.
"""

# NOTE: no `from __future__ import annotations` here — postponed (string)
# annotations break Mosaic lowering of the kernel (func.return i32/i64).

import sys
from functools import partial
from typing import Tuple

# the statically-unrolled group block plus nested loop tracing produces deep
# Python call stacks during kernel tracing; the default limit is too low
sys.setrecursionlimit(max(sys.getrecursionlimit(), 20000))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["merge_leaf_runs", "pairwise_count_runs"]


def merge_leaf_runs(
    leaf_idx: jax.Array,  # (n_groups, K) candidate cornerstone leaf indices
    n_cand: jax.Array,  # (n_groups,) valid slots per group (may exceed K)
    layout: jax.Array,  # (cap_leaf+1,) particle offsets per leaf
    run_cap: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Merge adjacent candidate leaf ranges into contiguous particle runs.

    Traversal emits leaves in DFS order over the prefix-sorted tree, which
    is SFC order — so adjacent candidate leaves usually have contiguous
    layout ranges. Returns (run_start (n_groups, run_cap), run_len, n_runs,
    overflow_flag); runs beyond n_runs have length 0.
    """
    n_groups, K = leaf_idx.shape
    k = jnp.arange(K, dtype=jnp.int32)
    valid = k[None, :] < jnp.minimum(n_cand, K)[:, None]

    # traversal emits in DFS pop order; sort each group's leaves so adjacent
    # cells merge into maximal runs
    sort_key = jnp.where(valid, leaf_idx, jnp.int32(0x7FFFFFFF))
    leaf_sorted = jnp.sort(sort_key, axis=1)
    valid = leaf_sorted != jnp.int32(0x7FFFFFFF)
    leaf_safe = jnp.where(valid, leaf_sorted, 0)

    start = jnp.where(valid, layout[leaf_safe], 0)
    end = jnp.where(valid, layout[leaf_safe + 1], 0)
    nonempty = valid & (end > start)

    prev_end = jnp.concatenate(
        [jnp.full((n_groups, 1), -1, dtype=end.dtype), end[:, :-1]], axis=1
    )
    # a new run starts at slot k if it is nonempty and does not extend the
    # previous nonempty slot; empty slots never break runs — carry forward
    # the last nonempty end via a max-scan of (position-tagged ends)
    tag = jnp.where(nonempty, k, -1)
    last_nonempty = jax.lax.cummax(tag, axis=1)
    prev_tag = jnp.concatenate(
        [jnp.full((n_groups, 1), -1, jnp.int32), last_nonempty[:, :-1]], axis=1
    )
    prev_end_carried = jnp.where(
        prev_tag >= 0,
        jnp.take_along_axis(end, jnp.maximum(prev_tag, 0), axis=1),
        -1,
    )
    new_run = nonempty & (start != prev_end_carried)

    run_id = jnp.cumsum(new_run.astype(jnp.int32), axis=1) - 1  # per slot
    n_runs = jnp.max(jnp.where(nonempty, run_id + 1, 0), axis=1)

    rows = jnp.arange(n_groups, dtype=jnp.int32)[:, None]
    run_start = jnp.zeros((n_groups, run_cap), dtype=jnp.int32)
    ok_s = new_run & (run_id < run_cap)
    run_start = run_start.at[
        jnp.where(ok_s, rows, n_groups), jnp.where(ok_s, run_id, 0)
    ].set(start.astype(jnp.int32), mode="drop")

    run_end = jnp.zeros((n_groups, run_cap), dtype=jnp.int32)
    ok_e = nonempty & (run_id < run_cap)
    run_end = run_end.at[
        jnp.where(ok_e, rows, n_groups), jnp.where(ok_e, run_id, 0)
    ].max(end.astype(jnp.int32), mode="drop")

    run_len = jnp.maximum(run_end - run_start, 0)
    overflow = jnp.max(n_runs) > run_cap
    return run_start, run_len, n_runs, overflow


def _kernel(
    run_start_ref,  # (GB, R) SMEM
    run_len_ref,  # (GB, R) SMEM
    box_ref,  # (1, 9) SMEM: Lx Ly Lz iLx iLy iLz pbcx pbcy pbcz
    tgt_ref,  # (GB, G, 3) VMEM
    r2_ref,  # (GB, G) VMEM
    xs_hbm,  # (n_rows, 128) HBM — 1-D coords reshaped; rows tile to (8,128)
    ys_hbm,
    zs_hbm,
    out_ref,  # (GB, G) VMEM
    xt, yt, zt,  # (1, W//128, 128) VMEM scratch tiles
    sems,  # DMA semaphores (3,)
    *,
    group_size: int,
    tile: int,
    run_cap: int,
    n_particles: int,
):
    G = group_size
    W = tile  # elements per tile; must be a multiple of 1024 (HBM slice tiling)
    WR = W // 128  # rows per tile
    GB = tgt_ref.shape[0]
    Lx, Ly, Lz = box_ref[0, 0], box_ref[0, 1], box_ref[0, 2]
    iLx, iLy, iLz = box_ref[0, 3], box_ref[0, 4], box_ref[0, 5]
    px, py_, pz_ = box_ref[0, 6], box_ref[0, 7], box_ref[0, 8]
    # static unroll over the group block; traced loops over groups trip
    # lowering bugs (closed_call caching, loop-carry legalization)
    for g in range(GB):
        base_target = (pl.program_id(0) * jnp.int32(GB) + jnp.int32(g)) * jnp.int32(G)
        T = tgt_ref[g]  # (G, 3)
        r2 = r2_ref[g]  # (G,)

        def run_body(r, counts, T=T, r2=r2, base_target=base_target, g=g):
            start = run_start_ref[g, r]
            length = run_len_ref[g, r]
            w32 = jnp.int32(W)
            # align the window start down to a tile boundary; HBM memref
            # slices must be 1024-element aligned
            astart = (start // w32) * w32
            n_tiles = pl.cdiv(start + length - astart, w32)
            n_tiles = jnp.where(length > 0, n_tiles, jnp.int32(0))

            def tile_body(t, counts):
                row = (astart + t * w32) // jnp.int32(128)
                row = jnp.minimum(row, jnp.int32((n_particles - W) // 128))
                # synchronous per-tile DMA (double buffering currently trips
                # Mosaic loop-carry legalization; revisit)
                dmas = [
                    pltpu.make_async_copy(
                        src.at[pl.ds(row, WR), :], dst.at[jnp.int32(0)],
                        sems.at[jnp.int32(i)],
                    )
                    for i, (src, dst) in enumerate(
                        ((xs_hbm, xt), (ys_hbm, yt), (zs_hbm, zt))
                    )
                ]
                for d in dmas:
                    d.start()
                for d in dmas:
                    d.wait()

                zero = jnp.int32(0)
                cx = xt[zero].reshape(1, W)
                cy = yt[zero].reshape(1, W)
                cz = zt[zero].reshape(1, W)
                dx = T[:, 0:1] - cx
                dy = T[:, 1:2] - cy
                dz = T[:, 2:3] - cz
                # minimum-image wrap (no-op for open boundaries: flags 0).
                # floor(v+0.5) instead of rint: at the exact half-way point
                # both images are equidistant, so the distance is identical.
                kx = jnp.floor(dx * iLx + 0.5)
                dx = dx - px * Lx * kx
                ky = jnp.floor(dy * iLy + 0.5)
                dy = dy - py_ * Ly * ky
                kz = jnp.floor(dz * iLz + 0.5)
                dz = dz - pz_ * Lz * kz
                d2 = dx * dx + dy * dy + dz * dz  # (G, W)

                off = jnp.minimum(astart + t * w32, jnp.int32(n_particles - W))
                lanes = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1) + off
                # mask to this tile's nominal range — clamped windows
                # overlap, so the run mask alone would double count
                lo = astart + t * w32
                in_tile = (lanes >= lo) & (lanes < lo + w32)
                in_run = (lanes >= start) & (lanes < start + length)
                tgt_idx = base_target + jax.lax.broadcasted_iota(
                    jnp.int32, (G, 1), 0
                )
                within = (
                    (d2 < r2[:, None]) & in_run & in_tile & (lanes != tgt_idx)
                )
                return counts + jnp.sum(within, axis=1, dtype=jnp.int32)

            return jax.lax.fori_loop(jnp.int32(0), n_tiles, tile_body, counts)

        counts = jnp.zeros((G,), jnp.int32)
        counts = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(run_cap), run_body, counts
        )
        out_ref[g, :] = counts.astype(jnp.uint32)


def pairwise_count_runs(
    targets: jax.Array,  # (n_groups, G, 3)
    r2: jax.Array,  # (n_groups, G)
    run_start: jax.Array,  # (n_groups, R) int32
    run_len: jax.Array,  # (n_groups, R) int32
    xs: jax.Array,  # (n_pad,) sorted coords, n_pad a multiple of `tile`
    ys: jax.Array,
    zs: jax.Array,
    box_params: jax.Array,  # (9,) f32: Lx Ly Lz iLx iLy iLz pbcx pbcy pbcz
    tile: int = 512,
    group_block: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """(n_groups, G) neighbor counts via run streaming.

    n_groups must be a multiple of group_block (pad groups with zero-length
    runs and r2 < 0).
    """
    n_groups, G, _ = targets.shape
    R = run_start.shape[1]
    n_pad = xs.shape[0]
    GB = group_block
    assert n_groups % GB == 0, "pad n_groups to group_block"
    assert tile % 1024 == 0, "tile must be a multiple of 1024 elements"
    assert n_pad % tile == 0, "pad coords to a tile multiple"
    WR = tile // 128
    xs2, ys2, zs2 = (a.reshape(-1, 128) for a in (xs, ys, zs))

    # Mosaic mis-lowers loop bounds to i64 when traced in x64 mode
    # (func.return i32/i64 legalization failure); every dtype here is
    # explicit, so tracing with x64 disabled is semantics-preserving.
    prev_x64 = jax.config.jax_enable_x64
    try:
        if prev_x64:
            jax.config.update("jax_enable_x64", False)
        return _call(
            targets, r2, run_start, run_len, xs2, ys2, zs2, box_params,
            tile=tile, group_block=group_block, interpret=interpret,
        )
    finally:
        if prev_x64:
            jax.config.update("jax_enable_x64", True)


@partial(jax.jit, static_argnames=("tile", "group_block", "interpret"))
def _call(targets, r2, run_start, run_len, xs2, ys2, zs2, box_params,
          tile, group_block, interpret):
    n_groups, G, _ = targets.shape
    R = run_start.shape[1]
    n_pad = xs2.shape[0] * 128
    GB = group_block
    WR = tile // 128

    return pl.pallas_call(
        partial(
            _kernel, group_size=G, tile=tile, run_cap=R, n_particles=n_pad
        ),
        grid=(n_groups // GB,),
        in_specs=[
            pl.BlockSpec((GB, R), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((GB, R), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 9), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((GB, G, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((GB, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_groups, G), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((1, WR, 128), jnp.float32),
            pltpu.VMEM((1, WR, 128), jnp.float32),
            pltpu.VMEM((1, WR, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(run_start, run_len, jnp.reshape(box_params, (1, 9)), targets, r2, xs2, ys2, zs2)
