"""Pallas TPU kernel for the 27-point cell-list neighbor stencil.

Dense, regular companion to traversal/celllist.py: the XLA roll-stencil is
exact but runs ~6-8x above the VPU roofline (the (n_cells, cap, cap)
broadcast/reduce pattern materializes badly). This kernel keeps the whole
working set in VMEM: grid over (x, y) cell columns, per step DMA the 3x3
neighborhood's z-lines from HBM, then a z-block loop computes dense
(targets x candidates) f32 distance tiles.

Semantics contract (same as celllist.stencil_neighbor_counts, reference
findneighbors.hpp:96-165): count j != i with |r_ij|^2 < r2_i. Ghost cells
(periodic wrap with +-L correction, or invalid for open boundaries) are
materialized by the XLA prep in `pad_cell_grid`, so the kernel sees no
boundary logic at all. Invalid candidate slots carry coordinate 1e30 (fail
every distance test); invalid targets carry r2 < 0 (count 0). The kernel
counts the self-pair (d2 = 0 < r2); the wrapper subtracts it, which also
keeps coincident distinct particles counted, like the reference.

Layout: candidates ride the LANE axis (z-lines are contiguous minor-dim
vectors; all slices start at lane multiples because zb_cells*cap is a
multiple of 128). Targets ride the SUBLANE axis via an XLA-prepared
(D*D, D*cap, 4) tensor blocked per grid step — the same split the v2
run-streaming kernel uses (targets (G,3) VMEM blocks vs streamed tiles).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pad_cell_grid", "stencil_counts_pallas"]

INVALID_COORD = np.float32(1e30)


def pad_cell_grid(
    ex: jax.Array,  # (D, D, D, cap) ELL coords, row-major cell order
    ey: jax.Array,
    ez: jax.Array,
    valid: jax.Array,  # (D, D, D, cap) occupancy
    lengths,  # (3,) box lengths (jax or numpy)
    periodic: Tuple[bool, bool, bool],
):
    """Materialize ghost cells: wrap + length-correct periodic dims, mark
    open-boundary ghosts invalid. Returns (xp, yp, zp) shaped
    (D+2, D+2, (D+2)*cap)."""
    D, _, _, cap = ex.shape
    L = jnp.asarray(lengths, jnp.float32)

    ex = jnp.where(valid, ex, INVALID_COORD)
    ey = jnp.where(valid, ey, INVALID_COORD)
    ez = jnp.where(valid, ez, INVALID_COORD)

    def pad_axis(a, axis, Ld, per, is_coord_axis):
        lo = jax.lax.slice_in_dim(a, D - 1, D, axis=axis)
        hi = jax.lax.slice_in_dim(a, 0, 1, axis=axis)
        if per:
            if is_coord_axis:
                lo = lo - Ld
                hi = hi + Ld
        else:
            lo = jnp.full_like(lo, INVALID_COORD)
            hi = jnp.full_like(hi, INVALID_COORD)
        return jnp.concatenate([lo, a, hi], axis=axis)

    def pad3(a, coord_axis):
        # the ghost coordinate shift applies only to the coordinate
        # matching the wrapped axis
        a = pad_axis(a, 0, L[0], periodic[0], coord_axis == 0)
        a = pad_axis(a, 1, L[1], periodic[1], coord_axis == 1)
        a = pad_axis(a, 2, L[2], periodic[2], coord_axis == 2)
        return a

    # (Dp*Dp, 1, 3*Dp*cap): the flattened (x, y) index rides dim 0, which
    # is outside the (sublane, lane) tiling of the last two dims — so the
    # kernel's per-row DMA slices need no 8/128 alignment. The three
    # coordinates sit side by side on the lane axis (each Dp*cap wide, a
    # multiple of 128), letting one DMA fetch a whole cell row.
    Dp = D + 2
    xp = pad3(ex, 0).reshape(Dp * Dp, 1, Dp * cap)
    yp = pad3(ey, 1).reshape(Dp * Dp, 1, Dp * cap)
    zp = pad3(ez, 2).reshape(Dp * Dp, 1, Dp * cap)
    return jnp.concatenate([xp, yp, zp], axis=-1)


def _kernel(
    cand_hbm,  # (Dp*Dp, 1, 3*Dp*cap) HBM candidate grid (x|y|z on lanes)
    tgt_ref,  # (1, D*cap, 4) VMEM block: x,y,z,r2 per target
    out_ref,  # (1, D*cap, 1) VMEM block
    cw,  # VMEM scratch (2, 9, 1, 3*Dp*cap) double-buffered windows
    sems,  # DMA semaphores (2, 3)
    *,
    D: int,
    cap: int,
    zb_cells: int,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    Dp = jnp.int32(D + 2)
    line = (D + 2) * cap  # lane offset between x, y, z sections

    # Double-buffered column windows: each grid step waits on the DMAs its
    # predecessor started for it and prefetches the next column, so the
    # ~10-20us HBM copy latency overlaps compute instead of serializing
    # (one DMA per x-offset; each copies 3 consecutive rows = the j-window).
    t = i * jnp.int32(D) + j
    slot = jax.lax.rem(t, 2)

    def _copies(tt, sl):
        ii = tt // jnp.int32(D)
        jj = jax.lax.rem(tt, jnp.int32(D))
        return [
            pltpu.make_async_copy(
                cand_hbm.at[pl.ds((ii + jnp.int32(dx)) * Dp + jj, 3)],
                cw.at[sl, pl.ds(jnp.int32(3 * dx), 3)],
                sems.at[sl, jnp.int32(dx)],
            )
            for dx in range(3)
        ]

    @pl.when(t == 0)
    def _():
        for d in _copies(t, slot):
            d.start()

    @pl.when(t + 1 < D * D)
    def _():
        for d in _copies(t + 1, jnp.int32(1) - slot):
            d.start()

    for d in _copies(t, slot):
        d.wait()

    T = zb_cells * cap  # targets per z-block
    W = (zb_cells + 2) * cap  # candidate window
    n_zb = D // zb_cells

    for zb in range(n_zb):  # static unroll; offsets stay lane-aligned
        toff = zb * T
        tile = tgt_ref[0, pl.ds(toff, T), :]  # (T, 4) sublane-major
        t_x = tile[:, 0:1]
        t_y = tile[:, 1:2]
        t_z = tile[:, 2:3]
        t_r2 = tile[:, 3:4]
        # accumulate hits in the full (T, W) tile and reduce over lanes
        # ONCE per z-block — the per-window lane reduction would cost
        # ~2 extra vector ops per element in the roofline-bound loop
        acc = jnp.zeros((T, W), jnp.float32)
        for k in range(9):
            c_x = cw[slot, k, 0, pl.ds(toff, W)].reshape(1, W)
            c_y = cw[slot, k, 0, pl.ds(line + toff, W)].reshape(1, W)
            c_z = cw[slot, k, 0, pl.ds(2 * line + toff, W)].reshape(1, W)
            ddx = t_x - c_x
            ddy = t_y - c_y
            ddz = t_z - c_z
            d2 = ddx * ddx + ddy * ddy + ddz * ddz
            acc = jnp.where(d2 < t_r2, acc + 1.0, acc)
        out_ref[0, pl.ds(toff, T), :] = jnp.sum(acc, axis=1, keepdims=True)


@partial(jax.jit, static_argnames=("D", "cap", "zb_cells", "interpret"))
def _call(cand, tgt, D, cap, zb_cells, interpret):
    Dp = D + 2
    return pl.pallas_call(
        partial(_kernel, D=D, cap=cap, zb_cells=zb_cells),
        grid=(D, D),
        in_specs=[
            # keep the candidate grid in HBM: an ANY placement lets the
            # compiler pick VMEM, where the row-window slice breaks
            # sublane tiling (dim-1 slices must be multiples of 8)
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (1, D * cap, 4), lambda i, j: (i * D + j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, D * cap, 1), lambda i, j: (i * D + j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((D * D, D * cap, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 9, 1, 3 * Dp * cap), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        # large caps (e.g. 256 at 4M particles) push the statically
        # unrolled z-block temporaries past the default 16M scoped-vmem
        # budget; v5e has 128MB of VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cand, tgt)


def stencil_counts_pallas(
    px: jax.Array,  # (n_cells, cap) ELL coords, row-major cell order
    py: jax.Array,
    pz: jax.Array,
    r2: jax.Array,  # (n_cells, cap); < 0 marks invalid targets
    valid: jax.Array,  # (n_cells, cap)
    lengths,
    periodic: Tuple[bool, bool, bool],
    level: int,
    zb_cells: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """(n_cells, cap) exact neighbor counts — Pallas TPU fast path."""
    D = 1 << int(level)
    cap = px.shape[1]
    if zb_cells == 0:
        for zb in range(1, D + 1):
            if D % zb == 0 and (zb * cap) % 128 == 0:
                zb_cells = zb
                break
        else:
            raise ValueError(
                f"no lane-aligned z-block for D={D}, cap={cap}; "
                "use the XLA stencil instead"
            )
    assert (zb_cells * cap) % 128 == 0, "z-block must be lane-aligned"
    assert D % zb_cells == 0
    shp = (D, D, D, cap)
    cand = pad_cell_grid(
        px.reshape(shp), py.reshape(shp), pz.reshape(shp),
        valid.reshape(shp), lengths, periodic,
    )
    tgt = jnp.stack(
        [px.astype(jnp.float32), py.astype(jnp.float32),
         pz.astype(jnp.float32), r2.astype(jnp.float32)], axis=-1
    ).reshape(D * D, D * cap, 4)

    prev_x64 = jax.config.jax_enable_x64
    try:
        if prev_x64:
            jax.config.update("jax_enable_x64", False)
        counts = _call(
            cand, tgt, D=D, cap=cap,
            zb_cells=int(zb_cells), interpret=interpret,
        )
    finally:
        if prev_x64:
            jax.config.update("jax_enable_x64", True)

    counts = counts.reshape(-1, cap).astype(jnp.int32)
    # remove the self-pair every valid target counted (d2 = 0 < r2)
    counts = counts - (valid & (r2 > 0)).astype(jnp.int32)
    return counts
