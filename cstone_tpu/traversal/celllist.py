"""Dense cell-list neighbor search: ELL-packed grid bins + 27-point stencil.

TPU-first fast path for fixed-radius neighbor search, replacing per-group
tree/grid traversal with fully regular dataflow (reference semantics:
findneighbors.hpp:96-165 and traversal/find_neighbors.cuh:200-343 — same
neighbor definition, different algorithm). Exploits three structural
facts:

  1. at grid level ``level`` with cell side >= 2*h_max, every neighbor of
     a particle lies in the particle's own or the 26 adjacent cells;
  2. SFC-sorted particles are contiguous per grid cell, so binning is a
     row-gather, not a scatter;
  3. packing the bins in ROW-MAJOR grid order makes "adjacent cell" a
     constant array shift: the whole 27-cell stencil becomes jnp.roll
     slices — zero gathers and zero irregular control flow in the hot
     loop, which XLA fuses into dense VPU work.

Periodic boundaries are handled by adding +-L to the rolled-in candidate
coordinates (the roll IS the wrap); open/fixed boundaries mask the
rolled-in rows instead. Self-pairs are excluded by slot identity in the
(0,0,0) pass, matching the reference's i != j rule — coincident points
still count each other.

The ELL capacity ``cap`` bounds per-cell occupancy; cells with more
particles raise the overflow flag and the caller retries with a larger
cap (reference analog: util/reallocate.hpp growth loops).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..sfc.box import Box
from ..sfc.encode import HILBERT
from ..sfc.keys import max_tree_level
from .cover import build_cell_table

__all__ = [
    "choose_cell_level",
    "rowmajor_cell_perm",
    "ell_pack",
    "stencil_neighbor_counts",
    "cell_list_neighbor_counts",
    "cell_list_sph_density",
]


def choose_cell_level(box: Box, h_max: float, ext: float = 1.0, max_level: int = 7) -> int:
    """Coarsest grid level whose cell side >= 2*h_max*ext on every dim.

    Returns at least 2 (a 4^3 grid) — the stencil needs >= 3 distinct
    cells per periodic dim to be correct, and level 2 keeps the wrap
    images unique. Callers should fall back to a dense path when the
    search radius is too large for level 2 (i.e. when 2*h_max*ext >
    min_side/4).
    """
    min_side = float(np.min(np.asarray(box.lengths)))
    r = 2.0 * float(h_max) * float(ext)
    if r <= 0.0:
        return max_level
    level = int(np.floor(np.log2(min_side / r))) if r < min_side else 0
    return max(2, min(max_level, level))


def _np_hilbert_cell(ix, iy, iz, level: int) -> np.ndarray:
    """Pure-NumPy Hilbert cell index at `level` from level-resolution grid
    coords — same per-round math as sfc/hilbert.py::ihilbert (reference:
    hilbert.hpp:58-109). NumPy (not jnp) so it stays concrete inside jit
    traces; only ever run for 8^level <= 2^21 cells, once per level."""
    px = ix.astype(np.uint32)
    py = iy.astype(np.uint32)
    pz = iz.astype(np.uint32)
    key = np.zeros(px.shape, np.uint32)
    for i in range(level):
        lv = np.uint32(level - 1 - i)
        xi = (px >> lv) & 1
        yi = (py >> lv) & 1
        zi = (pz >> lv) & 1
        octant = (xi << 2) | (yi << 1) | zi
        key = (key << np.uint32(3)) + ((octant ^ (octant >> 1)) ^ (octant >> 2))
        not_yi = yi ^ 1
        not_zi = zi ^ 1
        mx = xi & (not_yi | zi)
        my = (xi & (yi | zi)) | (yi & not_zi)
        mz = (xi & not_yi & not_zi) | (yi & not_zi)
        px = px ^ (np.uint32(0) - mx)
        py = py ^ (np.uint32(0) - my)
        pz = pz ^ (np.uint32(0) - mz)
        rot = zi == 1
        swp = (zi == 0) & (yi == 0)
        npx = np.where(rot, py, np.where(swp, pz, px))
        npy = np.where(rot, pz, py)
        npz = np.where(rot, px, np.where(swp, px, pz))
        px, py, pz = npx, npy, npz
    return key


def _np_morton_cell(ix, iy, iz, level: int) -> np.ndarray:
    out = np.zeros(ix.shape, np.uint32)
    for b in range(level):
        out |= ((ix >> b) & 1).astype(np.uint32) << np.uint32(3 * b + 2)
        out |= ((iy >> b) & 1).astype(np.uint32) << np.uint32(3 * b + 1)
        out |= ((iz >> b) & 1).astype(np.uint32) << np.uint32(3 * b)
    return out


@lru_cache(maxsize=32)
def _rowmajor_cell_perm_np(level: int, curve: str) -> Tuple[np.ndarray, np.ndarray]:
    """(perm, inv_perm): perm[r] = SFC cell index of row-major cell r.

    Static per (level, curve) — computed once in NumPy and cached; the
    stencil path then never encodes keys for cells at runtime.
    """
    d = 1 << level
    ij = np.arange(d, dtype=np.uint32)
    ix, iy, iz = np.meshgrid(ij, ij, ij, indexing="ij")
    enc = _np_hilbert_cell if curve == HILBERT else _np_morton_cell
    perm = enc(ix.ravel(), iy.ravel(), iz.ravel(), level).astype(np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0], dtype=np.int32)
    return perm, inv


def rowmajor_cell_perm(level: int, curve: str = HILBERT) -> Tuple[jax.Array, jax.Array]:
    perm, inv = _rowmajor_cell_perm_np(int(level), curve)
    return jnp.asarray(perm), jnp.asarray(inv)


def ell_pack(
    offsets: jax.Array,  # (n_cells+1,) from build_cell_table (SFC cell order)
    perm: jax.Array,  # (n_cells,) row-major -> SFC cell index
    arrays: Tuple[jax.Array, ...],  # (n,) sorted particle fields
    cap: int,
) -> Tuple[Tuple[jax.Array, ...], jax.Array, jax.Array]:
    """Pack per-cell particle runs into (n_cells, cap) ELL rows in
    row-major cell order. Returns (packed arrays, valid mask, overflow).
    """
    n = arrays[0].shape[0]
    starts = offsets[perm]  # (n_cells,)
    counts = offsets[perm + 1] - starts
    j = jnp.arange(cap, dtype=jnp.int32)
    idx = starts[:, None] + j[None, :]
    valid = j[None, :] < counts[:, None]
    idx = jnp.where(valid, idx, 0)
    # one stacked row-gather instead of len(arrays) element gathers — XLA
    # TPU gathers cost per *index*, so fetching all fields per index is
    # measurably cheaper than separate gathers
    if len(arrays) > 1 and all(a.dtype == arrays[0].dtype for a in arrays):
        stacked = jnp.stack(arrays, axis=-1)[idx]  # (n_cells, cap, F)
        packed = tuple(stacked[..., f] for f in range(len(arrays)))
    else:
        packed = tuple(a[idx] for a in arrays)
    overflow = jnp.max(counts) > cap
    return packed, valid, overflow


INVALID_COORD = np.float32(1e30)


def ell_pack_scatter(
    keys_sorted: jax.Array,  # (n,) SFC-sorted particle keys
    perm: jax.Array,  # (n_cells,) row-major -> SFC cell index
    arrays: Tuple[jax.Array, ...],  # (n,) sorted f32 particle fields
    cap: int,
    level: int,
    n_valid=None,
) -> Tuple[Tuple[jax.Array, ...], jax.Array, jax.Array, jax.Array]:
    """Scatter-formulated ELL pack: no cell table, no slot gather.

    The gather form (ell_pack) touches n_cells*cap slot indices and needs
    a build_cell_table scatter-add first; XLA TPU scatters/gathers cost
    per *index*, so packing 1M particles into a 2x-padded grid that way
    costs ~3M index ops. This form costs exactly n: each particle's cell
    is its top key bits (particles are key-sorted, so within-cell rank is
    a cummax over run starts), and all F fields plus the particle index
    ride ONE (n, F+1) scatter. A final (n_cells,) row-permute rearranges
    SFC cell order to row-major — 8^level indices, negligible.

    Returns (packed arrays (n_cells, cap) each, valid, pidx, overflow):
    pidx maps ELL slots back to sorted particle positions (INT32_MAX
    sentinel in empty slots, sorts last), valid marks occupied slots.
    """
    n = keys_sorted.shape[0]
    dt = keys_sorted.dtype
    L = max_tree_level(dt)
    shift = dt.type(3 * (L - level))
    n_cells = 1 << (3 * level)
    F = len(arrays)
    assert all(a.dtype == jnp.float32 for a in arrays)

    # clamp in the key dtype BEFORE the int32 cast: sentinel-padded keys at
    # level == max_tree_level (shift 0) would otherwise wrap negative and
    # pass the `cell < n_cells` validity check
    cell = jnp.minimum(keys_sorted >> shift, dt.type(n_cells)).astype(jnp.int32)
    i = jnp.arange(n, dtype=jnp.int32)
    ok = cell < n_cells
    if n_valid is not None:
        ok = ok & (i < jnp.asarray(n_valid, jnp.int32))

    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), cell[1:] != cell[:-1]]
    )
    run_start = jax.lax.cummax(jnp.where(boundary, i, 0))
    rank = i - run_start
    overflow = jnp.max(jnp.where(ok, rank, -1)) >= cap

    tgt = jnp.where(ok & (rank < cap), cell * cap + rank, n_cells * cap)
    # F+1 SCALAR scatters, not one (n, F+1) row scatter: XLA TPU lowers
    # row scatters >2x slower than the equivalent scalar scatters
    # (measured 120ms vs 55ms for 1M rows of 5 — scripts/exp_scatter.py)
    def scat(vals, fill):
        buf = jnp.full((n_cells * cap,), fill, vals.dtype)
        buf = buf.at[tgt].set(vals, mode="drop")
        return buf.reshape(n_cells, cap)[perm]  # row-major cell order

    packed = tuple(scat(a, INVALID_COORD) for a in arrays)
    pidx = scat(i, jnp.int32(np.iinfo(np.int32).max))
    valid = packed[0] != INVALID_COORD
    return packed, valid, pidx, overflow


def ell_pack_gather(
    keys_sorted: jax.Array,  # (n,) SFC-sorted particle keys
    perm: jax.Array,  # (n_cells,) row-major -> SFC cell index
    arrays: Tuple[jax.Array, ...],  # (n,) sorted f32 particle fields
    cap: int,
    level: int,
    n_valid=None,
    blk: int = 64,
    cell_override: jax.Array = None,
) -> Tuple[Tuple[jax.Array, ...], jax.Array, jax.Array, jax.Array]:
    """Run-window ELL pack: one stacked row gather over per-cell runs.

    SFC-sorted particles are CONTIGUOUS per grid cell, so the pack is a
    window copy per cell, not a scatter: cell starts come from one
    searchsorted over the top key bits, and ALL fields ride a single
    (n_cells*cap)-row gather of the stacked (n, F) array. Measured on TPU
    (scripts/exp_pack.py, 1M/level-5/cap-64): ~21ms net vs ~35ms for the
    scalar-scatter form (ell_pack_scatter) — scatters pay ~2x per index
    and need one pass per field, the row gather pays once per slot. The
    slot->particle backmap (pidx) is arithmetic (start + lane), no
    scatter at all.

    The windows ride an 8-PARTICLE-BLOCK gather + shift-select rather than
    a per-slot gather: XLA TPU gathers cost per *index*, so fetching
    (cap/8 + 1) rows of 8 stacked particles per cell costs n_cells*(cap/8+1)
    indices (295k at 1M/level-5/cap-64 — 6.8x fewer than the 2M slot
    gather), then each cell's window is realigned to its run start with an
    8-way static-slice lane select (off = start % 8), which XLA fuses into
    one elementwise pass. Measured on TPU (scripts/exp_pack.py): ~8ms net
    including the searchsorted, vs ~17ms for the per-slot row gather and
    ~29ms for the scalar-scatter form.

    Same contract as ell_pack_scatter: returns (packed (n_cells, cap)
    arrays in row-major cell order, valid, pidx with INT32_MAX in empty
    slots, overflow).
    """
    n = keys_sorted.shape[0]
    dt = keys_sorted.dtype
    L = max_tree_level(dt)
    shift = dt.type(3 * (L - level))
    n_cells = 1 << (3 * level)
    F = len(arrays)
    assert all(a.dtype == jnp.float32 for a in arrays)

    if cell_override is not None:
        # caller-provided sorted cell ids (tiered path: -1 / n_cells
        # sentinels route foreign-tier particles out of every run)
        cell = cell_override.astype(jnp.int32)
    else:
        # clamp in the key dtype BEFORE the int32 cast (sentinel keys at
        # shift 0 would wrap negative); force slots past n_valid to the
        # out-of-range cell so they fall out of every run
        cell = jnp.minimum(
            keys_sorted >> shift, dt.type(n_cells)).astype(jnp.int32)
    if n_valid is not None:
        i = jnp.arange(n, dtype=jnp.int32)
        cell = jnp.where(i < jnp.asarray(n_valid, jnp.int32), cell, n_cells)

    bounds = _searchsorted_i32(cell, n_cells)
    starts = bounds[:-1]
    counts = bounds[1:] - starts
    overflow = jnp.max(counts) > cap

    s_rm = starts[perm]
    c_rm = counts[perm]

    # stacked blk-particle rows, padded so every cell's (cap/blk + 1)-row
    # window stays in bounds with INVALID fill; larger blk trades gather
    # indices (the dominant cost, ~18ns each) for a wider realign select
    while cap % blk:
        blk //= 2
    blk = max(blk, 1)
    pad = cap + blk + (-(n + cap + blk)) % blk
    stackedB = jnp.stack(
        [jnp.concatenate([a, jnp.full((pad,), INVALID_COORD, jnp.float32)])
         for a in arrays],
        axis=-1,
    ).reshape(-1, blk * F)
    nrowB = stackedB.shape[0]

    nr = cap // blk + 1  # covers cap slots at any run offset 0..blk-1
    r = jnp.arange(nr, dtype=jnp.int32)
    rows = jnp.minimum((s_rm // blk)[:, None] + r[None, :], nrowB - 1)
    win = stackedB[rows].reshape(n_cells, nr * blk * F)
    off = s_rm % blk
    # binary-select realign: log2(blk) conditional shifts instead of a
    # blk-way one-hot select — larger blk then strictly wins (fewer gather
    # rows at ~18ns/index each, same realign cost: blk 16->64 cuts row
    # indices 2.5x and the realign to 6 passes)
    rem = blk - 1
    b = blk >> 1
    while b:
        w_next = cap * F + (rem - b) * F
        keep = jax.lax.slice_in_dim(win, 0, w_next, axis=1)
        shift = jax.lax.slice_in_dim(win, b * F, b * F + w_next, axis=1)
        win = jnp.where(((off & b) != 0)[:, None], shift, keep)
        rem -= b
        b >>= 1
    blk4 = win.reshape(n_cells, cap, F)

    j = jnp.arange(cap, dtype=jnp.int32)
    valid = j[None, :] < c_rm[:, None]
    blk4 = jnp.where(valid[:, :, None], blk4, INVALID_COORD)
    packed = tuple(blk4[..., f] for f in range(F))
    pidx = jnp.where(valid, s_rm[:, None] + j[None, :], np.iinfo(np.int32).max)
    return packed, valid, pidx, overflow


def _searchsorted_i32(cell_sorted: jax.Array, n_cells: int) -> jax.Array:
    """searchsorted(cell_sorted, arange(n_cells+1)) via the sort method
    (ops/primitives.py rationale: multi-M scan-method searchsorted is
    pathological on TPU; one fused sort is ~5ms/M)."""
    from ..ops.primitives import searchsorted

    q = jnp.arange(n_cells + 1, dtype=jnp.int32)
    return searchsorted(cell_sorted, q, side="left").astype(jnp.int32)


def _roll3(a: jax.Array, dx: int, dy: int, dz: int) -> jax.Array:
    """a is (D, D, D, ...); rolled so cell (i,j,k) sees (i+dx, j+dy, k+dz)."""
    if dx:
        a = jnp.roll(a, -dx, axis=0)
    if dy:
        a = jnp.roll(a, -dy, axis=1)
    if dz:
        a = jnp.roll(a, -dz, axis=2)
    return a


def stencil_neighbor_counts(
    px: jax.Array,  # (n_cells, cap) ELL coords, row-major cell order
    py: jax.Array,
    pz: jax.Array,
    r2: jax.Array,  # (n_cells, cap) squared search radii (2h)^2; <0 if invalid
    valid: jax.Array,  # (n_cells, cap) occupancy mask
    box: Box,
    level: int,
) -> jax.Array:
    """(n_cells, cap) neighbor counts via the 27-point roll stencil."""
    D = 1 << int(level)
    cap = px.shape[1]
    shp = (D, D, D, cap)
    ex, ey, ez = (a.reshape(shp) for a in (px, py, pz))
    ev = valid.reshape(shp)
    er2 = r2.reshape(shp)

    L = box.lengths.astype(jnp.float32)  # (3,); may be traced inside jit
    periodic = [int(b) == 1 for b in box.boundaries]
    idx = jnp.arange(D, dtype=jnp.int32)

    slot = jnp.arange(cap, dtype=jnp.int32)
    counts = jnp.zeros(shp, dtype=jnp.int32)

    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                cx = _roll3(ex, dx, dy, dz)
                cy = _roll3(ey, dx, dy, dz)
                cz = _roll3(ez, dx, dy, dz)
                cv = _roll3(ev, dx, dy, dz)
                # wrap correction / edge masking per axis
                for axis, d, cc, Ld in ((0, dx, "x", L[0]), (1, dy, "y", L[1]), (2, dz, "z", L[2])):
                    if d == 0:
                        continue
                    over = (idx + d) // D  # -1, 0, or +1 at the edges
                    bshape = [1, 1, 1, 1]
                    bshape[axis] = D
                    over_b = over.reshape(bshape)
                    if periodic[axis]:
                        corr = over_b.astype(jnp.float32) * Ld
                        if cc == "x":
                            cx = cx + corr
                        elif cc == "y":
                            cy = cy + corr
                        else:
                            cz = cz + corr
                    else:
                        cv = cv & (over_b == 0)
                ddx = ex[..., :, None] - cx[..., None, :]
                ddy = ey[..., :, None] - cy[..., None, :]
                ddz = ez[..., :, None] - cz[..., None, :]
                d2 = ddx * ddx + ddy * ddy + ddz * ddz
                w = (d2 < er2[..., :, None]) & cv[..., None, :] & ev[..., :, None]
                if dx == 0 and dy == 0 and dz == 0:
                    w = w & (slot[:, None] != slot[None, :])
                counts = counts + jnp.sum(w, axis=-1, dtype=jnp.int32)

    return counts.reshape(-1, cap)


def stencil_stats(
    offsets: jax.Array,  # (n_cells+1,) from build_cell_table (SFC order)
    perm: jax.Array,  # (n_cells,) row-major -> SFC cell index
    level: int,
) -> Tuple[jax.Array, jax.Array]:
    """(pairs_tested, max_occupancy) — NcStats analog for the stencil
    (reference find_neighbors.cuh:346-369 sumP2P/maxP2P). pairs_tested is
    the exact number of distance evaluations the 27-point stencil
    performs: sum over cells of occ(c) * occ(27-neighborhood of c)."""
    D = 1 << int(level)
    occ_i = offsets[perm + 1] - offsets[perm]
    # f32 accumulation: a diagnostic counter (pairs can exceed int32 at
    # large N; TPU has no native i64)
    occ = occ_i.astype(jnp.float32).reshape(D, D, D)
    nb = jnp.zeros_like(occ)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                nb = nb + _roll3(occ, dx, dy, dz)
    pairs = jnp.sum(occ * nb)
    return pairs, jnp.max(occ_i).astype(jnp.int32)


def cell_list_neighbor_counts(
    keys_sorted: jax.Array,  # (n,) SFC-sorted particle keys
    xs: jax.Array,  # (n,) coords in the same (sorted) order
    ys: jax.Array,
    zs: jax.Array,
    hs: jax.Array,  # (n,) interaction radii; neighbor iff d2 < (2h_i)^2
    box: Box,
    level: int,
    cap: int,
    curve: str = HILBERT,
    n_valid=None,
    impl: str = "xla",
    interpret: bool = False,
    const_h: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """(n,) neighbor counts in sorted particle order + overflow flag.

    Exact fixed-radius neighbor counts (reference findneighbors.hpp:96-165
    semantics) provided the grid cell side at `level` is >= 2*max(hs):
    use choose_cell_level. Overflow=True means some cell held more than
    `cap` particles and the result is invalid — retry with a larger cap.
    impl="pallas" uses the symmetric half-stencil TPU kernel
    (ops/pallas_stencil.py; requires a lane-alignable cap, e.g. 64),
    impl="pallas_asym" the one-sided kernel, impl="xla" the portable roll
    stencil. const_h=True promises all hs are equal (skips the
    candidate-side radius plane in the symmetric kernel; wrong results if
    violated). No cell table is needed: the pack derives cells from the
    key bits.
    """
    n = keys_sorted.shape[0]
    perm, inv = rowmajor_cell_perm(int(level), curve)

    # NOTE: even at const_h the h plane stays in the pack — F=4 keeps the
    # blocked gather's rows lane-aligned (blk*F = 64 floats); an F=3 pack
    # measured SLOWER (5.1 vs 4.6ms at 1M, scripts/exp_sym.py)
    (px, py, pz, ph), valid, pidx, overflow = ell_pack_gather(
        keys_sorted, perm, (xs, ys, zs, hs), cap, int(level), n_valid=n_valid
    )
    r2 = jnp.where(valid, (2.0 * ph) ** 2, jnp.float32(-1.0))
    periodic = tuple(int(b) == 1 for b in box.boundaries)
    if impl == "pallas":
        from ..ops.pallas_stencil import stencil_counts_pallas_sym

        counts_ell = stencil_counts_pallas_sym(
            px, py, pz, r2, valid, box.lengths, periodic, int(level),
            same_r2=const_h, interpret=interpret,
        )
    elif impl == "pallas_asym":
        from ..ops.pallas_stencil import stencil_counts_pallas

        counts_ell = stencil_counts_pallas(
            px, py, pz, r2, valid, box.lengths, periodic, int(level),
            interpret=interpret,
        )
    else:
        counts_ell = stencil_neighbor_counts(px, py, pz, r2, valid, box, int(level))

    # back to particle order via ONE sort instead of a per-particle
    # gather (XLA TPU gathers cost ~50ms/M indices; sorts ~5ms/M): the
    # pack recorded each slot's particle index (empty slots sort last)
    count_bits = int(27 * cap).bit_length()  # counts <= 27*cap structurally
    if (n + 1) << count_bits < (1 << 31):
        # fused-key backmap: (pidx << bits | count) rides ONE u32 sort
        # (half the sort payload). Empty slots carry pidx = INT32_MAX,
        # whose shifted u32 wrap (2^32 - 2^bits) still sorts after every
        # valid key (< 2^31).
        key = (
            (pidx.reshape(-1).astype(jnp.uint32) << count_bits)
            | counts_ell.reshape(-1).astype(jnp.uint32)
        )
        key_s = jax.lax.sort(key)
        counts = key_s[:n] & jnp.uint32((1 << count_bits) - 1)
    else:
        pidx_s, counts_s = jax.lax.sort(
            (pidx.reshape(-1), counts_ell.reshape(-1)), num_keys=1,
            is_stable=False,
        )
        counts = counts_s[:n].astype(jnp.uint32)
    return counts, overflow


def cell_list_sph_density(
    keys_sorted: jax.Array,  # (n,) SFC-sorted particle keys
    xs: jax.Array,  # (n,) coords in the same (sorted) order
    ys: jax.Array,
    zs: jax.Array,
    hs: jax.Array,  # (n,) smoothing lengths; kernel support radius = 2h
    box: Box,
    level: int,
    cap: int,
    mass=1.0,  # uniform scalar mass OR (n,) per-particle masses
    curve: str = HILBERT,
    n_valid=None,
    const_h: bool = False,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """(n,) SPH densities in sorted particle order + overflow flag.

    rho_i = (1 / pi h_i^3) * (sum_{j != i} m_j W(|r_ij| / h_i) + m_i W(0))
    with the cubic-spline W — identical formula to models/sph.py's
    tree-path density, but the interaction is fused into the symmetric
    half-stencil Pallas kernel: one resident pass, no neighbor-index lists
    in HBM (the reference runs its per-pair op inside the warp traversal
    the same way, find_neighbors.cuh:94-124; the separate
    findNeighbors+force-loop shape is a CPU-ism this framework only keeps
    on the tree path for API parity). `mass` may be a scalar (uniform m
    factored out of the sum) or an (n,) array in the same sorted order
    (packed as a kernel mass plane). Exact provided the grid cell side at
    `level` is >= 2*max(hs). const_h=True promises all hs equal (skips
    the candidate-h plane).
    """
    n = keys_sorted.shape[0]
    perm, inv = rowmajor_cell_perm(int(level), curve)

    per_particle_m = hasattr(mass, "ndim") and getattr(mass, "ndim", 0) == 1
    # with const_h AND per-particle masses, drop the h plane from the pack
    # (F=5 -> F=4 keeps the blocked gather's rows lane-aligned at blk*F=64
    # floats); otherwise keep F=4 — an F=3 pack measured slower
    # (scripts/exp_sym.py)
    drop_h = const_h and per_particle_m
    fields = (
        ((xs, ys, zs) if drop_h else (xs, ys, zs, hs))
        + ((jnp.asarray(mass, jnp.float32),) if per_particle_m else ())
    )
    packed, valid, pidx, overflow = ell_pack_gather(
        keys_sorted, perm, fields, cap, int(level), n_valid=n_valid
    )
    px, py, pz = packed[:3]
    if drop_h:
        # uniform h: one scalar broadcast over the mask, no packed plane
        ph = jnp.where(valid, hs[0].astype(jnp.float32), INVALID_COORD)
        pm = packed[3]
    else:
        ph = packed[3]
        pm = packed[4] if per_particle_m else None
    if pm is not None:
        pm = jnp.where(valid, pm, 0.0)
    from ..ops.pallas_stencil import stencil_density_pallas_sym

    periodic = tuple(int(b) == 1 for b in box.boundaries)
    wsum = stencil_density_pallas_sym(
        px, py, pz, ph, valid, box.lengths, periodic, int(level),
        same_h=const_h, interpret=interpret, pm=pm,
    )
    # self term m_i * W(0) = m_i (unnormalized cubic spline) + normalization
    inv_h = jnp.where(valid, 1.0 / ph, 0.0)
    if per_particle_m:
        rho_ell = (np.float32(1.0 / np.pi)) * (
            (wsum + pm) * inv_h * inv_h * inv_h
        )
    else:
        rho_ell = (jnp.float32(mass) / np.float32(np.pi)) * (
            (wsum + 1.0) * inv_h * inv_h * inv_h
        )
    pidx_s, rho_s = jax.lax.sort(
        (pidx.reshape(-1), rho_ell.reshape(-1)), num_keys=1, is_stable=False
    )
    return rho_s[:n], overflow
