"""Micro-benchmark: blocked row-slice ELL pack vs scatter pack (round 3).

Key structural fact: SFC-sorted particles are CONTIGUOUS per grid cell,
so the ELL pack is a per-cell window copy, not a scatter. A gather with
slice_sizes=(cap, F) over n_cells start indices costs n_cells indices
(32k) instead of n scalar-scatter indices (1M x 5 fields).

Shapes mirror the real 1M / level-5 / cap-64 pipeline.
"""
import os, sys, time

if os.path.isdir("/root/.axon_site"):
    sys.path.insert(0, "/root/.axon_site")
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cstone_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

n = 1_000_000
level = 5
n_cells = 1 << (3 * level)  # 32768
cap = 64
rng = np.random.RandomState(0)

# sorted cell ids ~ uniform occupancy ~30.5/cell
cell_np = np.sort(rng.randint(0, n_cells, size=n).astype(np.int32))
cell = jnp.asarray(cell_np)
fields_np = rng.rand(n, 4).astype(np.float32)
fields = jnp.asarray(fields_np)
xs, ys, zs, hs = (jnp.asarray(fields_np[:, i]) for i in range(4))
perm_np = rng.permutation(n_cells).astype(np.int32)
perm = jnp.asarray(perm_np)
INVALID = np.float32(1e30)


def timeit(fn, *args, reps=5, name=""):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        ts.append(time.time() - t0)
    print(f"{name:34s} min={min(ts)*1e3:7.1f}ms", file=sys.stderr)
    return out


@jax.jit
def scatter_pack(cell, xs, ys, zs, hs):
    # current production form: run-rank via cummax, 5 scalar scatters
    i = jnp.arange(n, dtype=jnp.int32)
    boundary = jnp.concatenate([jnp.ones((1,), bool), cell[1:] != cell[:-1]])
    run_start = jax.lax.cummax(jnp.where(boundary, i, 0))
    rank = i - run_start
    tgt = jnp.where(rank < cap, cell * cap + rank, n_cells * cap)

    def scat(vals, fill):
        buf = jnp.full((n_cells * cap,), fill, vals.dtype)
        return buf.at[tgt].set(vals, mode="drop").reshape(n_cells, cap)[perm]

    px = scat(xs, INVALID)
    py = scat(ys, INVALID)
    pz = scat(zs, INVALID)
    ph = scat(hs, INVALID)
    pidx = scat(i, jnp.int32(np.iinfo(np.int32).max))
    return px, py, pz, ph, pidx


@jax.jit
def slice_pack(cell, stacked):
    # starts per cell via searchsorted (sort method), then blocked gather
    starts = jnp.searchsorted(
        cell, jnp.arange(n_cells, dtype=jnp.int32), side="left", method="sort"
    ).astype(jnp.int32)
    ends = jnp.concatenate([starts[1:], jnp.full((1,), n, jnp.int32)])
    counts = ends - starts
    s_rm = starts[perm]
    c_rm = counts[perm]
    s_cl = jnp.minimum(s_rm, n - cap)

    def one(s):
        return jax.lax.dynamic_slice(stacked, (s, jnp.int32(0)), (cap, 4))

    blk = jax.vmap(one)(s_cl)  # (n_cells, cap, 4)
    j = jnp.arange(cap, dtype=jnp.int32)
    valid = (j[None, :] < c_rm[:, None]) & (s_rm[:, None] + j[None, :] < n)
    # clamp shift correction: if s was clamped, slide the window mask
    off = s_rm - s_cl  # >0 only near the array end
    valid = valid & (j[None, :] + off[:, None] < cap + off[:, None])  # no-op guard
    blk = jnp.where(valid[:, :, None], blk, INVALID)
    pidx = jnp.where(valid, s_rm[:, None] + j[None, :], np.iinfo(np.int32).max)
    overflow = jnp.max(counts) > cap
    return blk[..., 0], blk[..., 1], blk[..., 2], blk[..., 3], pidx, overflow


@jax.jit
def slice_pack_take(cell, stacked):
    # same but with one flat gather of cap-strided rows for comparison
    starts = jnp.searchsorted(
        cell, jnp.arange(n_cells, dtype=jnp.int32), side="left", method="sort"
    ).astype(jnp.int32)
    ends = jnp.concatenate([starts[1:], jnp.full((1,), n, jnp.int32)])
    counts = ends - starts
    s_rm = starts[perm]
    c_rm = counts[perm]
    j = jnp.arange(cap, dtype=jnp.int32)
    idx = jnp.minimum(s_rm[:, None] + j[None, :], n - 1)
    blk = stacked[idx]  # (n_cells, cap, 4) plain gather: 2M indices
    valid = j[None, :] < c_rm[:, None]
    blk = jnp.where(valid[:, :, None], blk, INVALID)
    return blk[..., 0], blk[..., 3], valid


@jax.jit
def row8_pack(cell, stacked8):
    # 8-row-block gather + static shift-select: XLA TPU gathers cost per
    # INDEX, so fetch (cap/8 + 1) 8-particle rows per cell (n_cells * 9 =
    # 295k indices, 6.8x fewer than the 2M slot gather), then realign each
    # cell's window to its run start with an 8-way static-slice select on
    # the lane axis (off = starts % 8).
    starts = jnp.searchsorted(
        cell, jnp.arange(n_cells, dtype=jnp.int32), side="left", method="sort"
    ).astype(jnp.int32)
    ends = jnp.concatenate([starts[1:], jnp.full((1,), n, jnp.int32)])
    counts = ends - starts
    s_rm = starts[perm]
    c_rm = counts[perm]
    nrow8 = stacked8.shape[0]
    r = jnp.arange(cap // 8 + 1, dtype=jnp.int32)
    rows = jnp.minimum((s_rm // 8)[:, None] + r[None, :], nrow8 - 1)
    blk = stacked8[rows].reshape(n_cells, (cap // 8 + 1) * 32)
    off = s_rm % 8
    out = jnp.zeros((n_cells, cap * 4), jnp.float32)
    for k in range(8):
        out = jnp.where(
            (off == k)[:, None], jax.lax.slice_in_dim(blk, 4 * k, 4 * k + cap * 4, axis=1), out
        )
    blk4 = out.reshape(n_cells, cap, 4)
    j = jnp.arange(cap, dtype=jnp.int32)
    valid = j[None, :] < c_rm[:, None]
    blk4 = jnp.where(valid[:, :, None], blk4, INVALID)
    pidx = jnp.where(valid, s_rm[:, None] + j[None, :], np.iinfo(np.int32).max)
    overflow = jnp.max(counts) > cap
    return blk4[..., 0], blk4[..., 1], blk4[..., 2], blk4[..., 3], pidx, overflow


@jax.jit
def stack4(xs, ys, zs, hs):
    return jnp.stack([xs, ys, zs, hs], axis=-1)


@jax.jit
def stack8(xs, ys, zs, hs):
    # (n_pad8/8, 32): 8 particles x 4 interleaved fields per row
    pad8 = (-n) % 8 + 8
    s = jnp.stack(
        [
            jnp.concatenate([a, jnp.full((pad8,), INVALID, jnp.float32)])
            for a in (xs, ys, zs, hs)
        ],
        axis=-1,
    )
    return s.reshape(-1, 32)


@jax.jit
def searchsorted_only(cell):
    return jnp.searchsorted(
        cell, jnp.arange(n_cells, dtype=jnp.int32), side="left", method="sort"
    )


stacked = timeit(stack4, xs, ys, zs, hs, name="stack (n,4)")
timeit(searchsorted_only, cell, name="searchsorted 32k into 1M")
timeit(scatter_pack, cell, xs, ys, zs, hs, name="scatter pack (current, 5x)")
out = timeit(slice_pack, cell, stacked, name="slice pack (32k dyn-slices)")
timeit(slice_pack_take, cell, stacked, name="flat 2M-row gather pack")
stacked8 = timeit(stack8, xs, ys, zs, hs, name="stack8 (n/8,32)")
out8 = timeit(row8_pack, cell, stacked8, name="row8 pack (295k row gather)")

# correctness: slice pack equals scatter pack on occupied slots
ref = scatter_pack(cell, xs, ys, zs, hs)
px_r = np.asarray(ref[0])
px_g, py_g, pz_g, ph_g, pidx_g, ovf = (np.asarray(o) for o in out)
print("overflow:", ovf, file=sys.stderr)
occ = px_r != INVALID
print(
    "slice pack matches scatter pack:",
    np.array_equal(px_r[occ], px_g[occ]) and np.array_equal(px_g != INVALID, occ),
    file=sys.stderr,
)
px8, py8, pz8, ph8, pidx8, ovf8 = (np.asarray(o) for o in out8)
print(
    "row8 pack matches scatter pack:",
    np.array_equal(px_r[occ], px8[occ])
    and np.array_equal(px8 != INVALID, occ)
    and np.array_equal(np.asarray(ref[3])[occ], ph8[occ]),
    file=sys.stderr,
)
