"""Micro-benchmark: ELL pack scatter variants on TPU.

The pack scatter costs ~50ns/index (55ms at 1M). Candidates:
  a) current: (n, F+1) row scatter, no hints
  b) indices_are_sorted=True (tgt is monotone when no overflow)
  c) sorted + unique
  d) row width padded to 8 lanes
  e) separate scalar scatters per field
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
n_slots = 2_097_152
rng = np.random.RandomState(0)
# monotone unique targets like the real pack
tgt_np = np.sort(rng.choice(n_slots, size=n, replace=False)).astype(np.int32)
tgt = jnp.asarray(tgt_np)
rows5 = jnp.asarray(rng.rand(n, 5).astype(np.float32))
rows8 = jnp.asarray(rng.rand(n, 8).astype(np.float32))


def timeit(fn, *args, reps=4, name=""):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        ts.append(time.time() - t0)
    print(f"{name:32s} min={min(ts)*1e3:7.1f}ms", file=sys.stderr)


@jax.jit
def a(tgt, rows):
    buf = jnp.zeros((n_slots, 5), jnp.float32)
    return buf.at[tgt].set(rows, mode="drop")

@jax.jit
def b(tgt, rows):
    buf = jnp.zeros((n_slots, 5), jnp.float32)
    return buf.at[tgt].set(rows, mode="drop", indices_are_sorted=True)

@jax.jit
def c(tgt, rows):
    buf = jnp.zeros((n_slots, 5), jnp.float32)
    return buf.at[tgt].set(rows, mode="drop", indices_are_sorted=True,
                           unique_indices=True)

@jax.jit
def d(tgt, rows):
    buf = jnp.zeros((n_slots, 8), jnp.float32)
    return buf.at[tgt].set(rows, mode="drop", indices_are_sorted=True,
                           unique_indices=True)

@jax.jit
def e(tgt, rows):
    outs = []
    for f in range(5):
        buf = jnp.zeros((n_slots,), jnp.float32)
        outs.append(buf.at[tgt].set(rows[:, f], mode="drop"))
    return tuple(outs)

@jax.jit
def f_gather_sorted(tgt, rows):
    # inverse formulation: per-slot gather with searchsorted source index
    pos = jnp.searchsorted(tgt, jnp.arange(n_slots, dtype=jnp.int32),
                           side="left", method="sort")
    pos = jnp.minimum(pos, n - 1)
    hit = tgt[pos] == jnp.arange(n_slots, dtype=jnp.int32)
    return jnp.where(hit[:, None], rows[pos], 0.0)

timeit(a, tgt, rows5, name="row5 scatter")
timeit(b, tgt, rows5, name="row5 sorted")
timeit(c, tgt, rows5, name="row5 sorted+unique")
timeit(d, tgt, rows8, name="row8 sorted+unique")
timeit(e, tgt, rows5, name="5x scalar scatter")
timeit(f_gather_sorted, tgt, rows5, name="searchsorted gather")


# --- round-3 additions: sort-based pack --------------------------------------
# one-sort pack: concat particles (key = target slot) with per-slot fillers
# whose key is the slot id if unoccupied else BIG (sorts past n_slots).
# Keys are then unique; the first n_slots sorted outputs ARE the packed ELL.
occ_np = np.zeros(n_slots, bool)
occ_np[tgt_np] = True
BIG = np.int32(2**31 - 1)
filler_key_np = np.where(occ_np, BIG, np.arange(n_slots, dtype=np.int32))
filler_key = jnp.asarray(filler_key_np)
pidx = jnp.arange(n, dtype=jnp.int32)


@jax.jit
def g_sortpack(tgt, rows, filler_key, pidx):
    keys = jnp.concatenate([tgt, filler_key])
    ops = [keys]
    for f in range(5):
        ops.append(
            jnp.concatenate([rows[:, f], jnp.zeros((n_slots,), jnp.float32)])
        )
    ops.append(jnp.concatenate([pidx, jnp.full((n_slots,), BIG)]))
    out = jax.lax.sort(tuple(ops), num_keys=1, is_stable=False)
    return tuple(o[:n_slots] for o in out[1:])


@jax.jit
def h_scalar_hints(tgt, rows):
    outs = []
    for f in range(5):
        buf = jnp.zeros((n_slots,), jnp.float32)
        outs.append(
            buf.at[tgt].set(rows[:, f], mode="drop", indices_are_sorted=True,
                            unique_indices=True)
        )
    return tuple(outs)


@jax.jit
def i_sort6_1m(tgt, rows, pidx):
    # baseline scale reference: 6-operand sort at 1M
    return jax.lax.sort(
        (tgt, rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3], rows[:, 4]),
        num_keys=1, is_stable=False,
    )


timeit(g_sortpack, tgt, rows5, filler_key, pidx, name="one-sort pack (3M x 7)")
timeit(h_scalar_hints, tgt, rows5, name="5x scalar scatter hints")
timeit(i_sort6_1m, tgt, rows5, pidx, name="sort6 1M reference")

# correctness: sort pack equals scatter pack
ref = np.zeros((n_slots, 5), np.float32)
ref[tgt_np] = np.asarray(rows5)
got = np.stack([np.asarray(o) for o in g_sortpack(tgt, rows5, filler_key, pidx)[:5]], -1)
print("sortpack correct:", np.array_equal(ref, got), file=sys.stderr)


# --- u64-packed scalar scatters: 2 u64 (x|y, z|h) + 1 i32 (pidx) ------------
jax.config.update("jax_enable_x64", True)  # u64 needs x64 mode


@jax.jit
def j_u64_pack(tgt, rows, pidx):
    xy = jax.lax.bitcast_convert_type(
        jnp.stack([rows[:, 0], rows[:, 1]], -1), jnp.uint64
    ).reshape(-1)
    zh = jax.lax.bitcast_convert_type(
        jnp.stack([rows[:, 2], rows[:, 3]], -1), jnp.uint64
    ).reshape(-1)
    b1 = jnp.zeros((n_slots,), jnp.uint64).at[tgt].set(xy, mode="drop")
    b2 = jnp.zeros((n_slots,), jnp.uint64).at[tgt].set(zh, mode="drop")
    b3 = jnp.full((n_slots,), BIG).at[tgt].set(pidx, mode="drop")
    return b1, b2, b3


@jax.jit
def k_occupied_scatter(tgt):
    return jnp.zeros((n_slots,), jnp.int32).at[tgt].set(1, mode="drop")


timeit(j_u64_pack, tgt, rows5, pidx, name="2x u64 + 1x i32 scatter")
timeit(k_occupied_scatter, tgt, name="1x occupied scatter")

# u64 correctness
b1, b2, b3 = j_u64_pack(tgt, rows5, pidx)
xy = jax.lax.bitcast_convert_type(b1, jnp.uint32).view()
xy = np.asarray(jax.lax.bitcast_convert_type(b1, jnp.float32))
ref2 = np.zeros((n_slots, 2), np.float32)
ref2[tgt_np] = np.asarray(rows5[:, :2])
print("u64 pack correct:", np.array_equal(ref2, xy.reshape(n_slots, 2)), file=sys.stderr)
