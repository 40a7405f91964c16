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
jax.config.update("jax_compilation_cache_dir", "/tmp/cstone_tpu_jax_cache")
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
