"""Substage timing for the celllist path: searchsorted vs gather vs kernel.

Run (TPU): timeout 2400 python scripts/exp_substages.py
"""
import os
import sys
import time

if "/root/.axon_site" not in os.environ.get("PYTHONPATH", "") and os.path.isdir(
    "/root/.axon_site"
):
    sys.path.insert(0, "/root/.axon_site")

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cstone_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cstone_tpu.sfc import PERIODIC, compute_sfc_keys, make_box
from cstone_tpu.traversal.celllist import (
    _searchsorted_i32,
    ell_pack_gather,
    rowmajor_cell_perm,
    choose_cell_level,
)
from bench import default_cell_cap


def _sync_one(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, reps=5, name=""):
    t0 = time.time()
    out = fn(*args)
    _sync_one(out)
    compile_s = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        _sync_one(out)
        ts.append(time.time() - t0)
    print(f"{name:30s} min={min(ts)*1e3:8.1f}ms compile={compile_s:5.1f}s",
          file=sys.stderr, flush=True)
    return out, min(ts)


def main():
    n = int(os.environ.get("BENCH_N", 1_000_000))
    h_val = 0.012
    rng = np.random.RandomState(42)
    pos = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    box = make_box(0.0, 1.0, boundaries=PERIODIC)
    dt = jnp.uint64
    x = jnp.asarray(pos[:, 0]); y = jnp.asarray(pos[:, 1]); z = jnp.asarray(pos[:, 2])
    hj = jnp.full((n,), np.float32(h_val))
    level = choose_cell_level(box, h_val)
    cap = default_cell_cap(n, level)
    n_cells = 1 << (3 * level)
    print(f"n={n} level={level} cap={cap}", file=sys.stderr)

    keys = compute_sfc_keys(x, y, z, box, dt, "hilbert")
    ks, xs, ys, zs, hs = jax.lax.sort((keys, x, y, z, hj), num_keys=1)
    _sync_one(ks)
    perm, _ = rowmajor_cell_perm(level)

    L = 21  # max_tree_level for u64
    shift = np.uint64(3 * (L - level))
    ndt = np.dtype(np.uint64)

    def p_cellid(k):
        return jnp.minimum(k >> shift, np.uint64(n_cells)).astype(jnp.int32)

    def p_ss(k):
        cell = p_cellid(k)
        return _searchsorted_i32(cell, n_cells)

    def p_pack(k, xx, yy, zz, hh):
        return ell_pack_gather(k, perm, (xx, yy, zz, hh), cap, level)

    timeit(jax.jit(p_cellid), ks, name="cellid (elementwise)")
    timeit(jax.jit(p_ss), ks, name="+ searchsorted (sort)")
    timeit(jax.jit(p_pack), ks, xs, ys, zs, hs, name="full ell_pack_gather")

    # baseline dispatch cost: trivial program
    timeit(jax.jit(lambda a: a[:8] + 1.0), xs, name="dispatch floor")


if __name__ == "__main__":
    main()
