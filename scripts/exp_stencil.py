"""Stencil kernel timing: Pallas vs XLA roll, on packed 1M ELL data.

Run (TPU): timeout 2400 python scripts/exp_stencil.py
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
    ell_pack_gather,
    rowmajor_cell_perm,
    choose_cell_level,
)
from cstone_tpu.ops.pallas_stencil import stencil_counts_pallas
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
    cap = int(os.environ.get("BENCH_CELL_CAP", 0)) or default_cell_cap(n, level)
    print(f"n={n} level={level} cap={cap}", file=sys.stderr, flush=True)

    keys = compute_sfc_keys(x, y, z, box, dt, "hilbert")
    ks, xs, ys, zs, hs = jax.lax.sort((keys, x, y, z, hj), num_keys=1)
    perm, _ = rowmajor_cell_perm(level)
    (px, py, pz, ph), valid, pidx, ovf = jax.jit(
        lambda k, a, b, c, d: ell_pack_gather(k, perm, (a, b, c, d), cap, level)
    )(ks, xs, ys, zs, hs)
    _sync_one(px)
    assert not bool(ovf)
    r2 = jnp.where(valid, (2.0 * ph) ** 2, jnp.float32(-1.0))
    periodic = (True, True, True)

    st_j = jax.jit(lambda a, b, c, d, e: stencil_counts_pallas(
        a, b, c, d, e, box.lengths, periodic, level))
    (counts,), _ = timeit(lambda *a: (st_j(*a),), px, py, pz, r2, valid,
                          name="pallas stencil (db)")
    # sanity: mean neighbor count ~ 4/3 pi (2h)^3 n
    mean = float(jnp.sum(jnp.where(valid, counts, 0)) / n)
    print(f"mean neighbors = {mean:.1f}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
