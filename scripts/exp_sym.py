"""Decompose the symmetric-stencil path: pack / prep / kernel / fold.

Times each piece as its own jit (min over reps; ~25ms dispatch floor
cancels in comparisons against the floor probe). Also head-to-heads the
sym vs asym kernels at const-h to check whether the colsums+fold overhead
eats the 5/9 pair saving.

Run (TPU): timeout 2400 python scripts/exp_sym.py
"""
import os
import sys
import time

if "/root/.axon_site" not in os.environ.get("PYTHONPATH", "") and os.path.isdir(
    "/root/.axon_site"
):
    sys.path.insert(0, "/root/.axon_site")

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".cstone_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cstone_tpu.ops.primitives import sort_by_key
from cstone_tpu.sfc import PERIODIC, compute_sfc_keys, make_box
from cstone_tpu.traversal.celllist import (
    choose_cell_level, ell_pack_gather, rowmajor_cell_perm,
)
from cstone_tpu.ops.pallas_stencil import (
    pad_cell_grid, _call, _call_sym, _fold_sym,
)


def sync1(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, reps=5, name=""):
    t0 = time.time()
    out = fn(*args)
    sync1(out)
    comp = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        sync1(out)
        ts.append(time.time() - t0)
    print(f"{name:30s} min={min(ts)*1e3:8.1f}ms compile={comp:5.1f}s",
          file=sys.stderr, flush=True)
    return out, min(ts)


def main():
    n = int(os.environ.get("BENCH_N", 1_000_000))
    h_val = 0.012
    rng = np.random.RandomState(42)
    pos = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    box = make_box(0.0, 1.0, boundaries=PERIODIC)
    level = choose_cell_level(box, h_val)
    D = 1 << level
    cap = 64
    periodic = (True, True, True)

    keys = compute_sfc_keys(
        jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]), jnp.asarray(pos[:, 2]),
        box, jnp.uint64, "hilbert")
    ks, (xs, ys, zs) = sort_by_key(
        keys, jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]),
        jnp.asarray(pos[:, 2]))
    hs = jnp.full((n,), np.float32(h_val))
    perm, _ = rowmajor_cell_perm(level)

    # floor probe
    zero = jnp.zeros((8,), jnp.float32)
    _, t_floor = timeit(jax.jit(lambda a: a + 1), zero, name="dispatch floor")

    # pack F=4 (current) vs F=3 (const-h)
    p4 = jax.jit(lambda k, a, b, c, d: ell_pack_gather(
        k, perm, (a, b, c, d), cap, level))
    (pk4, valid, pidx, ovf), t_p4 = timeit(p4, ks, xs, ys, zs, hs,
                                           name="pack F=4")
    p3 = jax.jit(lambda k, a, b, c: ell_pack_gather(
        k, perm, (a, b, c), cap, level))
    (pk3, valid3, pidx3, _), t_p3 = timeit(p3, ks, xs, ys, zs, name="pack F=3")

    px, py, pz, ph = pk4
    r2 = jnp.where(valid, (2.0 * np.float32(h_val)) ** 2, jnp.float32(-1.0))
    shp = (D, D, D, cap)

    # prep: pad_cell_grid (S=3) and tgt stack
    prep = jax.jit(lambda a, b, c, v: pad_cell_grid(
        a.reshape(shp), b.reshape(shp), c.reshape(shp), v.reshape(shp),
        box.lengths, periodic))
    cand, t_prep = timeit(prep, px, py, pz, valid, name="pad_cell_grid S=3")
    tgtf = jax.jit(lambda a, b, c, r: jnp.stack(
        [a, b, c, r], axis=-1).reshape(D * D, D * cap, 4))
    tgt, t_tgt = timeit(tgtf, px, py, pz, r2, name="tgt stack")

    # kernels alone (same_r2: S=3 cand); trace with x64 off like the
    # production wrappers (x64 python-int promotion breaks Mosaic)
    prev_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    try:
        sym = jax.jit(lambda c, t: _call_sym(
            c, t, D=D, cap=cap, zb_cells=2, same_r2=True, interpret=False))
        (out_t, *colplanes), t_sym = timeit(sym, cand, tgt,
                                            name="sym kernel (no fold)")
        asym = jax.jit(lambda c, t: _call(c, t, D=D, cap=cap, zb_cells=2,
                                          interpret=False))
        _, t_asym = timeit(asym, cand, tgt, name="asym kernel")
    finally:
        if prev_x64:
            jax.config.update("jax_enable_x64", True)

    # fold alone
    foldf = jax.jit(lambda o, *c: _fold_sym(o, c, D, cap))
    _, t_fold = timeit(foldf, out_t, *colplanes, name="fold (XLA)")

    # backmap: fused-u32-key sort vs 2-array sort
    bm2 = jax.jit(lambda p, c: jax.lax.sort(
        (p.reshape(-1), c.reshape(-1)), num_keys=1, is_stable=False)[1][:n])
    cts = out_t.reshape(-1, cap).astype(jnp.int32)
    _, t_bm2 = timeit(bm2, pidx, cts, name="backmap 2-array")

    def bm1(p, c):
        key = jnp.where(
            p.reshape(-1) == np.iinfo(np.int32).max,
            np.int32((n + 1) << 11),
            p.reshape(-1) << 11) | (c.reshape(-1) & 2047)
        s = jax.lax.sort(key)
        return s[:n] & 2047
    _, t_bm1 = timeit(jax.jit(bm1), pidx, cts, name="backmap fused-key")

    fl = t_floor * 1e3
    print(f"\nnet-of-floor ms (floor={fl:.1f}):", file=sys.stderr)
    for nm, t in [("pack F=4", t_p4), ("pack F=3", t_p3),
                  ("pad_cell_grid", t_prep), ("tgt stack", t_tgt),
                  ("sym kernel", t_sym), ("asym kernel", t_asym),
                  ("fold", t_fold), ("backmap 2-array", t_bm2),
                  ("backmap fused", t_bm1)]:
        print(f"  {nm:18s} {t*1e3 - fl:7.1f}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
