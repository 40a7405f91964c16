"""Stage-level timing of the bench step: sync vs cell-list substages.

Times each piece as its own jit dispatch with host readbacks, reps times,
prints min per stage. Tunnel dispatch overhead (~20ms) inflates every
stage equally; relative shares are what matter.
"""
import os
import sys
import time

if "/root/.axon_site" not in os.environ.get("PYTHONPATH", "") and os.path.isdir(
    "/root/.axon_site"
):
    sys.path.insert(0, "/root/.axon_site")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cstone_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cstone_tpu.domain.domain import Domain
from cstone_tpu.sfc import PERIODIC, make_box
from cstone_tpu.traversal.celllist import (
    cell_list_neighbor_counts,
    choose_cell_level,
    ell_pack_scatter,
    rowmajor_cell_perm,
    stencil_neighbor_counts,
)
from bench import default_cell_cap


def _sync_one(out):
    # one dispatch = one program: reading ANY single output element waits
    # for the whole program; per-leaf readbacks cost ~20ms tunnel RTT each
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, reps=4, name=""):
    out = fn(*args)
    _sync_one(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        _sync_one(out)
        ts.append(time.time() - t0)
    print(f"{name:28s} min={min(ts)*1e3:8.1f}ms  times={['%.0f' % (t*1e3) for t in ts]}", file=sys.stderr)
    return out


def main():
    n = int(os.environ.get("BENCH_N", 1_000_000))
    bucket = 64
    h_val = 0.012
    rng = np.random.RandomState(42)
    pos = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    box = make_box(0.0, 1.0, boundaries=PERIODIC)
    x = jnp.asarray(pos[:, 0]); y = jnp.asarray(pos[:, 1]); z = jnp.asarray(pos[:, 2])
    hj = jnp.full((n,), np.float32(h_val))

    tree_capacity = max(4096, int(3.2 * n / bucket) // 1024 * 1024 + 4096)
    domain = Domain(rank=0, n_ranks=1, bucket_size=bucket, bucket_size_focus=bucket,
                    key_dtype=jnp.uint64, tree_capacity=tree_capacity,
                    focus_capacity=tree_capacity)
    state = domain.init_state(box=box, boundaries=(1, 1, 1))
    cell_level = choose_cell_level(box, h_val)
    cell_cap = default_cell_cap(n, cell_level)
    impl = "pallas" if jax.default_backend() not in ("cpu",) else "xla"
    print(f"n={n} level={cell_level} cap={cell_cap} impl={impl}", file=sys.stderr)

    sync_j = jax.jit(lambda st, x, y, z: domain.sync(st, x, y, z, hj))
    state, res = timeit(sync_j, state, x, y, z, name="sync (cold state)")
    state, res = timeit(sync_j, state, x, y, z, name="sync (warm state)")

    counts_j = jax.jit(lambda k, xx, yy, zz, hh, nv: cell_list_neighbor_counts(
        k, xx, yy, zz, hh, box, cell_level, cell_cap, n_valid=nv, impl=impl))
    timeit(counts_j, res.keys, res.x, res.y, res.z, res.h, res.end_index,
           name="cell_list_counts total")

    perm, _ = rowmajor_cell_perm(cell_level)
    pack_j = jax.jit(lambda k, xx, yy, zz, hh, nv: ell_pack_scatter(
        k, perm, (xx, yy, zz, hh), cell_cap, cell_level, n_valid=nv))
    (px, py, pz, ph), valid, pidx, ovf = timeit(
        pack_j, res.keys, res.x, res.y, res.z, res.h, res.end_index,
        name="  ell_pack_scatter")

    r2 = jnp.where(valid, (2.0 * ph) ** 2, jnp.float32(-1.0))
    if impl == "pallas":
        from cstone_tpu.ops.pallas_stencil import stencil_counts_pallas
        periodic = tuple(int(b) == 1 for b in box.boundaries)
        st_j = jax.jit(lambda a, b, c, d, e: stencil_counts_pallas(
            a, b, c, d, e, box.lengths, periodic, cell_level))
    else:
        st_j = jax.jit(lambda a, b, c, d, e: stencil_neighbor_counts(
            a, b, c, d, e, box, cell_level))
    counts_ell = timeit(st_j, px, py, pz, r2, valid, name="  stencil kernel")

    sort_j = jax.jit(lambda p, c: jax.lax.sort(
        (p.reshape(-1), c.reshape(-1)), num_keys=1, is_stable=False)[1][:n])
    timeit(sort_j, pidx, counts_ell, name="  backmap sort")

    # ---- sync substages -------------------------------------------------
    from cstone_tpu.sfc import compute_sfc_keys
    from cstone_tpu.tree.octree import build_linked_octree

    enc_j = jax.jit(lambda xx, yy, zz: compute_sfc_keys(xx, yy, zz, box, jnp.uint64))
    keys = timeit(enc_j, x, y, z, name="  encode keys")

    slot = jnp.arange(n, dtype=jnp.int32)
    sort_j = jax.jit(lambda k, s, xx, yy, zz, hh: jax.lax.sort(
        (k, s, xx, yy, zz, hh), num_keys=1, is_stable=True))
    sorted_ = timeit(sort_j, keys, slot, x, y, z, hj, name="  wide sort (6 arrays)")
    skeys = sorted_[0]

    sort2_j = jax.jit(lambda k, s: jax.lax.sort((k, s), num_keys=1, is_stable=True))
    timeit(sort2_j, keys, slot, name="  narrow sort (2 arrays)")

    tree_j = jax.jit(lambda st, k: domain._update_global_tree(st, k, jnp.int32(n)))
    tree = timeit(tree_j, state, skeys, name="  global tree update (warm)")

    link_j = jax.jit(lambda tk, nn: build_linked_octree(tk, nn))
    timeit(link_j, tree.keys, tree.n_nodes, name="  build_linked_octree")


if __name__ == "__main__":
    main()
