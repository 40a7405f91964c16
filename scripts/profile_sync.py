"""Stage-level timing of the warm single-rank sync step.

Times CUMULATIVE prefixes of the sync pipeline, each as one jit program
with a single host readback, so tunnel dispatch overhead (~20ms) cancels
in adjacent differences. Prints min-of-reps per prefix and the implied
per-stage deltas.

Run (TPU): timeout 2400 python scripts/profile_sync.py
Env: BENCH_N (default 1M), PROF_REPS (default 4).
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

from cstone_tpu.domain.domain import Domain
from cstone_tpu.sfc import PERIODIC, compute_sfc_keys, make_box
from cstone_tpu.sfc.keys import remove_key
from cstone_tpu.tree.octree import build_linked_octree
from cstone_tpu.traversal.celllist import (
    cell_list_neighbor_counts,
    choose_cell_level,
    ell_pack_gather,
    rowmajor_cell_perm,
)
from bench import default_cell_cap


def _sync_one(out):
    # one dispatch = one program: reading ANY single output element waits
    # for the whole program; per-leaf readbacks cost ~20ms tunnel RTT each
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, reps=None, name=""):
    reps = reps or int(os.environ.get("PROF_REPS", 4))
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
    print(
        f"{name:26s} min={min(ts)*1e3:8.1f}ms  compile={compile_s:6.1f}s  "
        f"times={['%.0f' % (t*1e3) for t in ts]}",
        file=sys.stderr, flush=True,
    )
    return out, min(ts)


def main():
    n = int(os.environ.get("BENCH_N", 1_000_000))
    bucket = 64
    h_val = 0.012
    rng = np.random.RandomState(42)
    pos = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    box = make_box(0.0, 1.0, boundaries=PERIODIC)
    x = jnp.asarray(pos[:, 0]); y = jnp.asarray(pos[:, 1]); z = jnp.asarray(pos[:, 2])
    hj = jnp.full((n,), np.float32(h_val))
    dt = jnp.uint64
    rk = remove_key(dt)

    tree_capacity = max(4096, int(3.2 * n / bucket) // 1024 * 1024 + 4096)
    domain = Domain(rank=0, n_ranks=1, bucket_size=bucket, bucket_size_focus=bucket,
                    key_dtype=dt, tree_capacity=tree_capacity,
                    focus_capacity=tree_capacity)
    state = domain.init_state(box=box, boundaries=(1, 1, 1))
    cell_level = choose_cell_level(box, h_val)
    cell_cap = int(os.environ.get("BENCH_CELL_CAP", 0)) or default_cell_cap(
        n, cell_level
    )
    impl = "pallas" if jax.default_backend() not in ("cpu",) else "xla"
    print(f"n={n} level={cell_level} cap={cell_cap} impl={impl}",
          file=sys.stderr, flush=True)

    # warm the state (2 syncs) so every prefix below sees the steady state
    sync_j = jax.jit(lambda st, x, y, z: domain.sync(st, x, y, z, hj))
    state, res = sync_j(state, x, y, z)
    _sync_one(res.keys)
    state, res = sync_j(state, x, y, z)
    _sync_one(res.keys)

    # PROF_DRIFT=1: profile the prefixes on positions drifted ~20% of the
    # interparticle spacing from the warmed state — the bench steady state
    # (every step pays the incremental tree rebuild + fresh linked build),
    # not the stationary fixed point (which short-circuits both)
    if os.environ.get("PROF_DRIFT", "1") == "1":
        spacing = (1.0 / n) ** (1.0 / 3.0)
        drift = jnp.asarray(
            rng.uniform(-0.2, 0.2, size=(n, 3)).astype(np.float32) * spacing)
        x = (x + drift[:, 0]) % 1.0
        y = (y + drift[:, 1]) % 1.0
        z = (z + drift[:, 2]) % 1.0

    nl = jnp.int32(n)
    slot = jnp.arange(n, dtype=jnp.int32)

    # ---- cumulative prefixes (each = one program) -----------------------
    def p_encode(x, y, z):
        return compute_sfc_keys(x, y, z, box, dt, domain.curve)

    def p_sort(x, y, z):
        k = compute_sfc_keys(x, y, z, box, dt, domain.curve)
        return jax.lax.sort((k, slot, x, y, z, hj), num_keys=1, is_stable=True)

    def p_tree(st, x, y, z):
        k = compute_sfc_keys(x, y, z, box, dt, domain.curve)
        s = jax.lax.sort((k, slot, x, y, z, hj), num_keys=1, is_stable=True)
        return domain._update_global_tree(st, s[0], nl)

    def p_assign(st, x, y, z):
        return domain._common_assign(st, x, y, z, hj, (), nl, None)

    def p_linked(st, x, y, z):
        out = domain._common_assign(st, x, y, z, hj, (), nl, None)
        tree = out[8]
        return build_linked_octree(tree.keys, tree.n_nodes)

    def p_step(st, x, y, z):
        st2, r = domain.sync(st, x, y, z, hj)
        counts, ovf = cell_list_neighbor_counts(
            r.keys, r.x, r.y, r.z, r.h, box, cell_level, cell_cap,
            n_valid=r.end_index, impl=impl)
        return st2, r, counts, ovf

    _, t_enc = timeit(jax.jit(p_encode), x, y, z, name="encode")
    _, t_sort = timeit(jax.jit(p_sort), x, y, z, name="+ sort6")
    _, t_tree = timeit(jax.jit(p_tree), state, x, y, z, name="+ tree update")
    _, t_asn = timeit(jax.jit(p_assign), state, x, y, z, name="+ assignment")
    _, t_lnk = timeit(jax.jit(p_linked), state, x, y, z, name="+ linked build")
    (_, res2), t_sync = timeit(sync_j, state, x, y, z, name="full sync")
    _, t_step = timeit(jax.jit(p_step), state, x, y, z, name="full step (bench)")

    print("\nper-stage deltas (ms):", file=sys.stderr)
    base = None
    for nm, t in [("encode", t_enc), ("sort6", t_sort - t_enc),
                  ("tree_update", t_tree - t_sort), ("assignment", t_asn - t_tree),
                  ("linked_build", t_lnk - t_asn), ("layout+fill", t_sync - t_lnk),
                  ("celllist", t_step - t_sync)]:
        print(f"  {nm:14s} {t*1e3:7.1f}", file=sys.stderr)
    print(f"  {'TOTAL step':14s} {t_step*1e3:7.1f}", file=sys.stderr, flush=True)

    # ---- cell-list substages (on warm sync output) ----------------------
    perm, _ = rowmajor_cell_perm(cell_level)
    pack_j = jax.jit(lambda k, xx, yy, zz, hh, nv: ell_pack_gather(
        k, perm, (xx, yy, zz, hh), cell_cap, cell_level, n_valid=nv))
    (packed, valid, pidx, ovf), t_pack = timeit(
        pack_j, res2.keys, res2.x, res2.y, res2.z, res2.h, res2.end_index,
        name="  ell_pack_gather")
    px, py, pz, ph = packed
    r2 = jnp.where(valid, (2.0 * ph) ** 2, jnp.float32(-1.0))
    if impl == "pallas":
        from cstone_tpu.ops.pallas_stencil import stencil_counts_pallas_sym
        periodic = tuple(int(b) == 1 for b in box.boundaries)
        st_j = jax.jit(lambda a, b, c, d, e: stencil_counts_pallas_sym(
            a, b, c, d, e, box.lengths, periodic, cell_level))
    else:
        from cstone_tpu.traversal.celllist import stencil_neighbor_counts
        st_j = jax.jit(lambda a, b, c, d, e: stencil_neighbor_counts(
            a, b, c, d, e, box, cell_level))
    counts_ell, t_st = timeit(st_j, px, py, pz, r2, valid, name="  stencil kernel")
    sort_j = jax.jit(lambda p, c: jax.lax.sort(
        (p.reshape(-1), c.reshape(-1)), num_keys=1, is_stable=False)[1][:n])
    timeit(sort_j, pidx, counts_ell, name="  backmap sort")


if __name__ == "__main__":
    main()
