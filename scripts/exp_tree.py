"""Profile the octree build fixed point at 2M keys (VERDICT r4 #2).

Times each per-iteration component in isolation on the real TPU:
  - compute_node_counts  (merged-sort searchsorted: 2M codes vs ~400k keys)
  - rebalance_decision   (sibling gather + op codes)
  - rebalance_tree       (searchsorted + source gathers)
  - the full _compute_octree_jit fixed point + its iteration count

Usage: python scripts/exp_tree.py
"""

import os
import sys
import time

if os.path.isdir("/root/.axon_site"):
    sys.path.insert(0, "/root/.axon_site")

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".cstone_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cstone_tpu.sfc import PERIODIC, compute_sfc_keys, make_box
from cstone_tpu.tree.csarray import (
    MAX_UINT32,
    CsArray,
    _compute_octree_jit,
    compute_node_counts,
    default_init_level,
    rebalance_decision,
    rebalance_tree,
    uniform_tree,
)


def t_ms(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1]).ravel()[:1]
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[-1]).ravel()[:1]
        ts.append(time.time() - t0)
    return min(ts) * 1e3


def main():
    n = int(os.environ.get("BENCH_N", 2_000_000))
    bucket = int(os.environ.get("BENCH_BUCKET", 16))
    rng = np.random.RandomState(42)
    box = make_box(0.0, 1.0, boundaries=PERIODIC)
    pos = rng.normal(0.5, 0.15, size=(n, 3)).astype(np.float32)
    pos = np.clip(pos, 0.0, 1.0 - 1e-6)
    x, y, z = (jnp.asarray(pos[:, i]) for i in range(3))

    capacity = max(4096, int(3.2 * n / bucket) // 1024 * 1024 + 4096)
    init_level = default_init_level(n, bucket, capacity)
    print(f"n={n} bucket={bucket} capacity={capacity} init_level={init_level}")

    keys = jax.jit(
        lambda x, y, z: jax.lax.sort(
            (compute_sfc_keys(x, y, z, box, jnp.uint64),), num_keys=1)[0]
    )(x, y, z)
    np.asarray(keys[:1])

    # --- converged tree via the SMALL jits first (fast compiles) ------------
    s_counts = jax.jit(
        lambda tk: compute_node_counts(tk, keys, MAX_UINT32, None))
    s_dec = jax.jit(
        lambda tk, c, nn_: rebalance_decision(tk, c, nn_, bucket))
    s_emit = jax.jit(rebalance_tree)

    def converge(keys):
        tree0 = uniform_tree(keys.dtype, init_level, capacity)
        c0 = s_counts(tree0.keys)
        t = CsArray(keys=tree0.keys, counts=c0, n_nodes=tree0.n_nodes)
        it = 0
        while True:
            ops2, conv2 = s_dec(t.keys, t.counts, t.n_nodes)
            if bool(np.asarray(conv2)):
                break
            nk, nn2 = s_emit(t.keys, ops2, t.n_nodes)
            nc = s_counts(nk)
            t = CsArray(keys=nk, counts=nc, n_nodes=nn2)
            it += 1
        return t, it

    t0 = time.time()
    tree, iters = converge(keys)
    nn = int(np.asarray(tree.n_nodes))
    print(f"host-loop converge: {time.time()-t0:.1f}s iters={iters} "
          f"n_nodes={nn}", flush=True)

    ops, conv = s_dec(tree.keys, tree.counts, tree.n_nodes)
    print(f"compute_node_counts: {t_ms(s_counts, tree.keys):.1f}ms", flush=True)
    print(f"rebalance_decision:  "
          f"{t_ms(s_dec, tree.keys, tree.counts, tree.n_nodes):.1f}ms",
          flush=True)
    print(f"rebalance_tree:      "
          f"{t_ms(s_emit, tree.keys, ops, tree.n_nodes):.1f}ms", flush=True)

    # update step (decision + emit + count fused)
    from cstone_tpu.tree.csarray import update_octree

    s_update = jax.jit(lambda t, k: update_octree(t, k, bucket, MAX_UINT32, None))
    out = s_update(tree, keys)
    print(f"update_octree:       {t_ms(s_update, tree, keys):.1f}ms", flush=True)

    # --- the fused fixed-point build (slow compile) last --------------------
    if os.environ.get("EXP_FULL", "1") == "1":
        s_build = jax.jit(
            lambda k: _compute_octree_jit(k, bucket, capacity, MAX_UINT32,
                                          None, init_level)
        )
        t0 = time.time()
        tr = s_build(keys)
        nn = int(np.asarray(tr.n_nodes))
        print(f"build compile+run={time.time()-t0:.1f}s n_nodes={nn}",
              flush=True)
        print(f"full build: {t_ms(s_build, keys):.1f}ms", flush=True)


if __name__ == "__main__":
    main()
