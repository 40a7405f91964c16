"""Decompose compute_node_counts cost at 2M codes / 404k tree keys.

The count is two sorts (merged stable u64 rank sort + qid extraction
sort). Candidates measured here:
  - stable (u64, i32) sort of 2.4M      (the current merge)
  - unstable composite-key variant      (key<<1 | is_code; SFC keys < 2^63)
  - i32-key extraction sort             (current second sort)
  - full multi_searchsorted             (both + glue)
  - full compute_node_counts            (+ diff/min glue)

Run (TPU): timeout 1800 python scripts/exp_count.py
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
                 ".cstone_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cstone_tpu.sfc import PERIODIC, compute_sfc_keys, make_box
from cstone_tpu.tree.csarray import (
    MAX_UINT32, _compute_octree_jit, compute_node_counts, default_init_level)
from cstone_tpu.ops.primitives import multi_searchsorted


def t_ms(fn, *args, reps=4, name=""):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        ts.append(time.time() - t0)
    print(f"{name:34s} {min(ts)*1e3:8.1f}ms", file=sys.stderr, flush=True)
    return out


def main():
    n = 2_000_000
    bucket = 16
    rng = np.random.RandomState(42)
    box = make_box(0.0, 1.0, boundaries=PERIODIC)
    pos = np.clip(rng.normal(0.5, 0.15, size=(n, 3)), 0, 1 - 1e-6).astype(np.float32)
    x, y, z = (jnp.asarray(pos[:, i]) for i in range(3))
    keys = jax.jit(lambda x, y, z: jax.lax.sort(
        (compute_sfc_keys(x, y, z, box, jnp.uint64),), num_keys=1)[0])(x, y, z)

    capacity = max(4096, int(3.2 * n / bucket) // 1024 * 1024 + 4096)
    init_level = default_init_level(n, bucket, capacity)
    tree = jax.jit(lambda k: _compute_octree_jit(
        k, bucket, capacity, MAX_UINT32, None, init_level))(keys)
    tkeys = tree.keys
    print(f"n={n} capacity={capacity} n_nodes={int(np.asarray(tree.n_nodes))}",
          file=sys.stderr, flush=True)

    zero = jnp.zeros((8,), jnp.float32)
    t_ms(jax.jit(lambda a: a + 1), zero, name="dispatch floor")

    m = capacity + 1
    qid = jnp.concatenate([jnp.arange(m, dtype=jnp.int32),
                           jnp.full((n,), -1, jnp.int32)])
    merged = jnp.concatenate([tkeys, keys])

    t_ms(jax.jit(lambda k, q: jax.lax.sort((k, q), num_keys=1, is_stable=True)),
         merged, qid, name="stable (u64,i32) sort 2.4M")
    t_ms(jax.jit(lambda k, q: jax.lax.sort((k, q), num_keys=1, is_stable=False)),
         merged, qid, name="unstable (u64,i32) sort 2.4M")

    def composite(tk, pk):
        # queries sort BEFORE equal codes: flag bit 0 for queries
        ck = jnp.concatenate([tk << jnp.uint64(1),
                              (pk << jnp.uint64(1)) | jnp.uint64(1)])
        return jax.lax.sort((ck, qid), num_keys=1, is_stable=False)
    t_ms(jax.jit(composite), tkeys, keys, name="composite unstable sort 2.4M")

    iq = jnp.arange(n + m, dtype=jnp.int32)
    t_ms(jax.jit(lambda q, r: jax.lax.sort((q, r), num_keys=1, is_stable=False)),
         qid, iq, name="(i32,i32) extraction sort 2.4M")

    t_ms(jax.jit(lambda a, q: multi_searchsorted(a, [q])[0]),
         keys, tkeys, name="multi_searchsorted full")
    t_ms(jax.jit(lambda tk, pk: compute_node_counts(tk, pk, MAX_UINT32, None)),
         tkeys, keys, name="compute_node_counts full")


if __name__ == "__main__":
    main()
