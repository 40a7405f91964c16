"""Headline benchmark: octree build + neighbor search throughput on one chip.

Mirrors the reference's performance drivers (reference:
test/performance/octree.cu + neighbor_driver.cu): N particles in a periodic
box at ~100 neighbors each, 64-bit Hilbert keys. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline metric is end-to-end pipeline throughput (keys + sort + tree
build + linked tree + neighbor counts) in particles/sec/chip, compared to
the BASELINE.json north star of 1e8 particles/sec/chip.
"""

import json
import os
import sys
import time

# keep the axon TPU plugin when launched bare (see tests/conftest.py for CPU)
if "/root/.axon_site" not in os.environ.get("PYTHONPATH", "") and os.path.isdir(
    "/root/.axon_site"
):
    sys.path.insert(0, "/root/.axon_site")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cstone_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cstone_tpu.domain.layout import leaf_layout_from_counts
from cstone_tpu.sfc import PERIODIC, compute_sfc_keys, make_box
from cstone_tpu.traversal import find_neighbors, make_ns_view
from cstone_tpu.traversal.neighbors import _find_neighbors_impl
from cstone_tpu.tree.csarray import _compute_octree_jit, MAX_UINT32
from cstone_tpu.tree.octree import build_linked_octree


def main():
    n = int(os.environ.get("BENCH_N", 1_000_000))
    bucket = int(os.environ.get("BENCH_BUCKET", 64))
    h_val = float(os.environ.get("BENCH_H", 0.012))  # ~100 neighbors in unit box
    reps = int(os.environ.get("BENCH_REPS", 5))
    key_dtype = jnp.uint64

    rng = np.random.RandomState(42)
    pos = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    h = np.full(n, h_val, dtype=np.float32)
    box = make_box(0.0, 1.0, boundaries=PERIODIC)

    x = jnp.asarray(pos[:, 0])
    y = jnp.asarray(pos[:, 1])
    z = jnp.asarray(pos[:, 2])
    hj = jnp.asarray(h)

    capacity = max(4096, int(3.2 * n / bucket) // 1024 * 1024 + 4096)

    group_size = int(os.environ.get("BENCH_GROUP", 64))
    cand_leaf_cap = int(os.environ.get("BENCH_LEAF_CAP", 160))
    cand_cap = int(os.environ.get("BENCH_CAND_CAP", 3584))
    chunk = int(os.environ.get("BENCH_CHUNK", 64))

    @jax.jit
    def pipeline(x, y, z, hj, box):
        keys = compute_sfc_keys(x, y, z, box, key_dtype)
        keys, xs, ys, zs, hs = jax.lax.sort(
            (keys, x, y, z, hj), num_keys=1, is_stable=False
        )
        tree = _compute_octree_jit(keys, bucket, capacity, MAX_UINT32, None)
        linked = build_linked_octree(tree.keys, tree.n_nodes)
        layout = leaf_layout_from_counts(tree.counts)
        view = make_ns_view(linked, layout, box)
        counts, _, overflow, leaf_overflow = _find_neighbors_impl(
            xs, ys, zs, hs, view, box,
            ng_max=1, group_size=group_size, cand_leaf_cap=cand_leaf_cap,
            cand_cap=cand_cap, chunk=chunk, with_indices=False, n_targets=n,
        )
        return counts, tree.n_nodes, overflow, leaf_overflow

    # warmup / compile; time with a host readback — block_until_ready does
    # not reliably block on the axon loopback backend
    t0 = time.time()
    counts, n_nodes, overflow, leaf_overflow = pipeline(x, y, z, hj, box)
    counts_h = np.asarray(counts)
    compile_time = time.time() - t0
    assert int(overflow) == 0, f"cand_cap exceeded: {int(overflow)}"
    assert int(leaf_overflow) <= cand_leaf_cap, f"leaf cap exceeded: {int(leaf_overflow)}"

    times = []
    for _ in range(reps):
        t0 = time.time()
        counts, n_nodes, overflow, leaf_overflow = pipeline(x, y, z, hj, box)
        _ = int(np.asarray(overflow))  # forces completion of the whole step
        times.append(time.time() - t0)
    best = min(times)

    pps = n / best
    baseline = 1e8  # north star from BASELINE.md: 1e8 particles/sec/chip
    result = {
        "metric": "sync_findneighbors_throughput",
        "value": round(pps, 1),
        "unit": "particles/sec/chip",
        "vs_baseline": round(pps / baseline, 4),
    }
    print(json.dumps(result))
    # diagnostics to stderr (driver only parses stdout JSON)
    print(
        f"n={n} best={best:.4f}s times={['%.3f' % t for t in times]} "
        f"compile={compile_time:.1f}s nodes={int(n_nodes)} "
        f"mean_nb={float(np.mean(np.asarray(counts))):.1f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
