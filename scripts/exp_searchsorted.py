"""searchsorted formulations on TPU at 1M values / 33k queries.

Candidates:
  A. jnp.searchsorted(method="sort")      (current ops.primitives path)
  B. double-sort: one stable merge sort (key, qid) + extraction sort
  C. plain sorts for cost reference

Run: timeout 2400 python scripts/exp_searchsorted.py
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

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    print(f"{name:34s} min={min(ts)*1e3:8.1f}ms compile={compile_s:5.1f}s",
          file=sys.stderr, flush=True)
    return out, min(ts)


def multi_searchsorted_left(a, queries):
    """Positions of each query set in sorted `a` (side='left') via one
    merged stable sort + one extraction sort. All inputs 1-D; `a` sorted.
    """
    n = a.shape[0]
    sizes = [int(q.shape[0]) for q in queries]
    tq = sum(sizes)
    # queries first so ties place them BEFORE equal a-elements (stable)
    keys_all = jnp.concatenate(list(queries) + [a])
    qid = jnp.concatenate(
        [jnp.arange(tq, dtype=jnp.int32), jnp.full((n,), -1, jnp.int32)]
    )
    keys_s, qid_s = jax.lax.sort((keys_all, qid), num_keys=1, is_stable=True)
    is_q = qid_s >= 0
    # rank among a-elements = merged position - #queries at or before
    pos = jnp.arange(n + tq, dtype=jnp.int32)
    nq_incl = jnp.cumsum(is_q.astype(jnp.int32), dtype=jnp.int32)
    rank = pos - nq_incl + 1 - (~is_q).astype(jnp.int32)  # for queries: pos - (#q before)
    # extraction: data rows sort first (key -1... use qid_s directly: -1 < all)
    _, rank_by_qid = jax.lax.sort((qid_s, rank), num_keys=1, is_stable=True)
    tail = rank_by_qid[n:]
    out = []
    off = 0
    for s in sizes:
        out.append(tail[off:off + s])
        off += s
    return out


def main():
    n = 1_000_000
    rng = np.random.RandomState(0)
    a = np.sort(rng.randint(0, 1 << 40, size=n).astype(np.uint64))
    q1 = np.sort(rng.randint(0, 1 << 40, size=32769).astype(np.uint64))
    q2 = np.sort(rng.randint(0, 1 << 40, size=49152).astype(np.uint64))
    q3 = np.sort(rng.randint(0, 1 << 40, size=17000).astype(np.uint64))
    aj = jnp.asarray(a); q1j = jnp.asarray(q1)
    q2j = jnp.asarray(q2); q3j = jnp.asarray(q3)

    # correctness first (CPU oracle)
    got = jax.jit(lambda a_, b_, c_, d_: multi_searchsorted_left(a_, [b_, c_, d_]))(
        aj, q1j, q2j, q3j
    )
    for q, g in zip((q1, q2, q3), got):
        exp = np.searchsorted(a, q, side="left")
        assert np.array_equal(np.asarray(g), exp), (np.asarray(g)[:5], exp[:5])
    print("multi_searchsorted: exact", file=sys.stderr, flush=True)

    timeit(jax.jit(lambda x, q: jnp.searchsorted(x, q, side="left", method="sort")),
           aj, q1j, name="A jnp method=sort (1 set)")
    timeit(jax.jit(lambda x, q: jnp.searchsorted(x, q, side="left", method="sort")),
           aj, q2j, name="A jnp method=sort (49k)")
    timeit(jax.jit(lambda a_, b_: multi_searchsorted_left(a_, [b_])[0]),
           aj, q1j, name="B double-sort (1 set)")
    timeit(jax.jit(lambda a_, b_, c_, d_: multi_searchsorted_left(a_, [b_, c_, d_])),
           aj, q1j, q2j, q3j, name="B double-sort (3 sets)")
    timeit(jax.jit(lambda x: jax.lax.sort((x,), num_keys=1)), aj,
           name="C bare sort u64 1M")
    timeit(jax.jit(lambda x: jax.lax.sort(
        (x, jnp.zeros_like(x, jnp.int32)), num_keys=1, is_stable=True)), aj,
        name="C stable sort u64+i32 1M")


if __name__ == "__main__":
    main()
