"""Headline benchmark: octree build + neighbor search throughput on one chip.

Mirrors the reference's performance drivers (reference:
test/performance/octree.cu + neighbor_driver.cu): N particles in a periodic
box at ~100 neighbors each, 64-bit Hilbert keys. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The pipeline runs as STAGED jits (encode / sort / tree / linked / layout /
traversal / pairwise): on this environment's remote-compile setup one fused
mega-program takes ~45 min to compile while the stages compile in minutes
and cache persistently; the steady-state dispatch overhead between stages
is negligible against the pairwise phase.
"""

import json
import os
import sys
import time

if "/root/.axon_site" not in os.environ.get("PYTHONPATH", "") and os.path.isdir(
    "/root/.axon_site"
):
    sys.path.insert(0, "/root/.axon_site")

import jax

# persistent jit cache INSIDE the repo: /tmp is wiped between rounds, so a
# cache there re-pays the 80-110s/config compiles every round (the r4 suite
# died at rc=124 largely on compile time). The repo directory survives.
_CACHE_DIR = os.environ.get(
    "BENCH_JIT_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cstone_jax_cache"),
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cstone_tpu.domain.layout import leaf_layout_from_counts
from cstone_tpu.sfc import PERIODIC, compute_sfc_keys, make_box
from cstone_tpu.traversal.boxoverlap import min_distance_boxes
from cstone_tpu.ops.pallas_neighbors_v2 import merge_leaf_runs, pairwise_count_runs
from cstone_tpu.traversal.celllist import cell_list_neighbor_counts, choose_cell_level
from cstone_tpu.traversal.cover import build_cell_table, group_cover_runs
from cstone_tpu.traversal.neighbors import OctreeNsView, make_ns_view
from cstone_tpu.traversal.traversal import batched_collect_leaves, batched_collect_leaves_bfs
from cstone_tpu.tree.csarray import (
    MAX_UINT32,
    _compute_octree_jit,
    default_init_level,
)
from cstone_tpu.tree.octree import build_linked_octree


def default_cell_cap(n: int, level: int, snapshots: int = 1) -> int:
    """ELL capacity covering the Poisson occupancy tail at uniform
    density. Extreme-value sizing: E[max over C cells and `snapshots`
    drift steps] ~ mean + sqrt(2 ln(C*snapshots) * mean); add ~1 sigma
    + 6 margin. Rounded up to a multiple of 64 — the Pallas stencil
    needs both zb*cap and (zb+2)*cap lane-aligned (% 128 == 0), i.e.
    cap % 64 == 0. Overflow is flagged and sync_with_retry grows the
    cap, so a tight default is safe."""
    import math

    n_cells = float(1 << (3 * level)) * max(1, snapshots)
    mean = n / float(1 << (3 * level))
    cap = mean + math.sqrt(2.0 * math.log(n_cells) * mean) + 6.0
    return max(64, int(-(-cap // 64) * 64))


class _CapRetry(Exception):
    """Carries grown capacity overrides after an overflow warm-up step."""

    def __init__(self, caps):
        self.caps = caps


def main_sync():
    """Capacity-growth wrapper: re-run the config with grown buffers on
    overflow, the library's sync_with_retry semantics applied at the
    benchmark level (reallocate.hpp:38-107). The first attempt uses tight
    defaults; clustered or large-n configs may need one regrow."""
    caps = {}
    for _ in range(4):
        try:
            return _main_sync_once(caps)
        except _CapRetry as e:
            caps = dict(e.caps)
            print(f"[bench] overflow -> regrow caps: {caps}",
                  file=sys.stderr, flush=True)
    raise RuntimeError(f"bench config still overflows after retries: {caps}")


def _main_sync_once(cap_over):
    """Full single-chip Domain.sync + findNeighbors steady-state throughput.

    The honest headline: every step runs the complete sync pipeline —
    global box, key encode, sort, global-tree update, assignment, particle
    exchange bookkeeping, focus (LET) convergence, per-leaf radii, halo
    discovery, layout, buffer fill — then fixed-radius neighbor counts via
    the cell-list stencil (mirrors the reference's usage loop,
    README.md:60-100, and perf drivers octree.cpp:107-136 +
    neighbor_driver.cu:175-195). Particles drift each step by ~20% of the
    mean interparticle spacing so the warm-started tree/focus fixed points
    do real incremental work, like a real simulation timestep.
    """
    from cstone_tpu.domain.domain import Domain

    n = int(os.environ.get("BENCH_N", 1_000_000))
    bucket = int(os.environ.get("BENCH_BUCKET", 64))
    focus_bucket = int(os.environ.get("BENCH_FOCUS_BUCKET", 64))
    _h_env = os.environ.get("BENCH_H", "")
    reps = int(os.environ.get("BENCH_REPS", 5))
    # BENCH_DIST=uniform|gauss|plummer — the reference's perf workloads
    # (random.hpp RandomGaussianCoordinates, plummer.hpp; octree.cpp:45-72)
    dist = os.environ.get("BENCH_DIST", "uniform")
    adaptive = _h_env == "adaptive" and dist != "uniform"
    if _h_env == "adaptive" and dist == "uniform":
        print(
            "WARNING: BENCH_H=adaptive requires a clustered BENCH_DIST "
            "(gauss|plummer); using the n-scaled fixed h on the uniform "
            "sample",
            file=sys.stderr, flush=True,
        )
    h_val = default_h(n) if _h_env in ("", "adaptive") else float(_h_env)

    rng = np.random.RandomState(42)
    if dist == "gauss":
        from cstone_tpu.utils.workloads import gaussian_coords

        pos = gaussian_coords(n, (0.0, 1.0, 0.0, 1.0, 0.0, 1.0), seed=42)
    elif dist == "plummer":
        from cstone_tpu.utils.workloads import plummer_coords

        p = plummer_coords(n, seed=42)
        # rescale the central 99.9% sphere into the unit box
        r = np.quantile(np.abs(p), 0.999)
        pos = np.clip(p / (2.05 * r) + 0.5, 0.0, 1.0).astype(np.float32)
    else:
        pos = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    box = make_box(0.0, 1.0, boundaries=PERIODIC)
    spacing = (1.0 / n) ** (1.0 / 3.0)
    # Oscillating drift (+v, -v, +v, ...): every step re-encodes, re-sorts
    # and re-converges the warm tree/focus state on genuinely moved
    # particles, but the density field stays bounded — an unbounded random
    # walk would degrade uniformity with step count and force the ELL cap
    # (and with it the cap^2 stencil cost) to grow with the benchmark
    # length, which no real quasi-incompressible workload does.
    drift = jnp.asarray(
        rng.uniform(-0.2, 0.2, size=(n, 3)).astype(np.float32) * spacing
    )
    x = jnp.asarray(pos[:, 0])
    y = jnp.asarray(pos[:, 1])
    z = jnp.asarray(pos[:, 2])
    if adaptive:
        # SPH-style density-adaptive smoothing (~100 neighbors each): the
        # regime the reference's warp-BFS kernel targets
        # (find_neighbors.cuh:46-75); counts run the TIERED cell list
        from cstone_tpu.utils.workloads import adaptive_h

        h_np = np.asarray(adaptive_h(pos, (0.0, 1.0) * 3, 100.0))
        hj = jnp.asarray(h_np)
    else:
        hj = jnp.full((n,), np.float32(h_val))

    tree_capacity = cap_over.get(
        "tree", max(4096, int(3.2 * n / bucket) // 1024 * 1024 + 4096)
    )
    focus_capacity = cap_over.get("focus", tree_capacity)
    domain = Domain(
        rank=0, n_ranks=1, bucket_size=bucket, bucket_size_focus=focus_bucket,
        key_dtype=jnp.uint64, tree_capacity=tree_capacity,
        focus_capacity=focus_capacity,
    )
    state = domain.init_state(box=box, boundaries=(1, 1, 1))
    cell_level = int(os.environ.get("BENCH_CELL_LEVEL", 0)) or choose_cell_level(
        box, h_val
    )
    # default = the scanned 10-step loop: a real client runs many
    # timesteps per diagnostic readback, and the per-dispatch tunnel RTT
    # (~3.5ms/step even pipelined, measured scan 31.9 vs chained 35.5ms at
    # 1M) is not part of the library's cost. BENCH_STEPS=1 restores the
    # chained-dispatch mode.
    steps = int(os.environ.get("BENCH_STEPS", 10))
    # the oscillating drift visits only 3 distinct density snapshots
    # (initial, +v, back) no matter how many steps run, so the occupancy
    # envelope — and with it the cap^2 stencil cost — is step-count
    # independent.
    tier_scale = cap_over.get("tier_scale", 1.0)
    if adaptive:
        from cstone_tpu.traversal.tiered import choose_tier_levels, tier_caps

        tier_levels = choose_tier_levels(h_np, 1.0, max_tiers=3)
        tier_same, tier_cross = tier_caps(
            pos, h_np, (0.0, 1.0), tier_levels, slack=1.3 * tier_scale)
        cell_cap = max(tier_same)  # only for the growth bookkeeping
        print(f"[bench] adaptive tiers: levels={tier_levels} "
              f"caps={tier_same} cross={tier_cross}",
              file=sys.stderr, flush=True)
    elif "cell" in cap_over:
        cell_cap = cap_over["cell"]
    elif dist == "uniform":
        cell_cap = int(os.environ.get("BENCH_CELL_CAP", 0)) or default_cell_cap(
            n, cell_level, snapshots=3
        )
    else:
        # clustered: size the ELL cap from the MEASURED peak occupancy
        # (the Poisson formula only covers uniform density)
        d = 1 << cell_level
        ijk = np.clip((pos * d).astype(np.int64), 0, d - 1)
        flat = (ijk[:, 0] * d + ijk[:, 1]) * d + ijk[:, 2]
        occ_max = int(np.bincount(flat, minlength=d * d * d).max())
        cell_cap = int(os.environ.get("BENCH_CELL_CAP", 0)) or max(
            64, -(-int(occ_max * 1.1 + 8) // 64) * 64
        )

    cell_impl = os.environ.get(
        "BENCH_CELL_IMPL",
        "pallas" if jax.default_backend() not in ("cpu",) else "xla",
    )
    # BENCH_OP=density swaps the neighbor-count pass for the fused SPH
    # density stencil (the reference's per-pair interaction run inside the
    # traversal, find_neighbors.cuh:94-124) — same sync pipeline around it
    bench_op = os.environ.get("BENCH_OP", "count")

    def nb_pass(res):
        if adaptive:
            from cstone_tpu.traversal.tiered import (
                cell_list_neighbor_counts_tiered,
            )

            return cell_list_neighbor_counts_tiered(
                res.keys, res.x, res.y, res.z, res.h, box, tier_levels,
                tier_same, tier_cross, n_valid=res.end_index,
                interpret=jax.default_backend() == "cpu",
            )
        if bench_op == "density":
            from cstone_tpu.traversal.celllist import cell_list_sph_density

            vals, ovf = cell_list_sph_density(
                res.keys, res.x, res.y, res.z, res.h, box, cell_level,
                cell_cap, mass=1.0 / n, n_valid=res.end_index,
                const_h=True, interpret=jax.default_backend() == "cpu",
            )
            return vals, ovf
        return cell_list_neighbor_counts(
            res.keys, res.x, res.y, res.z, res.h, box, cell_level, cell_cap,
            n_valid=res.end_index, impl=cell_impl, const_h=True,
        )

    # ONE fused program per step (sync + neighbor counts): each extra
    # dispatch costs ~20ms of tunnel latency on this environment. Used to
    # warm the state and for the final correctness-checked step.
    @jax.jit
    def s_step(state, x, y, z):
        state, res = domain.sync(state, x, y, z, hj)
        counts, cell_ovf = nb_pass(res)
        ovf = jnp.maximum(res.overflow, cell_ovf.astype(jnp.int32))
        return state, res, counts, ovf

    # Timestep program for the pipelined-dispatch loop: drift + sync +
    # neighbor counts fused, overflow max-folded into the carry so a block
    # of K chained calls needs ONE host readback at the end (jax dispatch
    # is async; the device queue soaks up the ~20ms/dispatch tunnel RTT).
    # counts feed a carried checksum so no step can be dead-code-eliminated.
    @jax.jit
    def s_stepd(state, x, y, z, sgn, ovf, chk):
        x = (x + sgn * drift[:, 0]) % 1.0
        y = (y + sgn * drift[:, 1]) % 1.0
        z = (z + sgn * drift[:, 2]) % 1.0
        state, res = domain.sync(state, x, y, z, hj)
        counts, cell_ovf = nb_pass(res)
        ovf = jnp.maximum(
            ovf, jnp.maximum(res.overflow, cell_ovf.astype(jnp.int32))
        )
        chk = chk + jnp.sum(counts.astype(jnp.float32)).astype(jnp.int32)
        return state, x, y, z, -sgn, ovf, chk

    @jax.jit
    def s_drift(x, y, z):
        nx = (x + drift[:, 0]) % 1.0
        ny = (y + drift[:, 1]) % 1.0
        nz = (z + drift[:, 2]) % 1.0
        return nx, ny, nz

    # Steady-state simulation loop (BENCH_STEPS>1): `steps` full timesteps
    # (drift -> sync -> neighbor counts) scanned inside ONE program, like
    # a real client loop that only reads back diagnostics every few steps
    # (README.md:60-100). counts feed the carried checksum so no step can
    # be dead-code-eliminated; overflow is max-accumulated and asserted
    # after the readback.
    @jax.jit
    def s_loop(state, x, y, z):
        def one(carry, _):
            state, x, y, z, sgn, ovf_acc, chk = carry
            x = (x + sgn * drift[:, 0]) % 1.0
            y = (y + sgn * drift[:, 1]) % 1.0
            z = (z + sgn * drift[:, 2]) % 1.0
            state, res = domain.sync(state, x, y, z, hj)
            counts, cell_ovf = nb_pass(res)
            ovf = jnp.maximum(res.overflow, cell_ovf.astype(jnp.int32))
            chk = chk + jnp.sum(counts.astype(jnp.float32)).astype(jnp.int32)
            # carry the pre-sync positions: the +-v cancellation needs the
            # original particle order (res.x is in sorted order)
            return (state, x, y, z, -sgn,
                    jnp.maximum(ovf_acc, ovf), chk), None

        carry0 = (state, x, y, z, jnp.float32(1.0), jnp.int32(0), jnp.int32(0))
        carry, _ = jax.lax.scan(one, carry0, None, length=steps)
        state, x, y, z, sgn, ovf, chk = carry
        return state, x, y, z, ovf, chk

    def _check_grow(ovf, res):
        if int(np.asarray(ovf)) == 0:
            return
        caps = dict(cap_over)
        det = (np.asarray(res.overflow_detail)
               if res is not None and res.overflow_detail is not None
               else None)
        if det is not None:
            # CAP_NAMES order: local, tree, focus, move, treelet, halo, win
            if det[1] > 0:
                caps["tree"] = int(det[1]) + 8192
            if det[2] > 0:
                caps["focus"] = int(det[2]) + 8192
            if det[1] == 0 and det[2] == 0:
                if adaptive:
                    caps["tier_scale"] = tier_scale * 1.5
                else:
                    caps["cell"] = -(-int(cell_cap * 3 // 2) // 64) * 64
        else:
            # folded flag without detail: grow everything moderately
            caps["tree"] = int(tree_capacity * 3 // 2)
            caps["focus"] = int(focus_capacity * 3 // 2)
            caps["cell"] = -(-int(cell_cap * 3 // 2) // 64) * 64
        raise _CapRetry(caps)

    t0 = time.time()
    state, res, counts, ovf = s_step(state, x, y, z)
    _check_grow(ovf, res)
    compile_time = time.time() - t0

    if steps == 1:
        # pipelined-dispatch steady state: `reps` chained timestep programs
        # dispatched back-to-back, ONE readback at block end (a client loop
        # only reads diagnostics every few steps — README.md:60-100). Two
        # blocks, best block wins (tunnel runs show 4-5x run variance).
        ovf_c, chk = jnp.int32(0), jnp.int32(0)
        sgn = jnp.float32(1.0)
        state, x, y, z, sgn, ovf_c, chk = s_stepd(state, x, y, z, sgn, ovf_c, chk)
        ovf_h = int(np.asarray(ovf_c))  # warm s_stepd's compile
        if ovf_h:
            _check_grow(ovf_h, None)
        times = []
        for _ in range(2):
            ovf_c = jnp.int32(0)
            t0 = time.time()
            for _ in range(reps):
                state, x, y, z, sgn, ovf_c, chk = s_stepd(
                    state, x, y, z, sgn, ovf_c, chk
                )
            ovf_h = int(np.asarray(ovf_c))  # one readback per block
            times.append((time.time() - t0) / reps)
            assert ovf_h == 0, f"overflow: {ovf_h}"
        best = min(times)
        state, res, counts, ovf = s_step(state, x, y, z)
        assert int(np.asarray(ovf)) == 0
    else:
        t0 = time.time()
        state, x, y, z, ovf, _ = s_loop(state, x, y, z)
        assert int(np.asarray(ovf)) == 0, f"overflow: {int(np.asarray(ovf))}"
        compile_time += time.time() - t0

        times = []
        for _ in range(reps):
            t0 = time.time()
            state, x, y, z, ovf, chk = s_loop(state, x, y, z)
            ovf_h = int(np.asarray(ovf))  # host readback forces completion
            times.append((time.time() - t0) / steps)
            assert ovf_h == 0, f"overflow: {ovf_h}"
        best = min(times)

        # one checked step for the reported diagnostics
        state, res, counts, ovf = s_step(state, x, y, z)
        assert int(np.asarray(ovf)) == 0

    n_owned = int(np.asarray(res.end_index - res.start_index))
    mean_nb = float(np.asarray(counts)[:n_owned].mean())
    pps = n / best
    baseline = 1e8
    # NcStats / TFlops estimate parity (neighbor_driver.cu:160-170:
    # 11 flops per tested pair)
    from cstone_tpu.traversal.celllist import rowmajor_cell_perm, stencil_stats

    if adaptive:
        pairs_f, max_occ = 0.0, jnp.int32(0)  # per-tier grids; see caps line
    else:
        offs = build_cell_table(res.keys, cell_level, n_valid=res.end_index)
        perm, _ = rowmajor_cell_perm(cell_level)
        pairs, max_occ = stencil_stats(offs, perm, cell_level)
        pairs_f = float(np.asarray(pairs))
    print(json.dumps({
        "metric": ("sync_sph_density_throughput" if bench_op == "density"
                   else "sync_findneighbors_throughput"),
        "value": round(pps, 1),
        "unit": "particles/sec/chip",
        "vs_baseline": round(pps / baseline, 4),
    }))
    print(
        f"n={n} best={best:.4f}s times={['%.3f' % t for t in times]} "
        f"compile={compile_time:.1f}s mode=sync level={cell_level} "
        f"mean_nb={mean_nb:.1f} pairs={pairs_f:.3g} "
        f"max_occ={int(np.asarray(max_occ))} "
        f"tflops={11.0 * pairs_f / best / 1e12:.3f}",
        file=sys.stderr,
    )


def main_tree():
    """Octree rebuild timing (BASELINE config 1; octree.cpp:107-136 analog).

    Times (a) the full fixed-point build from scratch (uniform-level warm
    start + counts + rebalance loop) and (b) the incremental update of the
    converged tree against drifted particle keys (one decision + count
    step when nothing changes structurally). Reports keys/sec for the
    from-scratch build. BENCH_N scales to 64M+ (config 1 scaled)."""
    n = int(os.environ.get("BENCH_N", 2_000_000))
    bucket = int(os.environ.get("BENCH_BUCKET", 16))
    reps = int(os.environ.get("BENCH_REPS", 5))
    key_dtype = jnp.uint64

    rng = np.random.RandomState(42)
    box = make_box(0.0, 1.0, boundaries=PERIODIC)
    # Gaussian blob like octree.cpp's coordinate sample (clipped to box)
    pos = rng.normal(0.5, 0.15, size=(n, 3)).astype(np.float32)
    pos = np.clip(pos, 0.0, 1.0 - 1e-6)
    x, y, z = (jnp.asarray(pos[:, i]) for i in range(3))

    capacity = max(4096, int(3.2 * n / bucket) // 1024 * 1024 + 4096)
    init_level = default_init_level(n, bucket, capacity)

    @jax.jit
    def s_keys(x, y, z):
        k = compute_sfc_keys(x, y, z, box, key_dtype)
        return jax.lax.sort((k,), num_keys=1)[0]

    s_build = jax.jit(
        lambda k: _compute_octree_jit(k, bucket, capacity, MAX_UINT32, None, init_level)
    )

    from cstone_tpu.tree.csarray import update_octree

    s_update = jax.jit(
        lambda t, k: update_octree(t, k, bucket, MAX_UINT32, None)
    )

    keys = s_keys(x, y, z)
    spacing = (1.0 / n) ** (1.0 / 3.0)
    drift = rng.uniform(-0.2, 0.2, size=(n, 3)).astype(np.float32) * spacing
    pos2 = np.clip(pos + drift, 0.0, 1.0 - 1e-6)
    keys2 = s_keys(*(jnp.asarray(pos2[:, i]) for i in range(3)))

    t0 = time.time()
    tree = s_build(keys)
    n_nodes = int(np.asarray(tree.n_nodes))
    compile_s = time.time() - t0
    if n_nodes > capacity:
        # converged tree larger than the sizing guess (clustered sample):
        # rebuild the jits with the measured requirement + slack
        capacity = int(n_nodes * 1.15) // 1024 * 1024 + 4096
        print(f"[bench] regrow tree capacity -> {capacity}",
              file=sys.stderr, flush=True)
        init_level = default_init_level(n, bucket, capacity)
        s_build = jax.jit(
            lambda k: _compute_octree_jit(
                k, bucket, capacity, MAX_UINT32, None, init_level)
        )
        s_update = jax.jit(
            lambda t, k: update_octree(t, k, bucket, MAX_UINT32, None)
        )
        t0 = time.time()
        tree = s_build(keys)
        n_nodes = int(np.asarray(tree.n_nodes))
        compile_s += time.time() - t0
        assert n_nodes <= capacity, f"tree capacity exceeded: {n_nodes}"
    tree2, conv = s_update(tree, keys2)
    np.asarray(conv)
    compile_s += 0.0

    t_build, t_update = [], []
    for _ in range(reps):
        t0 = time.time()
        tree = s_build(keys)
        np.asarray(tree.n_nodes)
        t_build.append(time.time() - t0)
        t0 = time.time()
        tree2, conv = s_update(tree, keys2)
        np.asarray(conv)
        t_update.append(time.time() - t0)
    bb, bu = min(t_build), min(t_update)
    print(json.dumps({
        "metric": "octree_build_throughput",
        "value": round(n / bb, 1),
        "unit": "keys/sec/chip",
        "vs_baseline": round((n / bb) / 1e8, 4),
    }))
    print(
        f"n={n} bucket={bucket} nodes={n_nodes} build_best={bb*1e3:.1f}ms "
        f"update_best={bu*1e3:.1f}ms compile={compile_s:.1f}s "
        f"build_times={['%.0f' % (t*1e3) for t in t_build]} "
        f"update_times={['%.0f' % (t*1e3) for t in t_update]}",
        file=sys.stderr,
    )


def default_h(n: int) -> float:
    """Search radius holding ~58 neighbors at any n (h ∝ n^(-1/3)): the
    1M reference point is h=0.012 (neighbor_driver.cu:175-195's regime);
    larger n keeps the SAME mean neighbor count so throughputs stay
    comparable in pair terms."""
    return 0.012 * (1_000_000.0 / float(n)) ** (1.0 / 3.0)


def main():
    n = int(os.environ.get("BENCH_N", 1_000_000))
    bucket = int(os.environ.get("BENCH_BUCKET", 64))
    bench_op = os.environ.get("BENCH_OP", "count")
    _h_env = os.environ.get("BENCH_H", "")
    h_val = default_h(n) if _h_env in ("", "adaptive") else float(_h_env)
    reps = int(os.environ.get("BENCH_REPS", 5))
    group_size = int(os.environ.get("BENCH_GROUP", 256))
    cand_leaf_cap = int(os.environ.get("BENCH_LEAF_CAP", 320))
    cand_cap = int(os.environ.get("BENCH_CAND_CAP", 3584))
    key_dtype = jnp.uint64

    rng = np.random.RandomState(42)
    dist = os.environ.get("BENCH_DIST", "uniform")
    if dist == "gauss":
        from cstone_tpu.utils.workloads import gaussian_coords

        pos = gaussian_coords(n, (0.0, 1.0, 0.0, 1.0, 0.0, 1.0), seed=42)
    elif dist == "plummer":
        from cstone_tpu.utils.workloads import plummer_coords

        p = plummer_coords(n, seed=42)
        r = np.quantile(np.abs(p), 0.999)
        pos = np.clip(p / (2.05 * r) + 0.5, 0.0, 1.0).astype(np.float32)
    else:
        pos = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    box = make_box(0.0, 1.0, boundaries=PERIODIC)
    x = jnp.asarray(pos[:, 0])
    y = jnp.asarray(pos[:, 1])
    z = jnp.asarray(pos[:, 2])
    if dist == "uniform" and os.environ.get("BENCH_H", "") == "adaptive":
        print(
            "WARNING: BENCH_H=adaptive requires a clustered BENCH_DIST "
            "(gauss|plummer); using fixed h=0.012 on the uniform sample",
            file=sys.stderr, flush=True,
        )
    if dist != "uniform" and os.environ.get("BENCH_H", "") == "adaptive":
        # SPH-style density-adaptive smoothing lengths (~100 neighbors
        # each) — the regime the reference's warp-BFS kernel targets
        # (find_neighbors.cuh:200-343) and the stress case for any
        # fixed-level grid
        from cstone_tpu.utils.workloads import adaptive_h

        hj = jnp.asarray(adaptive_h(pos, (0.0, 1.0) * 3, 100.0))
    else:
        hj = jnp.full((n,), np.float32(h_val))

    capacity = max(4096, int(3.2 * n / bucket) // 1024 * 1024 + 4096)
    n_groups = -(-n // group_size)
    n_groups = -(-n_groups // 8) * 8  # kernel group_block alignment

    # ---- staged jits --------------------------------------------------------
    s_encode = jax.jit(lambda x, y, z: compute_sfc_keys(x, y, z, box, key_dtype))
    s_sort = jax.jit(
        lambda k, x, y, z, h: jax.lax.sort((k, x, y, z, h), num_keys=1, is_stable=False)
    )
    init_level = default_init_level(n, bucket, capacity)
    s_tree = jax.jit(
        lambda k: _compute_octree_jit(
            k, bucket, capacity, MAX_UINT32, None, init_level
        )
    )
    s_linked = jax.jit(lambda t: build_linked_octree(t.keys, t.n_nodes))
    s_layout = jax.jit(lambda t: leaf_layout_from_counts(t.counts))

    @jax.jit
    def s_groups(xs, ys, zs, hs):
        pad = n_groups * group_size - n
        def p(a):
            return jnp.concatenate([a, jnp.zeros((pad,), a.dtype)]) if pad else a
        gx = p(xs).reshape(n_groups, group_size)
        gy = p(ys).reshape(n_groups, group_size)
        gz = p(zs).reshape(n_groups, group_size)
        gh = p(hs).reshape(n_groups, group_size)
        lane = jnp.arange(group_size, dtype=jnp.int32)
        gvalid = (
            jnp.arange(n_groups, dtype=jnp.int32)[:, None] * group_size + lane
        ) < n
        big = jnp.float32(np.finfo(np.float32).max)
        gmin = jnp.stack([jnp.min(jnp.where(gvalid, a, big), 1) for a in (gx, gy, gz)], -1)
        gmax = jnp.stack([jnp.max(jnp.where(gvalid, a, -big), 1) for a in (gx, gy, gz)], -1)
        gc = (gmin + gmax) * 0.5
        gs = (gmax - gmin) * 0.5
        gr = 2.0 * jnp.max(jnp.where(gvalid, gh, 0.0), 1)
        return gx, gy, gz, gh, gvalid, gc, gs, gr

    trav_mode = os.environ.get("BENCH_TRAV", "cell")
    cell_level = int(os.environ.get("BENCH_CELL_LEVEL", 0)) or choose_cell_level(
        box, h_val
    )
    cell_cap = int(os.environ.get("BENCH_CELL_CAP", 0)) or default_cell_cap(
        n, cell_level
    )
    cell_impl = os.environ.get(
        "BENCH_CELL_IMPL",
        "pallas" if jax.default_backend() not in ("cpu",) else "xla",
    )
    _const_h = not (
        dist != "uniform" and os.environ.get("BENCH_H", "") == "adaptive"
    )
    s_cell = jax.jit(
        lambda k, xs, ys, zs, hs: cell_list_neighbor_counts(
            k, xs, ys, zs, hs, box, cell_level, cell_cap, impl=cell_impl,
            const_h=_const_h,
        )
    )

    @jax.jit
    def s_front(x, y, z, h):
        keys = compute_sfc_keys(x, y, z, box, key_dtype)
        return jax.lax.sort((keys, x, y, z, h), num_keys=1, is_stable=False)

    @jax.jit
    def s_treetab(keys):
        offs = build_cell_table(keys, cell_level)
        counts0 = None
        if cell_level == init_level:
            c = jnp.minimum(
                (offs[1:] - offs[:-1]).astype(jnp.uint32),
                jnp.uint32(MAX_UINT32),
            )
            counts0 = jnp.zeros((capacity,), jnp.uint32).at[: c.shape[0]].set(c)
        tree = _compute_octree_jit(
            keys, bucket, capacity, MAX_UINT32, None, init_level, counts0
        )
        return tree, offs
    frontier_cap = int(os.environ.get("BENCH_FRONTIER_CAP", 256))
    table_level = int(os.environ.get("BENCH_TABLE_LEVEL", 6))
    cells_per_dim = int(os.environ.get("BENCH_CELLS_PER_DIM", 8))

    def s_traverse(view_centers, view_sizes, child_offsets, gc, gs, gr):
        def crit(q, nid):
            d = min_distance_boxes(gc[q], gs[q], view_centers[nid], view_sizes[nid], box)
            return jnp.sum(d * d, -1) < gr[q] * gr[q]
        if trav_mode == "bfs":
            leaves, n_cand, fmax = batched_collect_leaves_bfs(
                child_offsets, crit, n_groups, cand_leaf_cap, frontier_cap
            )
            return leaves, n_cand
        return batched_collect_leaves(child_offsets, crit, n_groups, cand_leaf_cap)
    s_traverse = jax.jit(s_traverse)

    run_cap = int(os.environ.get("BENCH_RUN_CAP", 48))
    tile = int(os.environ.get("BENCH_TILE", 1024))
    n_pad_tiles = max(tile, (n + tile - 1) // tile * tile)

    s_table = jax.jit(lambda k: build_cell_table(k, table_level))

    @jax.jit
    def s_cover(table, gc, gs, gr):
        return group_cover_runs(
            gc - gs, gc + gs, gr, table, table_level, box, key_dtype,
            cells_per_dim=cells_per_dim, run_cap=run_cap,
        )

    @jax.jit
    def s_runs(internal_to_leaf, layout, leaves_sorted, n_cand):
        leaf_idx = internal_to_leaf[jnp.maximum(leaves_sorted, 0)]
        leaf_idx = jnp.where(leaves_sorted >= 0, leaf_idx, 0)
        return merge_leaf_runs(leaf_idx, n_cand, layout, run_cap)

    pairwise_mode = os.environ.get("BENCH_PAIRWISE", "v2")
    chunk = int(os.environ.get("BENCH_CHUNK", 64))

    @jax.jit
    def s_flatten_xla(internal_to_leaf, layout, leaves_sorted, n_cand):
        # candidate index matrix for the XLA fallback path
        leaf_idx = internal_to_leaf[jnp.maximum(leaves_sorted, 0)]
        leaf_idx = jnp.where(leaves_sorted >= 0, leaf_idx, 0)
        k = jnp.arange(cand_leaf_cap, dtype=jnp.int32)
        k_valid = k[None, :] < jnp.minimum(n_cand, cand_leaf_cap)[:, None]
        starts = layout[leaf_idx]
        lens = jnp.where(k_valid, layout[leaf_idx + 1] - starts, 0)
        inc = jnp.cumsum(lens, axis=1)
        total = inc[:, -1]
        exc_k = inc - lens
        row_q = jnp.arange(n_groups, dtype=jnp.int32)[:, None]
        seg0 = jnp.zeros((n_groups, cand_cap), dtype=jnp.int32)
        ok = k_valid & (lens > 0) & (exc_k < cand_cap)
        seg0 = seg0.at[
            jnp.where(ok, row_q, n_groups), jnp.where(ok, exc_k, 0)
        ].max(jnp.broadcast_to(k[None, :], exc_k.shape), mode="drop")
        seg = jax.lax.cummax(seg0, axis=1)
        j = jnp.arange(cand_cap, dtype=jnp.int32)
        cand_idx = starts[row_q, seg] + (j[None, :] - exc_k[row_q, seg])
        cand_valid = j[None, :] < jnp.minimum(total, cand_cap)[:, None]
        return jnp.where(cand_valid, cand_idx, 0), cand_valid, total

    @jax.jit
    def s_pairwise_xla(xs, ys, zs, gx, gy, gz, gh, gvalid, cand_idx, cand_valid):
        n_chunks = n_groups // chunk
        L = box.lengths.astype(jnp.float32)
        iL = (1.0 / box.lengths).astype(jnp.float32)
        pm = jnp.asarray(box.periodic_mask, jnp.float32)
        lane = jnp.arange(group_size, dtype=jnp.int32)

        def do(c):
            sidx = c * chunk
            ci = jax.lax.dynamic_slice_in_dim(cand_idx, sidx, chunk)
            cv = jax.lax.dynamic_slice_in_dim(cand_valid, sidx, chunk)
            txs = jax.lax.dynamic_slice_in_dim(gx, sidx, chunk)
            tys = jax.lax.dynamic_slice_in_dim(gy, sidx, chunk)
            tzs = jax.lax.dynamic_slice_in_dim(gz, sidx, chunk)
            ths = jax.lax.dynamic_slice_in_dim(gh, sidx, chunk)
            tv = jax.lax.dynamic_slice_in_dim(gvalid, sidx, chunk)
            cx, cy, cz = xs[ci], ys[ci], zs[ci]

            def ax(t, cc, d):
                dd = t[:, :, None] - cc[:, None, :]
                return dd - pm[d] * L[d] * jnp.round(dd * iL[d])

            d2 = ax(txs, cx, 0) ** 2 + ax(tys, cy, 1) ** 2 + ax(tzs, cz, 2) ** 2
            r2 = (2.0 * ths) ** 2
            tgt = (jnp.arange(chunk, dtype=jnp.int32)[:, None] + sidx) * group_size + lane
            w = (
                (d2 < r2[:, :, None])
                & (ci[:, None, :] != tgt[:, :, None])
                & cv[:, None, :]
                & tv[:, :, None]
            )
            return jnp.sum(w, -1, dtype=jnp.uint32)

        return jax.lax.map(do, jnp.arange(n_chunks, dtype=jnp.int32)).reshape(-1)

    @jax.jit
    def s_pairwise(xs, ys, zs, gx, gy, gz, gh, gvalid, run_start, run_len):
        pad = n_pad_tiles - n
        big = jnp.float32(1e30)
        xs_p = jnp.concatenate([xs, jnp.full((pad,), big, jnp.float32)])
        ys_p = jnp.concatenate([ys, jnp.full((pad,), big, jnp.float32)])
        zs_p = jnp.concatenate([zs, jnp.full((pad,), big, jnp.float32)])
        targets = jnp.stack([gx, gy, gz], axis=-1)
        r2 = jnp.where(gvalid, (2.0 * gh) ** 2, -1.0)
        box_params = jnp.concatenate(
            [box.lengths.astype(jnp.float32),
             (1.0 / box.lengths).astype(jnp.float32),
             jnp.asarray(box.periodic_mask, jnp.float32)]
        )
        return pairwise_count_runs(
            targets, r2, run_start, run_len, xs_p, ys_p, zs_p, box_params,
            tile=tile, interpret=jax.default_backend() == "cpu",
        )

    def pipeline():
        if trav_mode == "cell":
            keys, xs, ys, zs, hs = s_front(x, y, z, hj)
            tree, offs = s_treetab(keys)
            counts, cell_ovf = s_cell(keys, xs, ys, zs, hs)
            return counts, tree.n_nodes, cell_ovf.astype(jnp.int32), jnp.int32(0)
        keys = s_encode(x, y, z)
        keys, xs, ys, zs, hs = s_sort(keys, x, y, z, hj)
        tree = s_tree(keys)
        gx, gy, gz, gh, gvalid, gc, gs, gr = s_groups(xs, ys, zs, hs)
        if trav_mode == "cover":
            table = s_table(keys)
            run_start, run_len, n_runs, run_ovf = s_cover(table, gc, gs, gr)
            counts = s_pairwise(
                xs, ys, zs, gx, gy, gz, gh, gvalid, run_start, run_len
            )
            counts = counts.reshape(-1)
            return counts, tree.n_nodes, run_ovf.astype(jnp.int32), jnp.max(n_runs)
        linked = s_linked(tree)
        layout = s_layout(tree)
        view = make_ns_view(linked, layout, box)
        leaves_sorted, n_cand = s_traverse(
            view.centers, view.sizes, linked.child_offsets, gc, gs, gr
        )
        if pairwise_mode == "v2":
            run_start, run_len, n_runs, run_ovf = s_runs(
                linked.internal_to_leaf, layout, leaves_sorted, n_cand
            )
            counts = s_pairwise(
                xs, ys, zs, gx, gy, gz, gh, gvalid, run_start, run_len
            )
            overflow = run_ovf.astype(jnp.int32)
        else:
            cand_idx, cand_valid, total = s_flatten_xla(
                linked.internal_to_leaf, layout, leaves_sorted, n_cand
            )
            counts = s_pairwise_xla(
                xs, ys, zs, gx, gy, gz, gh, gvalid, cand_idx, cand_valid
            )
            overflow = jnp.max(
                jnp.where(total > cand_cap, total, 0)
            ).astype(jnp.int32)
        counts = counts.reshape(-1)
        return counts, tree.n_nodes, overflow, jnp.max(n_cand)

    t0 = time.time()
    counts, n_nodes, overflow, aux_max = pipeline()
    counts_h = np.asarray(counts)
    compile_time = time.time() - t0
    assert int(np.asarray(overflow)) == 0, f"cap exceeded: {int(np.asarray(overflow))}"
    if trav_mode == "cover":
        assert int(np.asarray(aux_max)) <= run_cap
    else:
        assert int(np.asarray(aux_max)) <= cand_leaf_cap

    if os.environ.get("BENCH_STAGES"):
        # isolated per-stage timing: materialize each stage's inputs first,
        # then time stage + 1-element readback; subtract the measured
        # readback/dispatch floor (a null stage) once per stage.
        def force(o):
            # one readback only: each np.asarray costs a full tunnel
            # round-trip (~50-100ms) on the remote backend. jax.block_until_
            # ready is unreliable there (see ROADMAP.md), but all stage jits
            # run sequentially on one stream, so reading back any single
            # output element observes completion of the whole dispatch.
            np.asarray(jax.tree_util.tree_leaves(o)[-1]).ravel()[:1]
            return o

        keys0 = force(s_encode(x, y, z))
        keys_s, xs, ys, zs, hs = force(s_sort(keys0, x, y, z, hj))
        tree = force(s_tree(keys_s))
        gstuff = force(s_groups(xs, ys, zs, hs))
        gx, gy, gz, gh, gvalid, gc, gs, gr = gstuff
        stages = [
            ("encode", lambda: s_encode(x, y, z)),
            ("sort", lambda: s_sort(keys0, x, y, z, hj)),
            ("tree", lambda: s_tree(keys_s)),
            ("groups", lambda: s_groups(xs, ys, zs, hs)),
        ]
        if trav_mode == "cell":
            treetab = force(s_treetab(keys_s))
            stages += [
                ("treetab", lambda: s_treetab(keys_s)),
                ("cell", lambda: s_cell(keys_s, xs, ys, zs, hs)),
            ]
        elif trav_mode == "cover":
            table = force(s_table(keys_s))
            cov = force(s_cover(table, gc, gs, gr))
            run_start, run_len = cov[0], cov[1]
            stages += [
                ("table", lambda: s_table(keys_s)),
                ("cover", lambda: s_cover(table, gc, gs, gr)),
                ("pairwise", lambda: s_pairwise(
                    xs, ys, zs, gx, gy, gz, gh, gvalid, run_start, run_len)),
            ]
        else:
            linked = force(s_linked(tree))
            layout = force(s_layout(tree))
            view = make_ns_view(linked, layout, box)
            trav = force(s_traverse(
                view.centers, view.sizes, linked.child_offsets, gc, gs, gr))
            leaves_sorted, n_cand = trav[0], trav[1]
            runs = force(s_runs(
                linked.internal_to_leaf, layout, leaves_sorted, n_cand))
            run_start, run_len = runs[0], runs[1]
            stages += [
                ("linked", lambda: s_linked(tree)),
                ("layout", lambda: s_layout(tree)),
                ("traverse", lambda: s_traverse(
                    view.centers, view.sizes, linked.child_offsets, gc, gs, gr)),
                ("runs", lambda: s_runs(
                    linked.internal_to_leaf, layout, leaves_sorted, n_cand)),
                ("pairwise", lambda: s_pairwise(
                    xs, ys, zs, gx, gy, gz, gh, gvalid, run_start, run_len)),
            ]

        def time_stage(fn):
            ts = []
            for _ in range(3):
                t0 = time.time()
                force(fn())
                ts.append(time.time() - t0)
            return min(ts)

        floor = time_stage(lambda: keys0)  # readback/dispatch overhead
        stage_times = {nm: time_stage(fn) - floor for nm, fn in stages}
        print(
            f"stages(ms, isolated, floor={floor*1e3:.1f}): "
            + " ".join(f"{k}={v*1e3:.1f}" for k, v in stage_times.items())
            + f" sum={sum(stage_times.values())*1e3:.1f}",
            file=sys.stderr,
        )

    times = []
    for _ in range(reps):
        t0 = time.time()
        counts, n_nodes, overflow, leaf_ovf = pipeline()
        _ = np.asarray(overflow)  # host readback forces completion
        times.append(time.time() - t0)
    best = min(times)

    pps = n / best
    baseline = 1e8
    print(json.dumps({
        "metric": ("sync_sph_density_throughput" if bench_op == "density"
                   else "sync_findneighbors_throughput"),
        "value": round(pps, 1),
        "unit": "particles/sec/chip",
        "vs_baseline": round(pps / baseline, 4),
    }))
    print(
        f"n={n} best={best:.4f}s times={['%.3f' % t for t in times]} "
        f"compile={compile_time:.1f}s nodes={int(np.asarray(n_nodes))} "
        f"mean_nb={float(counts_h[:n].mean()):.1f}",
        file=sys.stderr,
    )


def main_suite():
    """Run the BASELINE.md scale configs, one subprocess each, within a
    wall-clock budget.

    The headline (1M uniform full sync + neighbor counts) runs FIRST and
    prints its JSON line on STDOUT — and is RE-printed as the suite's very
    last stdout line so the driver's parsed metric is always the headline;
    every other config's JSON rides STDERR with a "config" tag so the
    recorded tail carries the whole table (BASELINE.md configs 1-3: 2M/64M
    octree rebuild, 4M single-rank sync, clustered 1M throughput).

    Budget discipline (the r4 suite died at rc=124 with 4 configs dark):
    BENCH_BUDGET seconds (default 3300) bound the whole suite; a config
    whose per-config timeout no longer fits the remaining budget is
    SKIPPED with an explicit `[suite] skipped` line instead of the whole
    run dying mid-config. Configs are ordered so historically-unrecorded
    ones run before the long-recorded 2M/4M ones. Subprocesses keep each
    config's HBM footprint and axon tunnel session isolated and share the
    in-repo persistent jit cache; the parent never initializes a backend.
    """
    import subprocess

    budget = float(os.environ.get("BENCH_BUDGET", 3300))
    t_start = time.time()
    headline = {}

    def run_one(tag, env_over, to_stdout=False, timeout=900, min_need=180):
        remaining = budget - (time.time() - t_start)
        if remaining < min_need:
            print(f"[suite] skipped {tag}: {remaining:.0f}s left of "
                  f"{budget:.0f}s budget", file=sys.stderr, flush=True)
            return
        timeout = min(timeout, remaining)
        env = dict(os.environ)
        env.update(env_over)
        env["BENCH_SUITE"] = "0"
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=timeout,
            )
            got = False
            for line in p.stdout.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    d = json.loads(line)
                    d["config"] = tag
                    if to_stdout:
                        headline.update(d)
                    print(json.dumps(d),
                          file=sys.stdout if to_stdout else sys.stderr,
                          flush=True)
                    got = True
            for line in p.stderr.splitlines()[-2:]:
                print(f"[{tag}] {line}", file=sys.stderr, flush=True)
            if p.returncode != 0 or not got:
                print(f"[suite] {tag} rc={p.returncode}: {p.stderr[-400:]}",
                      file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001 — a failed config must not kill the suite
            print(f"[suite] {tag} error: {e}", file=sys.stderr, flush=True)

    run_one("sync_1M_uniform", {"BENCH_MODE": "sync"}, to_stdout=True)
    run_one("sync_1M_plummer_adaptive",
            {"BENCH_MODE": "sync", "BENCH_DIST": "plummer",
             "BENCH_H": "adaptive"})
    run_one("sph_density_1M", {"BENCH_MODE": "sync", "BENCH_OP": "density"})
    run_one("sync_1M_gauss", {"BENCH_MODE": "sync", "BENCH_DIST": "gauss"})
    run_one("octree_build_64M",
            {"BENCH_MODE": "tree", "BENCH_N": "64000000"},
            timeout=1500, min_need=300)
    run_one("octree_build_2M", {"BENCH_MODE": "tree", "BENCH_N": "2000000"})
    run_one("sync_4M_uniform", {"BENCH_MODE": "sync", "BENCH_N": "4000000"})
    if headline:
        # last stdout line = the parsed metric, whatever ran in between
        print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    # Default = the BASELINE suite around the honest headline: the FULL
    # Domain.sync pipeline (global box/tree/assignment/focus/halos,
    # warm-started, with per-step particle drift) + fixed-radius neighbor
    # counts at 1M on stdout, plus the scale configs (2M/64M octree
    # rebuild, 4M sync, clustered sync) tagged on stderr. BENCH_MODE=fn
    # measures the tree-build + neighbor-search slice alone (octree.cpp +
    # neighbor_driver.cu analog); BENCH_SUITE=0 runs just one config.
    _mode = os.environ.get("BENCH_MODE", "sync")
    _suite = os.environ.get("BENCH_SUITE", "1") == "1"
    if _suite and _mode == "sync" and "BENCH_N" not in os.environ:
        main_suite()
    elif _mode == "fn":
        main()
    elif _mode == "tree":
        main_tree()
    else:
        main_sync()
