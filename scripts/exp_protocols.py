"""Multi-rank protocol cost table + high-rank dryrun smoke (VERDICT r4 #6).

Measures warm wall-time per full Domain.sync on the 8-device virtual CPU
mesh for the three exchange protocols (dense all_to_all, ragged
all_to_all emulation, all_gather pool) at 64k and 256k global particles,
and smoke-runs dryrun_multichip at 16 and 32 virtual ranks in
subprocesses (device count must be fixed before jax initializes).

CPU-mesh caveat: these are RELATIVE protocol costs (collective counts and
buffer sizes), not TPU absolute numbers — the native ragged HLO is
emulated densely on CPU (parallel/ragged.py), so ragged's advantage here
understates its TPU value at high rank counts.

Run: timeout 1800 python scripts/exp_protocols.py
"""

import os
import subprocess
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from cstone_tpu.domain.domain import Domain
from cstone_tpu.parallel import make_mesh, rank_axis
from cstone_tpu.sfc import PERIODIC, make_box

R = 8


def time_protocol(n_per, exchange_mode, protocol,
                  reps=int(os.environ.get("PROT_REPS", 2))):
    n = R * n_per
    # generous capacities: the first sync from the uniform warm-start tree
    # can assign far more than n/R to a rank before the boundaries
    # converge (measured 236k owned+halo at n_per=32k), and this script
    # measures protocol cost, not memory sizing
    cap = 8 * n_per + 512
    rng = np.random.RandomState(42)
    pos = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    h = np.full(n, 0.6 * (1.0 / n) ** (1 / 3), np.float32)
    box = make_box(0.0, 1.0, boundaries=PERIODIC)
    mesh = make_mesh(R)
    sharding = NamedSharding(mesh, P(rank_axis))

    def pad_local(a):
        out = np.zeros((R, cap), dtype=a.dtype)
        out[:, :n_per] = a.reshape(R, n_per)
        return jax.device_put(jnp.asarray(out.reshape(-1)), sharding)

    kw = dict(treelet_cap=32768, halo_req_cap=32768, halo_cap=8 * n_per) \
        if protocol == "ragged" else dict(
            treelet_cap=8192, halo_req_cap=8192, halo_cap=2 * n_per,
            move_cap=2 * n_per)

    def make_domain(rank):
        return Domain(
            rank=rank, n_ranks=R, bucket_size=64, bucket_size_focus=64,
            key_dtype=jnp.uint64, tree_capacity=65536, focus_capacity=65536,
            axis_name=rank_axis, exchange_mode=exchange_mode,
            protocol=protocol if exchange_mode == "p2p" else None,
            local_capacity=cap, **(kw if exchange_mode == "p2p" else {}),
        )

    def step(packed, x, y, z, hh, n_local):
        dstate = jax.tree.map(lambda a: a[0], packed)
        rank = jax.lax.axis_index(rank_axis)
        domain = make_domain(rank)
        dstate, res = domain.sync(dstate, x, y, z, hh, n_local=n_local[0])
        ovf = jax.lax.pmax(res.overflow, rank_axis)
        det = res.overflow_detail  # already pmax'd across ranks
        co = domain.compact_owned
        chk = jax.lax.psum(jnp.sum(res.x), rank_axis)
        return (
            jax.tree.map(lambda a: a[None], dstate),
            co(res, res.x), co(res, res.y), co(res, res.z), co(res, res.h),
            (res.end_index - res.start_index).reshape(1), ovf, chk, det,
        )

    dstate0 = make_domain(0).init_state(box=box, boundaries=box.boundaries)
    packed0 = jax.tree.map(
        lambda a: jax.device_put(
            jnp.broadcast_to(a[None], (R,) + a.shape), sharding),
        dstate0,
    )
    state_specs = jax.tree.map(lambda _: P(rank_axis), packed0)
    fn = jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(state_specs,) + (P(rank_axis),) * 5,
        out_specs=(state_specs,) + (P(rank_axis),) * 5 + (P(), P(), P()),
        check_vma=False,
    ))
    arrays = [pad_local(pos[:, 0]), pad_local(pos[:, 1]),
              pad_local(pos[:, 2]), pad_local(h)]
    n_local = jax.device_put(jnp.full((R,), n_per, jnp.int32), sharding)

    packed = packed0
    # 2 warmup syncs (compile + reach steady state)
    for _ in range(2):
        packed, x, y, z, hh, n_local, ovf, chk, det = fn(packed, *arrays, n_local)
        arrays = [x, y, z, hh]
        assert int(np.asarray(ovf)) == 0, (
            f"{exchange_mode}/{protocol} overflow detail="
            f"{np.asarray(det).tolist()} (local,tree,focus,move,treelet,"
            f"halo,window)")
    ts = []
    for _ in range(reps):
        t0 = time.time()
        packed, x, y, z, hh, n_local, ovf, chk, det = fn(packed, *arrays, n_local)
        arrays = [x, y, z, hh]
        float(np.asarray(chk))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    rows = []
    for n_per in (8192, 32768):
        for mode, proto in (("p2p", "dense"), ("p2p", "ragged"),
                            ("pool", None)):
            t = time_protocol(n_per, mode, proto)
            tag = proto or "pool"
            rows.append((R * n_per, tag, t * 1e3))
            print(f"n={R*n_per:7d} protocol={tag:7s} warm_sync={t*1e3:8.1f}ms",
                  flush=True)
    print("\n| global n | protocol | warm sync (ms, 8-dev CPU mesh) |")
    print("|---|---|---|")
    for n, tag, ms in rows:
        print(f"| {n} | {tag} | {ms:.1f} |")

    # high-rank dryrun smoke (separate processes: device count is fixed at
    # jax init)
    for ndev in (16, 32):
        env = dict(os.environ)
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"
        env["JAX_PLATFORMS"] = "cpu"
        code = (f"import __graft_entry__ as g; g.dryrun_multichip({ndev}); "
                f"print('dryrun_multichip({ndev}) ok')")
        p = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True,
            text=True, timeout=1200,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        tail = (p.stdout + p.stderr).strip().splitlines()
        print(f"[dryrun {ndev}] rc={p.returncode} "
              f"{tail[-1] if tail else ''}", flush=True)
        assert p.returncode == 0, p.stderr[-800:]


if __name__ == "__main__":
    main()
