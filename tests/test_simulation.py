"""Multi-step simulation loop: repeated Domain.sync + reapply_sync +
neighbor forces + leapfrog, conserving energy and momentum; plus
checkpoint/restore determinism (the reference's client loop,
README.md:60-100, driven end to end)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from cstone_tpu.domain.domain import Domain
from cstone_tpu.models.simulation import SimState, sim_init, sim_step
from cstone_tpu.parallel import make_mesh, rank_axis
from cstone_tpu.sfc import PERIODIC, make_box


def _setup(n, seed=7):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    h = np.full(n, 0.03, dtype=np.float32)
    vel = rng.normal(0.0, 0.05, size=(n, 3)).astype(np.float32)
    vel -= vel.mean(axis=0, keepdims=True)  # zero net momentum
    return pos, h, vel


def test_simulation_conserves_energy_and_momentum():
    n = 1200
    pos, h, vel = _setup(n)
    box = make_box(0.0, 1.0, boundaries=PERIODIC)
    domain = Domain(
        rank=0, n_ranks=1, bucket_size=16, key_dtype=jnp.uint64,
        tree_capacity=1024,
    )
    dstate = domain.init_state(box=box, boundaries=box.boundaries)
    state = sim_init(
        dstate, jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]),
        jnp.asarray(pos[:, 2]), jnp.asarray(h), jnp.asarray(vel[:, 0]),
        jnp.asarray(vel[:, 1]), jnp.asarray(vel[:, 2]), n,
    )

    dt = 2e-3
    step = jax.jit(lambda s: sim_step(domain, s, dt))

    energies, moms = [], []
    for i in range(60):
        state, e, p, ovf = step(state)
        assert int(ovf) == 0, f"overflow at step {i}"
        energies.append(float(e))
        moms.append(np.asarray(p))

    e0 = energies[1]  # step 0 samples pre-interaction energy
    drift = max(abs(e - e0) for e in energies[1:]) / abs(e0)
    assert drift < 2e-2, f"energy drift {drift}"
    # momentum conserved to float rounding
    p_scale = np.abs(vel).sum()
    for p in moms:
        assert np.abs(p).max() < 1e-4 * p_scale


def test_simulation_checkpoint_restore_deterministic(tmp_path):
    from cstone_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    n = 600
    pos, h, vel = _setup(n, seed=9)
    box = make_box(0.0, 1.0, boundaries=PERIODIC)
    domain = Domain(
        rank=0, n_ranks=1, bucket_size=16, key_dtype=jnp.uint64,
        tree_capacity=1024,
    )
    dstate = domain.init_state(box=box, boundaries=box.boundaries)
    state = sim_init(
        dstate, jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]),
        jnp.asarray(pos[:, 2]), jnp.asarray(h), jnp.asarray(vel[:, 0]),
        jnp.asarray(vel[:, 1]), jnp.asarray(vel[:, 2]), n,
    )
    step = jax.jit(lambda s: sim_step(domain, s, 2e-3))

    for _ in range(10):
        state, *_ = step(state)
    save_checkpoint(str(tmp_path / "ck"), state)

    cont = state
    for _ in range(5):
        cont, *_ = step(cont)

    restored = load_checkpoint(str(tmp_path / "ck"), state)
    for _ in range(5):
        restored, *_ = step(restored)

    n_local = int(cont.n_local)
    assert int(restored.n_local) == n_local
    np.testing.assert_array_equal(
        np.asarray(cont.x[:n_local]), np.asarray(restored.x[:n_local])
    )
    np.testing.assert_array_equal(
        np.asarray(cont.vx[:n_local]), np.asarray(restored.vx[:n_local])
    )


def test_simulation_multirank_momentum():
    """12 steps on 8 virtual ranks: momentum + particle count conserved,
    no overflow — the distributed client loop end to end."""
    n_ranks, n_per = 8, 150
    n = n_ranks * n_per
    cap = 4 * n_per
    pos, h, vel = _setup(n, seed=13)
    box = make_box(0.0, 1.0, boundaries=PERIODIC)

    mesh = make_mesh(n_ranks)
    sharding = NamedSharding(mesh, P(rank_axis))

    def pad_local(a):
        out = np.zeros((n_ranks, cap), dtype=a.dtype)
        out[:, :n_per] = a.reshape(n_ranks, n_per)
        return jax.device_put(jnp.asarray(out.reshape(-1)), sharding)

    arrays = [
        pad_local(pos[:, 0]), pad_local(pos[:, 1]), pad_local(pos[:, 2]),
        pad_local(h), pad_local(vel[:, 0]), pad_local(vel[:, 1]),
        pad_local(vel[:, 2]),
    ]

    def make_step():
        def fn(x, y, z, hh, vx, vy, vz, n_local):
            rank = jax.lax.axis_index(rank_axis)
            domain = Domain(
                rank=rank, n_ranks=n_ranks, bucket_size=16,
                bucket_size_focus=8, key_dtype=jnp.uint64,
                tree_capacity=1024, focus_capacity=2048,
                axis_name=rank_axis,
            )
            dstate = domain.init_state(box=box, boundaries=box.boundaries)
            state = sim_init(dstate, x, y, z, hh, vx, vy, vz, n_local[0])
            state, e, p, ovf = sim_step(domain, state, 2e-3, group_size=16,
                                        chunk=8, cand_leaf_cap=512)
            n_tot = jax.lax.psum(state.n_local.astype(jnp.int64), rank_axis)
            return (state.x, state.y, state.z, state.h, state.vx, state.vy,
                    state.vz, state.n_local.reshape(1), e, p, ovf, n_tot)

        return jax.jit(shard_map(
            fn, mesh=mesh,
            in_specs=(P(rank_axis),) * 7 + (P(rank_axis),),
            out_specs=(P(rank_axis),) * 7 + (P(rank_axis), P(), P(), P(), P()),
            check_vma=False,
        ))

    step = make_step()
    n_local = jax.device_put(
        jnp.full((n_ranks,), n_per, jnp.int32), sharding
    )
    p_scale = np.abs(vel).sum()
    for i in range(12):
        *arrays_n, n_local, e, p, ovf, n_tot = step(*arrays, n_local)
        arrays = arrays_n
        assert int(ovf) == 0, f"overflow at step {i}"
        assert int(n_tot) == n
        assert np.abs(np.asarray(p)).max() < 1e-4 * p_scale
