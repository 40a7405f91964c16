"""SFC-grid cover candidate generation vs the O(n^2) oracle.

The cover (traversal/cover.py) replaces the per-group tree walk of the
neighbor pipeline; these tests assert that streaming its runs reproduces
exact findNeighbors counts (reference semantics: findneighbors.hpp:96-165)
for uniform and clustered data, periodic and open boundaries, and that the
runs are disjoint (no particle double-counted).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cstone_tpu.sfc import PERIODIC, compute_sfc_keys, make_box
from cstone_tpu.traversal.cover import build_cell_table, group_cover_runs

RUN_CAP = 96


def _setup(seed, n, hmin, hmax, periodic, cluster=True):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    if cluster:
        nc = n // 4
        pos[:nc] = 0.5 + 0.02 * rng.randn(nc, 3).astype(np.float32)
        pos = np.clip(pos, 0, 0.999999)
    h = rng.uniform(hmin, hmax, n).astype(np.float32)
    box = make_box(0.0, 1.0, boundaries=PERIODIC if periodic else 0)
    keys = np.asarray(
        compute_sfc_keys(
            jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]), jnp.asarray(pos[:, 2]),
            box, jnp.uint64,
        )
    )
    order = np.argsort(keys, kind="stable")
    return pos[order], h[order], jnp.asarray(keys[order]), box


def _cover_counts(pos_s, h_s, keys_s, box, G, Lt, periodic):
    n = pos_s.shape[0]
    n_groups = -(-n // G)
    pad = n_groups * G - n
    p = lambda a: np.concatenate([a, np.zeros(pad, a.dtype)]) if pad else a
    P3 = np.stack([p(pos_s[:, 0]), p(pos_s[:, 1]), p(pos_s[:, 2])], -1).reshape(
        n_groups, G, 3
    )
    gvalid = (np.arange(n_groups * G) < n).reshape(n_groups, G)
    big = np.float32(1e30)
    gmin = np.where(gvalid[..., None], P3, big).min(1)
    gmax = np.where(gvalid[..., None], P3, -big).max(1)
    gh = p(h_s).reshape(n_groups, G)
    grad = 2.0 * np.where(gvalid, gh, 0).max(1)

    table = build_cell_table(keys_s, Lt)
    rs, rl, nr, ovf = group_cover_runs(
        jnp.asarray(gmin), jnp.asarray(gmax), jnp.asarray(grad),
        table, Lt, box, jnp.uint64, run_cap=RUN_CAP,
    )
    assert not bool(ovf)
    rs, rl = np.asarray(rs), np.asarray(rl)

    L = np.array([1.0, 1.0, 1.0])
    counts = np.zeros(n, np.int64)
    for g in range(n_groups):
        idx = []
        for r in range(RUN_CAP):
            if rl[g, r] > 0:
                idx.extend(range(rs[g, r], min(rs[g, r] + rl[g, r], n)))
        assert len(idx) == len(set(idx)), "overlapping runs"
        idx = np.asarray(idx, np.int64)
        for k in range(min(G, n - g * G)):
            i = g * G + k
            d = pos_s[idx].astype(np.float64) - pos_s[i].astype(np.float64)
            if periodic:
                d -= L * np.rint(d / L)
            d2 = (d * d).sum(-1)
            counts[i] = int(((d2 < (2.0 * float(h_s[i])) ** 2) & (idx != i)).sum())
    return counts


@pytest.mark.parametrize("periodic", [True, False])
def test_cover_counts_match_oracle(periodic):
    pos_s, h_s, keys_s, box = _setup(1, 1500, 0.02, 0.09, periodic)
    counts = _cover_counts(pos_s, h_s, keys_s, box, G=32, Lt=6, periodic=periodic)

    L = np.array([1.0, 1.0, 1.0])
    X = pos_s.astype(np.float64)
    d = X[:, None, :] - X[None, :, :]
    if periodic:
        d -= L * np.rint(d / L)
    d2 = (d * d).sum(-1)
    np.fill_diagonal(d2, np.inf)
    expect = (d2 < (2.0 * h_s.astype(np.float64)[:, None]) ** 2).sum(1)
    np.testing.assert_array_equal(counts, expect)


def test_cover_table_levels_consistent():
    """Coarser/finer tables cover the same neighbor sets."""
    pos_s, h_s, keys_s, box = _setup(4, 800, 0.03, 0.12, True)
    c5 = _cover_counts(pos_s, h_s, keys_s, box, G=16, Lt=5, periodic=True)
    c7 = _cover_counts(pos_s, h_s, keys_s, box, G=16, Lt=7, periodic=True)
    np.testing.assert_array_equal(c5, c7)
