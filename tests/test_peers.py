"""Peer discovery tests: mutuality + surface coverage
(mirrors test/unit/traversal/peers.cpp)."""

import jax.numpy as jnp
import numpy as np

from cstone_tpu.domain.decomposition import SfcAssignment, make_sfc_assignment
from cstone_tpu.sfc import make_box, compute_sfc_keys
from cstone_tpu.traversal.macs import inv_theta_min_mac
from cstone_tpu.traversal.peers import find_peers_mac
from cstone_tpu.tree import compute_octree
from cstone_tpu.tree.octree import build_linked_octree


def _setup(n=20000, n_ranks=8, bucket=64, seed=42):
    rng = np.random.RandomState(seed)
    pos = rng.normal(0, 0.3, size=(n, 3)).clip(-0.99, 0.99).astype(np.float32)
    box = make_box(-1.0, 1.0)
    keys = compute_sfc_keys(
        jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]), jnp.asarray(pos[:, 2]),
        box, jnp.uint32,
    )
    keys = jnp.sort(keys)
    tree = compute_octree(keys, bucket_size=bucket, capacity=4096)
    linked = build_linked_octree(tree.keys, tree.n_nodes)
    assignment = make_sfc_assignment(tree.keys, tree.counts, tree.n_nodes, n_ranks)
    return linked, assignment, box


def test_peers_mutuality_and_neighbors():
    n_ranks = 8
    linked, assignment, box = _setup(n_ranks=n_ranks)
    inv_theta = inv_theta_min_mac(0.5)

    masks = np.stack(
        [
            np.asarray(find_peers_mac(r, assignment, linked, box, inv_theta))
            for r in range(n_ranks)
        ]
    )
    # no self-peering
    assert (np.diag(masks) == 0).all()
    # mutuality: A sees B <=> B sees A (peers.hpp:56-58)
    np.testing.assert_array_equal(masks, masks.T)
    # SFC-adjacent ranks share a surface -> must be peers
    for r in range(n_ranks - 1):
        assert masks[r, r + 1] == 1, f"ranks {r},{r+1} not peers"


def test_peers_dual_matches_stt():
    """Dual-traversal peers must equal the single-traversal form for every
    rank — the reference validates exactly this equivalence
    (peers.hpp:63-171, test/unit/traversal/peers.cpp)."""
    from cstone_tpu.traversal.peers import find_peers_mac_dual

    n_ranks = 8
    linked, assignment, box = _setup(n_ranks=n_ranks)
    inv_theta = inv_theta_min_mac(0.5)

    for r in range(n_ranks):
        stt = np.asarray(find_peers_mac(r, assignment, linked, box, inv_theta))
        dual, ovf = find_peers_mac_dual(
            r, assignment, linked, box, inv_theta, pair_cap=131072
        )
        assert int(ovf) == 0
        np.testing.assert_array_equal(np.asarray(dual), stt)
