"""Native host library vs JAX implementations (cross-check pattern like the
reference's GPU-vs-CPU tests, SURVEY.md section 4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cstone_tpu import native
from cstone_tpu.sfc import compute_sfc_keys, make_box
from cstone_tpu.tree import compute_octree

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library failed to build"
)


def test_native_hilbert_matches_jax():
    rng = np.random.RandomState(8)
    pos = rng.uniform(-1, 1, size=(5000, 3)).astype(np.float32)
    box = make_box(-1.0, 1.0)
    lims = np.asarray(box.limits, dtype=np.float32)

    for dt in (np.uint32, np.uint64):
        host = native.hilbert_encode(pos[:, 0], pos[:, 1], pos[:, 2], lims, dt)
        dev = compute_sfc_keys(
            jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]), jnp.asarray(pos[:, 2]),
            box, jnp.uint32 if dt == np.uint32 else jnp.uint64,
        )
        np.testing.assert_array_equal(host, np.asarray(dev))


def test_native_octree_matches_jax():
    rng = np.random.RandomState(9)
    keys = np.sort(
        rng.randint(0, 1 << 62, size=30000, dtype=np.uint64) % (np.uint64(1) << np.uint64(63))
    )
    host_tree, host_counts = native.compute_octree_host(keys, 32)
    dev = compute_octree(jnp.asarray(keys), 32)
    n = int(dev.n_nodes)
    np.testing.assert_array_equal(host_tree, np.asarray(dev.keys[: n + 1]))
    np.testing.assert_array_equal(host_counts, np.asarray(dev.counts[:n]))
