"""Checkpoint round-trip + timer tests."""

import jax.numpy as jnp
import numpy as np

from cstone_tpu.domain.domain import Domain
from cstone_tpu.utils import Timer, load_checkpoint, save_checkpoint


def test_checkpoint_roundtrip(tmp_path):
    domain = Domain(rank=0, n_ranks=1, bucket_size=16, key_dtype=jnp.uint64,
                    tree_capacity=256)
    state = domain.init_state()
    p = tmp_path / "ckpt"
    save_checkpoint(p, state)
    restored = load_checkpoint(p, state)
    np.testing.assert_array_equal(
        np.asarray(restored.global_tree.keys), np.asarray(state.global_tree.keys)
    )
    np.testing.assert_array_equal(
        np.asarray(restored.box.limits), np.asarray(state.box.limits)
    )
    assert restored.box.boundaries == state.box.boundaries


def test_timer():
    t = Timer()
    out = t.stage("add", lambda a: a + 1, jnp.arange(10))
    assert "add" in t.times and t.times["add"] >= 0
    assert "total" in t.report()
