"""Binary radix tree + continuum tree + key injection tests
(mirror test/unit/tree/{btree,continuum}.cpp)."""

import jax.numpy as jnp
import numpy as np

from cstone_tpu.focus.inject import inject_keys
from cstone_tpu.sfc import make_box
from cstone_tpu.tree.btree import build_binary_tree
from cstone_tpu.tree.continuum import compute_continuum_csarray


def test_binary_tree_structure():
    # example keys from btree.hpp documentation: sorted unique morton keys
    rng = np.random.RandomState(4)
    keys = np.unique(rng.randint(0, 1 << 30, size=64, dtype=np.uint32))
    n = len(keys)
    cap = 128
    padded = np.full(cap, np.uint32(0xFFFFFFFF))
    padded[:n] = keys

    bt = build_binary_tree(jnp.asarray(padded), jnp.int32(n))
    n_int = int(bt.n_internal)
    assert n_int == n - 1

    left = np.asarray(bt.left)[:n_int]
    right = np.asarray(bt.right)[:n_int]

    # every leaf (encoded as child >= n_internal) appears exactly once
    children = np.concatenate([left, right])
    leaves = children[children >= n_int] - n_int
    assert sorted(leaves.tolist()) == list(range(n))
    # every internal node except the root appears exactly once as a child
    internals = children[children < n_int]
    assert sorted(internals.tolist()) == [i for i in range(n_int) if i != 0]


def test_continuum_tree_uniform():
    """Uniform concentration -> tree equivalent to a uniform key build."""
    box = make_box(0.0, 1.0)

    def conc(x, y, z):
        return jnp.full_like(x, 32000.0)  # ~32k particles in unit box

    tree = compute_continuum_csarray(conc, box, bucket_size=64,
                                     capacity=4096, key_dtype=jnp.uint32)
    n = int(tree.n_nodes)
    keys = np.asarray(tree.keys[: n + 1]).astype(np.uint64)
    counts = np.asarray(tree.counts[:n])
    assert keys[0] == 0 and keys[-1] == 1 << 30
    d = np.diff(keys)
    assert ((d & (d - 1)) == 0).all()
    # uniform density: all leaves at the same level -> equal spans
    assert len(np.unique(d)) == 1
    assert counts.max() <= 64 * 8  # close to bucket after convergence


def test_inject_keys():
    end = np.uint32(1 << 30)
    cap = 128
    leaves = np.full(cap + 1, end, dtype=np.uint32)
    leaves[0] = 0
    n_leaf = 1  # root only
    mandatory = jnp.asarray([np.uint32(0o1234 << 18)])

    new_leaves, new_n = inject_keys(jnp.asarray(leaves), jnp.int32(n_leaf), mandatory)
    n = int(new_n)
    out = np.asarray(new_leaves[: n + 1]).astype(np.uint64)
    assert out[0] == 0 and out[-1] == 1 << 30
    d = np.diff(out)
    assert (d > 0).all() and ((d & (d - 1)) == 0).all()
    assert (0o1234 << 18) in out.tolist()


def test_focus_update_injects_on_failed_resolution():
    """A mandatory key several levels below its containing leaf makes
    enforce_keys report FAILED (it can only split one level per round);
    focus_update_once must then splice the full spanning cover so the key
    is a node boundary after ONE update (octree_focus.hpp:83-215 forced
    injection + inject.hpp:52-111)."""
    from cstone_tpu.focus.octree_focus import focus_update_once
    from cstone_tpu.tree.octree import build_linked_octree

    end = np.uint64(1) << np.uint64(63)
    cap = 256
    leaves = np.full(cap + 1, end, dtype=np.uint64)
    leaves[0] = 0
    linked = build_linked_octree(jnp.asarray(leaves), jnp.int32(1))

    # a level-6 key: 6 > 1 level below the root leaf -> FAILED resolution
    key = np.uint64(0o1234561) << np.uint64(63 - 21)
    mandatory = jnp.asarray([key], dtype=jnp.uint64)

    cap_nodes = linked.prefixes.shape[0]
    zero_counts = jnp.zeros((cap_nodes,), jnp.uint32)  # no count splits
    zero_macs = jnp.zeros((cap_nodes,), jnp.int32)  # no MAC splits

    new_leaves, new_n, converged = focus_update_once(
        linked, zero_counts, zero_macs,
        jnp.uint64(0), jnp.uint64(0),  # empty focus range
        mandatory, bucket_size_focus=64,
    )
    n = int(new_n)
    out = np.asarray(new_leaves[: n + 1]).astype(np.uint64)
    assert int(key) in out.tolist()
    assert out[0] == 0 and out[-1] == int(end)
    d = np.diff(out)
    assert (d > 0).all()
    # every span is a power of 8 (valid cornerstone tree)
    lv = np.log2(d.astype(np.float64))
    assert np.allclose(lv % 3, 0)
