"""Linked internal octree tests vs reference goldens
(mirrors test/unit/tree/octree.cpp)."""

import jax.numpy as jnp
import numpy as np

from cstone_tpu.tree.octree import (
    build_linked_octree,
    containing_node,
    locate_node,
    upsweep_sum,
)


def _pad_leaves(cstree: np.ndarray, cap_leaf: int):
    end = cstree[-1]
    out = np.full(cap_leaf + 1, end, dtype=cstree.dtype)
    out[: len(cstree)] = cstree
    return jnp.asarray(out), jnp.int32(len(cstree) - 1)


def _build(golden):
    cstree = golden["linked32_cstree"]
    leaves, n_leaf = _pad_leaves(cstree, 4096)
    return build_linked_octree(leaves, n_leaf), cstree


def test_linked_build_golden(golden):
    tree, cstree = _build(golden)
    n_nodes = int(tree.n_nodes)
    assert n_nodes == len(golden["linked32_prefixes"])

    np.testing.assert_array_equal(
        np.asarray(tree.prefixes[:n_nodes]), golden["linked32_prefixes"]
    )
    np.testing.assert_array_equal(
        np.asarray(tree.child_offsets[:n_nodes]).astype(np.uint32),
        golden["linked32_child_offsets"],
    )
    np.testing.assert_array_equal(
        np.asarray(tree.level_range).astype(np.uint32), golden["linked32_level_range"]
    )
    np.testing.assert_array_equal(
        np.asarray(tree.internal_to_leaf[:n_nodes]).astype(np.uint32),
        golden["linked32_internal_to_leaf"],
    )
    n_parents = len(golden["linked32_parents"])
    np.testing.assert_array_equal(
        np.asarray(tree.parents[:n_parents]).astype(np.uint32), golden["linked32_parents"]
    )
    n_leaf = int(tree.n_leaf)
    np.testing.assert_array_equal(
        np.asarray(tree.leaf_order()[:n_leaf]).astype(np.uint32),
        golden["linked32_leaf_order"],
    )


def test_upsweep_counts_golden(golden):
    tree, _ = _build(golden)
    counts = jnp.asarray(
        np.pad(
            golden["linked32_counts"].astype(np.uint32),
            (0, 4096 - len(golden["linked32_counts"])),
        )
    )
    node_counts = upsweep_sum(tree, counts, saturate_u32=True)
    n = int(tree.n_nodes)
    np.testing.assert_array_equal(
        np.asarray(node_counts[:n]), golden["linked32_node_counts"].astype(np.uint32)
    )
    # root holds the total
    assert int(node_counts[0]) == int(golden["linked32_counts"].astype(np.uint64).sum())


def test_locate_and_containing(golden):
    tree, _ = _build(golden)
    n = int(tree.n_nodes)
    # locating every node's own prefix returns its index
    some = np.asarray([0, 1, 5, n // 2, n - 1], dtype=np.int64)
    keys = jnp.asarray(golden["linked32_prefixes"][some])
    np.testing.assert_array_equal(np.asarray(locate_node(tree, keys)), some)
    # a key not in the tree -> n_nodes
    missing = jnp.asarray([np.uint32(1 << 30)])  # level-10 prefix unlikely present
    res = containing_node(tree, keys)
    np.testing.assert_array_equal(np.asarray(res), some)
