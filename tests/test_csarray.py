"""Cornerstone tree-build tests vs reference goldens + invariants
(mirrors test/unit/tree/csarray.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cstone_tpu.sfc import max_tree_level
from cstone_tpu.tree import (
    compute_node_counts,
    compute_octree,
    compute_spanning_tree,
    rebalance_decision,
    rebalance_tree,
)


def check_invariants(tree: np.ndarray, key_dtype):
    """checkOctreeInvariants analog (reference test/unit cs_util.hpp:59-77)."""
    lmax = 10 if key_dtype == np.uint32 else 21
    end = np.uint64(1) << np.uint64(3 * lmax)
    assert tree[0] == 0
    assert tree[-1] == key_dtype(end)
    assert (np.diff(tree.astype(np.uint64)) > 0).all(), "not strictly sorted"
    d = np.diff(tree.astype(np.uint64))
    # powers of 8: single bit set at a multiple-of-3 position
    assert ((d & (d - 1)) == 0).all()
    ctz = np.array([int(x).bit_length() - 1 for x in d])
    assert (ctz % 3 == 0).all()


def _build_and_check(golden, suffix, bucket, np_dtype):
    codes = jnp.asarray(golden[f"octree{suffix}_keys_in"])
    tree = compute_octree(codes, bucket)
    n = int(tree.n_nodes)
    keys = np.asarray(tree.keys[: n + 1])
    counts = np.asarray(tree.counts[:n])
    expect_tree = golden[f"octree{suffix}_tree"]
    expect_counts = golden[f"octree{suffix}_counts"].astype(np.uint32)
    check_invariants(keys, np_dtype)
    np.testing.assert_array_equal(keys, expect_tree)
    np.testing.assert_array_equal(counts, expect_counts)
    assert counts.sum() == codes.shape[0]


def test_octree32_golden(golden):
    _build_and_check(golden, "32", 64, np.uint32)


def test_octree64_golden(golden):
    _build_and_check(golden, "64", 16, np.uint64)


def test_node_counts_exact():
    # handcrafted: uniform level-1 tree, keys in specific octants
    lmax = 10
    nr1 = np.uint32(1 << 27)
    tree = jnp.asarray(np.arange(9, dtype=np.uint32) * nr1)
    codes = jnp.asarray(np.sort(np.array([0, 1, 5, nr1, nr1 + 3, 7 * nr1], dtype=np.uint32)))
    counts = compute_node_counts(tree, codes)
    np.testing.assert_array_equal(np.asarray(counts), [3, 2, 0, 0, 0, 0, 0, 1])


def test_rebalance_merge():
    # 8 sibling leaves with tiny counts -> merge to root
    nr1 = np.uint32(1 << 27)
    keys = jnp.asarray(np.concatenate([np.arange(9, dtype=np.uint32) * nr1]))
    counts = jnp.asarray(np.ones(8, dtype=np.uint32))
    ops, converged = rebalance_decision(keys, counts, jnp.int32(8), 64)
    np.testing.assert_array_equal(np.asarray(ops), [1, 0, 0, 0, 0, 0, 0, 0])
    assert not bool(converged)
    new_keys, new_n = rebalance_tree(keys, ops, jnp.int32(8))
    assert int(new_n) == 1
    assert int(new_keys[0]) == 0 and int(new_keys[1]) == 1 << 30


def test_rebalance_split():
    # root with too many particles -> split into 8 (or more)
    end = np.uint32(1 << 30)
    keys = jnp.asarray(np.concatenate([[0], np.full(16, end)]).astype(np.uint32))
    counts = jnp.asarray(np.concatenate([[100], np.zeros(15)]).astype(np.uint32))
    ops, converged = rebalance_decision(keys, counts, jnp.int32(1), 64)
    assert int(ops[0]) == 8
    # count/bucket > 64 triggers a two-level (64-way) split (csarray.hpp:303-306)
    ops512, _ = rebalance_decision(keys, counts, jnp.int32(1), 1)
    assert int(ops512[0]) == 512
    new_keys, new_n = rebalance_tree(keys, ops, jnp.int32(1))
    assert int(new_n) == 8
    step = 1 << 27
    np.testing.assert_array_equal(
        np.asarray(new_keys[:9]), np.arange(9, dtype=np.uint32) * np.uint32(step)
    )


def test_spanning_tree_golden(golden):
    splits = jnp.asarray(golden["spanning_splits"])
    expect = golden["spanning_tree"]
    keys, n = compute_spanning_tree(splits, jnp.int32(splits.shape[0] - 1), 2048)
    n = int(n)
    np.testing.assert_array_equal(np.asarray(keys[: n + 1]), expect)
    check_invariants(np.asarray(keys[: n + 1]), np.uint64)
