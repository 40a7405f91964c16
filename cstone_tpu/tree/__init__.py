"""Cornerstone leaf-array trees and the fully-linked internal octree."""

from .csarray import (
    CsArray,
    compute_node_counts,
    compute_octree,
    compute_spanning_tree,
    find_node_above,
    find_node_below,
    rebalance_decision,
    rebalance_tree,
    root_tree,
    update_octree,
)
