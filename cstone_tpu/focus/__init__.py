"""Locally-essential (focused) octree: rebalance ops, source centers,
combined updates, and the distributed focus-tree state machine."""

from .source_center import (
    combine_source_centers,
    compute_leaf_source_centers,
    geo_mac_spheres,
    set_mac_radii,
    upsweep_centers,
)
