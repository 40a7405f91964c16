"""Tree walks: generic traversal, overlap math, neighbor search, halo
collision detection, MAC evaluation, peer discovery."""

from .boxoverlap import (
    contained_in_keys,
    inside_box,
    make_halo_box,
    min_distance_boxes,
    min_distance_point_box,
    overlap_iboxes,
    overlap_ranges_pbc,
)
from .geometry import leaf_geometry, node_geometry
from .neighbors import OctreeNsView, find_neighbors, make_ns_view
from .traversal import batched_collect_leaves
