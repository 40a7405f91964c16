"""Domain decomposition, particle exchange, and the top-level Domain API."""

from .layout import compute_node_layout, leaf_layout_from_counts
