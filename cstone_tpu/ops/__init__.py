"""Low-level parallel primitives: bit ops, scans, sorts, segment reductions."""

from .bits import bit_width, count_leading_zeros, count_trailing_zeros
