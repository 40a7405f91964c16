"""Halo state machine: discover -> compute_layout -> exchange."""

from .halos import Halos
