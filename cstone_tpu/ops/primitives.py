"""Parallel primitive wrappers tuned for TPU/XLA lowering.

Replacements for the reference's primitives_gpu.cu catalog (reference:
include/cstone/primitives/primitives_gpu.h:39-126) in terms of XLA ops:
sort/sort-by-key lower to the TPU sort HLO, scans to reduce-window, and
batched lower_bound to a sort-based merge (jnp.searchsorted's scan-based
default blows scoped VMEM for multi-million-element inputs on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "searchsorted",
    "sort_by_key",
    "exclusive_scan",
    "cumsum64",
    "segment_max",
    "segment_ids_from_offsets",
]

_SORT_METHOD_THRESHOLD = 1 << 16


def searchsorted(a: jax.Array, v: jax.Array, side: str = "left") -> jax.Array:
    """lower/upper_bound of v in sorted a, TPU-friendly.

    Uses the sort-based merge when the combined size is large (one sort HLO
    instead of a log(n) gather scan), matching lowerBoundGpu's role
    (primitives_gpu.h:61-75).
    """
    if a.size + v.size >= _SORT_METHOD_THRESHOLD and v.ndim == a.ndim == 1:
        return jnp.searchsorted(a, v, side=side, method="sort").astype(jnp.int32)
    return jnp.searchsorted(a, v, side=side).astype(jnp.int32)


def sort_by_key(keys: jax.Array, *values: jax.Array, is_stable: bool = True):
    """Key-value sort via the variadic sort HLO (gather-free on TPU)."""
    out = jax.lax.sort((keys,) + values, num_keys=1, is_stable=is_stable)
    return out[0], out[1:]


def exclusive_scan(x: jax.Array, axis: int = -1) -> jax.Array:
    """Exclusive prefix sum along axis."""
    inc = jnp.cumsum(x, axis=axis)
    return inc - x


def cumsum64(x: jax.Array) -> jax.Array:
    """Inclusive prefix sum of a 1-D 64-bit integer array, TPU-safe.

    XLA lowers 64-bit `cumsum` to a hierarchical u32-pair reduce-window
    whose stage-2 scoped-vmem allocation can exceed the 16MB limit (seen
    inside lax.scan bodies). The work-efficient associative_scan builds
    the same prefix from log2(n) elementwise adds + slices, which lower
    to plain u32-pair vector arithmetic."""
    return jax.lax.associative_scan(jnp.add, x)


def segment_ids_from_offsets(
    offsets: jax.Array, n: int, num_segments: int
) -> jax.Array:
    """(n,) segment id per element from (num_segments+1,) offsets.

    Equivalent to searchsorted(offsets[1:], arange(n), side='right') but
    built from one small scatter-add plus one cumsum: the binary-search
    form gathers n indices log2(num_segments) times, which costs ~18ns per
    index on TPU (~130ms at n=1M) versus ~5ms for this formulation.
    Offsets clipped/out-of-range count as n (dropped).
    """
    offs = offsets[1:].astype(jnp.int32)
    hist = jnp.zeros((n + 1,), jnp.int32).at[offs].add(1, mode="drop")
    seg = jnp.cumsum(hist[:n], dtype=jnp.int32)
    return jnp.minimum(seg, num_segments - 1)


def segment_max(values: jax.Array, segment_offsets: jax.Array, num_segments: int) -> jax.Array:
    """Max over contiguous segments given by offsets (primitives_gpu.h:77-84).

    segment_offsets: (num_segments+1,) offsets into values; empty segments
    return 0.
    """
    n = values.shape[0]
    seg_id = segment_ids_from_offsets(segment_offsets, n, num_segments)
    return jax.ops.segment_max(
        values, seg_id, num_segments=num_segments, indices_are_sorted=True
    )
