"""Run-streaming Pallas kernel (v2) vs brute-force oracle, interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cstone_tpu.domain.layout import leaf_layout_from_counts
from cstone_tpu.ops.pallas_neighbors_v2 import merge_leaf_runs, pairwise_count_runs
from cstone_tpu.traversal import make_ns_view
from cstone_tpu.traversal.boxoverlap import min_distance_boxes
from cstone_tpu.traversal.traversal import batched_collect_leaves
from cstone_tpu.tree import compute_octree
from cstone_tpu.tree.octree import build_linked_octree

from test_neighbors import _setup, brute_force_counts


@pytest.mark.parametrize("periodic", [False, True])
def test_v2_counts_match_oracle(periodic):
    n = 1500
    G = 32
    W = 1024
    x, y, z, h, keys, box = _setup(n, periodic, seed=55, hval=0.05)

    tree = compute_octree(keys, bucket_size=16, capacity=2048)
    linked = build_linked_octree(tree.keys, tree.n_nodes)
    layout = leaf_layout_from_counts(tree.counts)
    view = make_ns_view(linked, layout, box)

    n_groups = -(-n // G)
    pad = n_groups * G - n
    xs = jnp.asarray(np.pad(x, (0, pad)))
    ys = jnp.asarray(np.pad(y, (0, pad)))
    zs = jnp.asarray(np.pad(z, (0, pad)))
    hs = jnp.asarray(np.pad(h, (0, pad)))
    gx = xs.reshape(n_groups, G)
    gy = ys.reshape(n_groups, G)
    gz = zs.reshape(n_groups, G)
    gh = hs.reshape(n_groups, G)
    lane = jnp.arange(G, dtype=jnp.int32)
    gvalid = (jnp.arange(n_groups, dtype=jnp.int32)[:, None] * G + lane) < n
    big = jnp.float32(1e30)
    gmin = jnp.stack([jnp.min(jnp.where(gvalid, a, big), 1) for a in (gx, gy, gz)], -1)
    gmax = jnp.stack([jnp.max(jnp.where(gvalid, a, -big), 1) for a in (gx, gy, gz)], -1)
    gc, gs_ = (gmin + gmax) * 0.5, (gmax - gmin) * 0.5
    gr = 2.0 * jnp.max(jnp.where(gvalid, gh, 0.0), 1)

    def crit(q, nid):
        d = min_distance_boxes(gc[q], gs_[q], view.centers[nid], view.sizes[nid],
                               box if periodic else None)
        return jnp.sum(d * d, -1) < gr[q] * gr[q]

    leaves_sorted, n_cand = batched_collect_leaves(
        linked.child_offsets, crit, n_groups, 512
    )
    leaf_idx = linked.internal_to_leaf[jnp.maximum(leaves_sorted, 0)]
    leaf_idx = jnp.where(leaves_sorted >= 0, leaf_idx, 0)

    run_start, run_len, n_runs, ovf = merge_leaf_runs(
        leaf_idx, n_cand, layout, run_cap=64
    )
    assert not bool(ovf)

    # pad coords to tile multiple and at least one tile
    n_pad = max(W, (n + W - 1) // W * W)
    xs_p = jnp.asarray(np.pad(x, (0, n_pad - n), constant_values=1e30))
    ys_p = jnp.asarray(np.pad(y, (0, n_pad - n), constant_values=1e30))
    zs_p = jnp.asarray(np.pad(z, (0, n_pad - n), constant_values=1e30))

    targets = jnp.stack([gx, gy, gz], axis=-1)
    r2 = jnp.where(gvalid, (2.0 * gh) ** 2, -1.0)
    box_params = jnp.concatenate(
        [box.lengths.astype(jnp.float32),
         (1.0 / box.lengths).astype(jnp.float32),
         jnp.asarray(box.periodic_mask, jnp.float32)]
    )

    # pad groups to the kernel's group_block
    GB = 8
    padg = (-n_groups) % GB
    if padg:
        targets = jnp.concatenate([targets, jnp.zeros((padg,) + targets.shape[1:])])
        r2 = jnp.concatenate([r2, jnp.full((padg, G), -1.0)])
        run_start = jnp.concatenate(
            [run_start, jnp.zeros((padg, run_start.shape[1]), jnp.int32)]
        )
        run_len = jnp.concatenate(
            [run_len, jnp.zeros((padg, run_len.shape[1]), jnp.int32)]
        )

    counts = pairwise_count_runs(
        targets.astype(jnp.float32), r2.astype(jnp.float32), run_start, run_len,
        xs_p, ys_p, zs_p, box_params, tile=1024, interpret=True,
    )
    counts = np.asarray(counts).reshape(-1)[:n]
    expect, _, _ = brute_force_counts(x, y, z, h, np.asarray(box.limits), periodic)
    np.testing.assert_array_equal(counts, expect)
    # diagnostics: run structure sanity
    nr = np.asarray(n_runs)
    assert nr.max() <= 64 and nr.min() >= 1
