"""Key-generic op tests vs reference goldens + properties
(mirrors test/unit/sfc/common.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cstone_tpu.sfc import (
    decode_placeholder_bit,
    encode_placeholder_bit,
    is_power_of_8,
    last_nz_place,
    log8_ceil,
    make_prefix,
    node_range,
    smallest_common_box,
    span_sfc_range,
    span_sfc_range_count,
    tree_level,
)


def test_span_sfc_range_golden(golden):
    a = golden["span_a"]
    b = golden["span_b"]
    cnt = golden["span_count"]
    off = golden["span_offsets"]
    out = golden["span_out"]
    cap = int(cnt.max()) + 8

    import jax

    keys, n = jax.vmap(lambda x, y: span_sfc_range(x, y, cap))(jnp.asarray(a), jnp.asarray(b))
    counts2 = jax.vmap(span_sfc_range_count)(jnp.asarray(a), jnp.asarray(b))
    # vectorized over all pairs at once
    np.testing.assert_array_equal(np.asarray(n), cnt.astype(np.int32))
    np.testing.assert_array_equal(np.asarray(counts2), cnt.astype(np.int32))
    keys = np.asarray(keys)
    for i in range(len(a)):
        expect = out[off[i] : off[i + 1]]
        np.testing.assert_array_equal(keys[i, : cnt[i]], expect, err_msg=f"pair {i}")


def test_node_range_and_tree_level():
    for dt, lmax in [(jnp.uint32, 10), (jnp.uint64, 21)]:
        for lvl in [0, 1, 2, lmax]:
            nr = node_range(dt, lvl)
            assert int(nr) == 1 << (3 * (lmax - lvl))
            assert int(tree_level(nr)) == lvl
            assert bool(is_power_of_8(nr))


def test_placeholder_bit_roundtrip():
    codes = jnp.asarray([0o1635 << 18, 0, 0o7000 << 18], dtype=jnp.uint32)
    for plen in [3, 6, 9, 12]:
        enc = encode_placeholder_bit(codes, plen)
        dec = decode_placeholder_bit(enc)
        mask = np.uint32(0xFFFFFFFF) ^ np.uint32((1 << (30 - plen)) - 1)
        np.testing.assert_array_equal(np.asarray(dec), np.asarray(codes) & mask)


def test_smallest_common_box():
    # two keys in the same level-1 octant
    k1 = jnp.uint32(0o1000000000 + 5)
    k2 = jnp.uint32(0o1000000000 + 9000)
    lo, hi = smallest_common_box(k1, k2)
    assert int(lo) <= int(k1) and int(hi) > int(k2)
    assert bool(is_power_of_8(hi - lo))


def test_log8_ceil_and_last_nz():
    v = jnp.asarray([1, 8, 9, 64, 65, 512], dtype=jnp.uint32)
    np.testing.assert_array_equal(np.asarray(log8_ceil(v)), [0, 1, 2, 2, 3, 3])
    assert int(last_nz_place(jnp.uint32(1 << 27))) == 1
    assert int(last_nz_place(jnp.uint32(1))) == 10


def test_make_prefix():
    assert int(make_prefix(jnp.uint32(0))) == 1
    # key starting a level-1 node -> 3-bit prefix with placeholder
    k = jnp.uint32(0o2000000000)
    assert int(make_prefix(k)) == 0b1010


def test_isfc_key_top_matches_full_encode():
    """isfc_key_top must equal the full-depth encode's top bits for both
    curves and both key widths (it runs only the first `levels` rounds)."""
    import jax.numpy as jnp

    from cstone_tpu.sfc.encode import HILBERT, MORTON, isfc_key, isfc_key_top
    from cstone_tpu.sfc.keys import max_tree_level

    rng = np.random.RandomState(7)
    for dt in (np.uint32, np.uint64):
        L = max_tree_level(np.dtype(dt))
        n = 512
        c = rng.randint(0, 1 << L, size=(3, n)).astype(np.uint32)
        ix, iy, iz = (jnp.asarray(a) for a in c)
        for curve in (HILBERT, MORTON):
            full = np.asarray(isfc_key(ix, iy, iz, dt, curve)).astype(np.uint64)
            for levels in (3, 6, min(10, L)):
                top = np.asarray(isfc_key_top(ix, iy, iz, levels, L, curve))
                expect = (full >> np.uint64(3 * (L - levels))).astype(np.uint32)
                np.testing.assert_array_equal(top, expect, err_msg=f"{dt} {curve} {levels}")
