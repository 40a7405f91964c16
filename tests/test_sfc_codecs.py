"""SFC key codec tests: bit-exact vs the reference implementation's goldens
plus encode/decode inversion (mirrors test/unit/sfc/{morton,hilbert}.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cstone_tpu.sfc import (
    Box,
    decode_hilbert,
    decode_morton,
    ihilbert,
    imorton,
    make_box,
    sfc3d,
)


def test_morton32_golden(golden):
    keys = imorton(
        jnp.asarray(golden["ix32"]), jnp.asarray(golden["iy32"]), jnp.asarray(golden["iz32"]),
        jnp.uint32,
    )
    np.testing.assert_array_equal(np.asarray(keys), golden["morton32"])


def test_morton64_golden(golden):
    keys = imorton(
        jnp.asarray(golden["ix64"].astype(np.uint32)),
        jnp.asarray(golden["iy64"].astype(np.uint32)),
        jnp.asarray(golden["iz64"].astype(np.uint32)),
        jnp.uint64,
    )
    np.testing.assert_array_equal(np.asarray(keys), golden["morton64"])


def test_hilbert32_golden(golden):
    keys = ihilbert(
        jnp.asarray(golden["ix32"]), jnp.asarray(golden["iy32"]), jnp.asarray(golden["iz32"]),
        jnp.uint32,
    )
    np.testing.assert_array_equal(np.asarray(keys), golden["hilbert32"])


def test_hilbert64_golden(golden):
    keys = ihilbert(
        jnp.asarray(golden["ix64"].astype(np.uint32)),
        jnp.asarray(golden["iy64"].astype(np.uint32)),
        jnp.asarray(golden["iz64"].astype(np.uint32)),
        jnp.uint64,
    )
    np.testing.assert_array_equal(np.asarray(keys), golden["hilbert64"])


@pytest.mark.parametrize("dtype", [jnp.uint32, jnp.uint64])
def test_morton_inversion(dtype, golden):
    suffix = "32" if dtype == jnp.uint32 else "64"
    ix = jnp.asarray(golden[f"ix{suffix}"].astype(np.uint32))
    iy = jnp.asarray(golden[f"iy{suffix}"].astype(np.uint32))
    iz = jnp.asarray(golden[f"iz{suffix}"].astype(np.uint32))
    dx, dy, dz = decode_morton(imorton(ix, iy, iz, dtype))
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(ix))
    np.testing.assert_array_equal(np.asarray(dy), np.asarray(iy))
    np.testing.assert_array_equal(np.asarray(dz), np.asarray(iz))


@pytest.mark.parametrize("dtype", [jnp.uint32, jnp.uint64])
def test_hilbert_inversion(dtype, golden):
    suffix = "32" if dtype == jnp.uint32 else "64"
    ix = jnp.asarray(golden[f"ix{suffix}"].astype(np.uint32))
    iy = jnp.asarray(golden[f"iy{suffix}"].astype(np.uint32))
    iz = jnp.asarray(golden[f"iz{suffix}"].astype(np.uint32))
    dx, dy, dz = decode_hilbert(ihilbert(ix, iy, iz, dtype))
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(ix))
    np.testing.assert_array_equal(np.asarray(dy), np.asarray(iy))
    np.testing.assert_array_equal(np.asarray(dz), np.asarray(iz))


def test_sfc3d_float32_golden(golden):
    """Float coordinate -> Hilbert key pipeline matches the reference bit-for-bit."""
    x = jnp.asarray(golden["coords_x_bits"]).view(jnp.float32)
    y = jnp.asarray(golden["coords_y_bits"]).view(jnp.float32)
    z = jnp.asarray(golden["coords_z_bits"]).view(jnp.float32)
    box = make_box(-1.0, 1.0)
    k32 = sfc3d(x, y, z, box, jnp.uint32)
    k64 = sfc3d(x, y, z, box, jnp.uint64)
    np.testing.assert_array_equal(np.asarray(k32), golden["sfc3d_hilbert32"])
    np.testing.assert_array_equal(np.asarray(k64), golden["sfc3d_hilbert64"])


def test_hilbert_first_octants():
    """First 8 grid points follow the canonical level-1 Hilbert order."""
    # morton octant -> hilbert: 0,1,3,2,7,6,4,5
    ix = jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1], dtype=jnp.uint32) * jnp.uint32(512)
    iy = jnp.asarray([0, 0, 1, 1, 0, 0, 1, 1], dtype=jnp.uint32) * jnp.uint32(512)
    iz = jnp.asarray([0, 1, 0, 1, 0, 1, 0, 1], dtype=jnp.uint32) * jnp.uint32(512)
    keys = ihilbert(ix, iy, iz, jnp.uint32) >> jnp.uint32(27)
    np.testing.assert_array_equal(np.asarray(keys), [0, 1, 3, 2, 7, 6, 4, 5])


def test_hilbert_2d_inversion():
    """2D Hilbert encode/decode inversion (hilbert.hpp:118-222)."""
    from cstone_tpu.sfc import ihilbert_2d, decode_hilbert_2d

    rng = np.random.RandomState(6)
    for dtype, bits in [(jnp.uint32, 10), (jnp.uint64, 21)]:
        px = jnp.asarray(rng.randint(0, 1 << bits, 512).astype(np.uint32))
        py = jnp.asarray(rng.randint(0, 1 << bits, 512).astype(np.uint32))
        keys = ihilbert_2d(px, py, dtype)
        dx, dy = decode_hilbert_2d(keys)
        np.testing.assert_array_equal(np.asarray(dx), np.asarray(px))
        np.testing.assert_array_equal(np.asarray(dy), np.asarray(py))
