"""Field state management + target grouping tests
(mirror test/unit/{fields,traversal/groups}*)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cstone_tpu.fields import ParticleFields, get_fields
from cstone_tpu.sfc import PERIODIC, make_box
from cstone_tpu.traversal.groups import adaptive_groups, fixed_groups


def test_field_states_lifecycle():
    d = ParticleFields(100)
    d.add("x", conserved=True)
    d.add("rho")
    assert d.states.is_allocated("x") and d.states.is_allocated("rho")

    with pytest.raises(ValueError):
        d.release("x")

    buf = d["rho"]
    d.release("rho")
    assert not d.states.is_allocated("rho")
    d.acquire("p")  # reuses rho's buffer
    assert d["p"] is buf

    x, p = get_fields(d, "x", "p")
    assert x.shape == (100,)
    assert d.field_index("y", ["x", "y", "z"]) == 1


def test_fixed_groups():
    g = fixed_groups(10, 75, group_size=16, cap_groups=8)
    n = int(g.n_groups)
    assert n == 5  # 65 particles / 16
    starts = np.asarray(g.group_start)[:n]
    ends = np.asarray(g.group_end)[:n]
    np.testing.assert_array_equal(starts, [10, 26, 42, 58, 74])
    np.testing.assert_array_equal(ends, [26, 42, 58, 74, 75])


def test_adaptive_groups_cover_and_split():
    rng = np.random.RandomState(2)
    n = 200
    # two well-separated clusters in SFC order
    x = np.concatenate([rng.uniform(0, 0.1, 100), rng.uniform(0.9, 1.0, 100)])
    x.sort()
    y = np.zeros(n, np.float32)
    z = np.zeros(n, np.float32)
    box = make_box(0.0, 1.0)
    g = adaptive_groups(
        jnp.asarray(x.astype(np.float32)), jnp.asarray(y), jnp.asarray(z),
        0, n, max_group_size=32, distance_tol=0.2, box=box, cap_groups=64,
    )
    ng = int(g.n_groups)
    starts = np.asarray(g.group_start)[:ng]
    ends = np.asarray(g.group_end)[:ng]
    # groups tile [0, n) without gaps
    assert starts[0] == 0 and ends[-1] == n
    np.testing.assert_array_equal(starts[1:], ends[:-1])
    # the cluster boundary at index 100 must be a split point
    assert 100 in set(starts.tolist())
    # no group exceeds the max size
    assert (ends - starts).max() <= 32
