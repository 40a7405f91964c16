"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is exercised on host CPU devices
(xla_force_host_platform_device_count), exactly as the driver's
dryrun_multichip does; TPU benchmarks run separately via bench.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import json
import pathlib

import jax

# The environment's sitecustomize may pre-import jax and register a TPU
# plugin before this file runs; the config update below is authoritative
# and keeps the whole test session on the 8-device host CPU platform.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

jax.config.update("jax_compilation_cache_dir", "/tmp/cstone_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden():
    """Reference-implementation golden vectors (see tests/oracle/)."""
    with open(GOLDEN_DIR / "reference_golden.json") as f:
        raw = json.load(f)
    out = {}
    for k, v in raw.items():
        if "64" in k or k.startswith("spanning"):
            out[k] = np.asarray(v, dtype=np.uint64)
        else:
            out[k] = np.asarray(v, dtype=np.uint32)
    return out
