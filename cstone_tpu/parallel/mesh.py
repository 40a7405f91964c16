"""Device-mesh helpers.

One mesh axis ("ranks") plays the role of the reference's MPI ranks
(reference: MPI_COMM_WORLD throughout, e.g. domain/domaindecomp_mpi.hpp).
Spatial domain decomposition over the SFC is the parallelism strategy; the
mesh axis is the device dimension it shards over.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "rank_axis"]

rank_axis = "ranks"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (rank_axis,))
