"""Device mesh + sharding helpers (the reference's Pool/Manager analog).

The reference parallelizes with a single-host multiprocessing.Pool over
input files and Manager-dict counters under a lock
(/root/reference/fslr/main.py:43-57,95-114).  Here parallelism is a 1-D
data mesh over reads: batches are sharded over the ``reads`` axis with
pjit/shard_map, counters are merged with psum (no locks), and the
reference index / primer panel are replicated.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

READS_AXIS = 'reads'


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (READS_AXIS,))


def shard_reads(mesh: Mesh, *arrays):
    """Place batch arrays with the leading axis sharded over the mesh."""
    out = []
    for a in arrays:
        spec = P(READS_AXIS, *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)


def replicate(mesh: Mesh, *arrays):
    out = []
    for a in arrays:
        out.append(jax.device_put(a, NamedSharding(mesh, P())))
    return tuple(out)
