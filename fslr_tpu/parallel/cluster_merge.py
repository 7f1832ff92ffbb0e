"""Distributed cluster-graph merge: all-gather edges, label-propagate.

SURVEY.md section 5.8: multi-host clustering shards reads per host, each
host builds local similarity edges over GLOBAL read ids, edge lists are
all-gathered over the mesh, and connected components run identically
(and redundantly — the graph is tiny next to the read data) on every
device, so cluster labels need no further synchronization.

Also provides the jax.distributed bootstrap used on real multi-host pods;
on a single host it is a no-op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from fslr_tpu.ops.components import connected_components
from fslr_tpu.parallel.mesh import READS_AXIS


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None):
    """jax.distributed.initialize wrapper; no-op single-host.

    Idempotent: an embedding application (or test runner) may have
    bootstrapped jax.distributed itself before calling the pipeline —
    jax raises on a second initialize once the backend is live."""
    if num_processes is None or num_processes <= 1:
        return
    # public API where available (jax >= 0.4.34); otherwise treat the
    # "already initialized" RuntimeError as the idempotent no-op —
    # reaching into jax._src.distributed.global_state broke across jax
    # versions (round-4 advisor finding)
    is_init = getattr(jax.distributed, 'is_initialized', None)
    if is_init is not None and is_init():
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        if 'already' not in str(e).lower():
            raise


def merged_components(mesh, edges_per_shard: list[np.ndarray],
                      n_nodes: int, max_local_edges: int) -> np.ndarray:
    """All-gather per-shard edge lists over the mesh and label-propagate.

    Args:
      edges_per_shard: one (E_i, 2) int32 array of GLOBAL node-id pairs per
        mesh device (on a real multi-host pod each process contributes its
        own shard); each is padded to ``max_local_edges`` with self-loops
        on node 0, which cannot change labels.
      n_nodes: total (global) node count.
    Returns (n_nodes,) int32 labels (label = smallest node id in the
    component), identical on every device.
    """
    n_dev = mesh.devices.size
    if len(edges_per_shard) != n_dev:
        raise ValueError(f'need {n_dev} shards, got {len(edges_per_shard)}')
    shards = []
    for e in edges_per_shard:
        e = np.asarray(e, np.int32).reshape(-1, 2)
        if len(e) > max_local_edges:
            raise ValueError(f'{len(e)} local edges > cap {max_local_edges}')
        shards.append(np.concatenate(
            [e, np.zeros((max_local_edges - len(e), 2), np.int32)]))
    stacked = jnp.asarray(np.concatenate(shards))
    stacked = jax.device_put(
        stacked, NamedSharding(mesh, P(READS_AXIS, None)))

    def gather_and_cc(edges):
        all_edges = jax.lax.all_gather(edges, READS_AXIS, tiled=True)
        return connected_components(all_edges, n_nodes)

    fn = jax.shard_map(gather_and_cc, mesh=mesh,
                       in_specs=P(READS_AXIS, None), out_specs=P(),
                       check_vma=False)
    return np.asarray(jax.jit(fn)(stacked))
