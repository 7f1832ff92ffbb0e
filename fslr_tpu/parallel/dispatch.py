"""Data-parallel kernel dispatch over the active device mesh.

This is the production multi-chip path (the reference's only parallelism
is a single-host ``Pool.map`` over input files,
/root/reference/fslr/main.py:95-114; here the analog is read-sharding every
batched device kernel over a 1-D mesh).  Stages call their kernels through
:func:`dp_call`:

  * no active mesh (the default; single-chip bench path): the kernel runs
    exactly as before — zero overhead, byte-identical artifacts;
  * active mesh: the batch (leading-axis) arguments are padded to a
    multiple of the mesh size with edge-repeated rows (every kernel here is
    row-independent, so duplicate rows are wasted work, never wrong
    answers), shard_mapped over the ``reads`` axis with the small tables
    (genome, seed index, primer panels) replicated, and the outputs sliced
    back to the true batch size.

Counters use :func:`dp_sum` — per-shard partial sums combined with a
``psum`` over the mesh (the reference's Manager-dict + Lock,
main.py:43-57, without locks).

Kernels run identical row math regardless of partitioning, so sharded
pipeline artifacts are byte-identical to single-device runs
(tests/test_parallel.py asserts this end-to-end).
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from fslr_tpu.parallel.mesh import READS_AXIS

_ACTIVE_MESH: Mesh | None = None
_CACHE: dict = {}


def set_mesh(mesh: Mesh | None):
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    _CACHE.clear()


def active_mesh() -> Mesh | None:
    return _ACTIVE_MESH


@contextmanager
def use_mesh(mesh: Mesh | None):
    prev = _ACTIVE_MESH
    set_mesh(mesh)
    try:
        yield
    finally:
        set_mesh(prev)


def _pad_rows(a, n_to: int):
    """Pad the leading axis to ``n_to`` rows by repeating the last row
    (valid data, row-independent kernels -> duplicated work, same
    answers)."""
    n = a.shape[0]
    if n == n_to:
        return a
    reps = jnp.repeat(a[-1:], n_to - n, axis=0)
    return jnp.concatenate([a, reps], axis=0)


def _slice_rows(x, n: int):
    return x[:n]


def _get_sharded(fn, n_batch: int, n_repl: int, statics: tuple):
    key = (fn, n_batch, n_repl, statics)
    cached = _CACHE.get(key)
    if cached is None:
        mesh = _ACTIVE_MESH
        in_specs = ((P(READS_AXIS),) * n_batch + (P(),) * n_repl)

        def inner(*args):
            return fn(*args, *statics)

        cached = jax.jit(jax.shard_map(
            inner, mesh=mesh, in_specs=in_specs, out_specs=P(READS_AXIS),
            check_vma=False))
        _CACHE[key] = cached
    return cached


def dp_call(fn, batch_args, repl_args=(), statics=()):
    """Run ``fn(*batch_args, *repl_args, *statics)`` data-parallel over the
    active mesh (or directly when none is active).

    ``batch_args`` share a common leading axis (the read/window batch) and
    are sharded over it; ``repl_args`` are replicated device tables;
    ``statics`` are hashable Python values (configs, flags) closed over at
    trace time.  Every output leaf must be batched over ITS leading axis
    (wrap kernels whose outputs are batch-minor with a transpose adapter).
    """
    mesh = _ACTIVE_MESH
    n = int(batch_args[0].shape[0])
    if mesh is None or mesh.devices.size <= 1 or n == 0:
        return fn(*batch_args, *repl_args, *statics)
    size = mesh.devices.size
    n_pad = -n % size
    if n_pad:
        batch_args = tuple(_pad_rows(jnp.asarray(a), n + n_pad)
                           for a in batch_args)
    sharded = _get_sharded(fn, len(batch_args), len(repl_args),
                           tuple(statics))
    out = sharded(*batch_args, *repl_args)
    if n_pad:
        out = jax.tree.map(lambda x: _slice_rows(x, n), out)
    return out


def _psum_counts(*flags):
    return tuple(jax.lax.psum(jnp.sum(f.astype(jnp.int64)), READS_AXIS)
                 for f in flags)


def dp_sum(*flag_arrays) -> tuple[int, ...]:
    """Total of each boolean/int flag array: per-shard partial sums psum'd
    over the mesh (the Manager-dict counter analog, SURVEY section 5.5).
    Falls back to plain numpy sums when no mesh is active."""
    mesh = _ACTIVE_MESH
    n = int(flag_arrays[0].shape[0])
    if mesh is None or mesh.devices.size <= 1 or n == 0:
        return tuple(int(np.sum(f)) for f in flag_arrays)
    size = mesh.devices.size
    n_pad = -n % size
    arrs = []
    for f in flag_arrays:
        a = jnp.asarray(f)
        if n_pad:        # pad with zeros: must not change the sums
            a = jnp.concatenate(
                [a, jnp.zeros((n_pad,) + a.shape[1:], a.dtype)])
        arrs.append(a)
    key = ('_dp_sum', len(arrs))
    cached = _CACHE.get(key)
    if cached is None:
        cached = jax.jit(jax.shard_map(
            _psum_counts, mesh=mesh,
            in_specs=(P(READS_AXIS),) * len(arrs), out_specs=P(),
            check_vma=False))
        _CACHE[key] = cached
    return tuple(int(v) for v in cached(*arrs))
