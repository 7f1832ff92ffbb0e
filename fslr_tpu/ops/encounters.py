"""Device-side encounter enumeration for breakpoint clustering.

The reference's ``query_interval_trees`` walks every interval's overlap
list in Python (/root/reference/fslr/cluster.py:187-227).  Its encounter
stream is quadratic in recurrent-breakpoint group size — the round-1 scale
wall: at 100k reads the host enumeration+reduction dominated the whole
pipeline (BASELINE.md).  This module moves the stream onto the TPU:

  1. encounters are never materialized host-side: a slice of the global
     encounter range [g0, g0+T) is expanded ON DEVICE — the query interval
     of encounter ``g`` falls out of a scatter+cumsum over the per-interval
     neighbor-count prefix sums (no binary search), the neighbor from an
     offset gather;
  2. each slice reduces to per-pair first-encounter keys with ONE
     lexicographic (pair_key, traversal_key) sort + group-first compaction
     (device sort measured ~320M keys/s vs ~25M/s host np.sort on the
     2-core host);
  3. per-slice uniques are merged incrementally on device (bounded HBM),
     deduped again, gated by the qlen2/n_alignments ratio test, ordered by
     traversal key, and kept DEVICE-RESIDENT: the walk fetches only the
     windows it touches (the edge cap means that is typically ~1% of
     entries), so host memory and tunnel transfer scale with touched
     entries, not with the quadratic pair count.

The gate ratio test is float64 division on the host
(cluster.py:178-183).  TPUs run float32, so the device computes a banded
verdict (definitely-pass / definitely-fail with a 1e-5 margin around the
thresholds — integer-valued inputs give float32 ratios exact to ~1e-7)
and the rare borderline entries are resolved exactly on host in float64.

Traversal-key semantics replicate stages/cluster.query_graph exactly:
tv = (query_read * max_itv + interval_rank) * max_nc + neighbor_position,
minimized per unordered pair — the pair is "seen" at its globally first
encounter (seen_edges dedup, cluster.py:205-207).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

BIG = np.int64(np.iinfo(np.int64).max)
_GATE_EPS = 1e-5

# pow2 buckets for padded shapes (bounded compile counts)
_T_BUCKETS = tuple(1 << s for s in range(14, 26))


def _bucket(n: int, buckets=_T_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    b = buckets[-1]
    while b < n:        # beyond the table: keep doubling (exact pow2)
        b *= 2
    return b


def _jit(**kw):
    import jax
    return functools.partial(jax.jit, **kw)


@dataclasses.dataclass
class ChromJob:
    """Host-side per-chromosome interval-join arrays (already sorted by
    start; lo/counts from the prefix-max overlap window, exactly the
    arrays stages/cluster._ChromIndex produces)."""
    starts: np.ndarray      # (NC,) int32/int64 interval starts
    ends: np.ndarray        # (NC,) interval ends
    lo: np.ndarray          # (NC,) first candidate neighbor position
    ccum: np.ndarray        # (NC+1,) int64 cumulative neighbor counts
    rid: np.ndarray         # (NC,) int64 read id per interval
    irk: np.ndarray         # (NC,) int64 interval rank within its read


# Pair state is 12 bytes: pk (int64, min*R+max) + sk (int32,
# side_flag*2^30 + interval_rank*max_nc + neighbor_pos).  Within a pk
# group, (sk) orders exactly like the traversal key (query read is min or
# max of the pair -> the side flag; then rank, then neighbor position), so
# lexicographic (pk, sk) sorts put each pair's FIRST global encounter at
# its group head.  The full int64 traversal key rebuilds arithmetically.
# Requires max_itv * max_nc < 2^30 (checked; the 2-core host path handles
# pathological datasets beyond it).
_SK_FLAG = 1 << 30
_SK_BIG = np.int32(2**31 - 1)


@functools.lru_cache(maxsize=None)
def _enum_reduce_fn(T: int):
    import jax
    import jax.numpy as jnp

    @_jit(static_argnames=())
    def fn(ccum, lo, starts, ends, rid, irk, g0, tot, nc_real,
           R, max_nc):
        # qx[j] = index of the query interval owning encounter g0+j:
        # count of prefix-sum entries <= g via scatter + cumsum (ccum is
        # sorted, so this replaces a 32M-row binary search)
        pos = jnp.clip(ccum - g0, 0, T).astype(jnp.int32)
        oneh = jnp.zeros(T + 1, jnp.int32).at[pos].add(1)
        j = jnp.arange(T, dtype=jnp.int64)
        valid = j < tot
        qx = jnp.cumsum(oneh[:T]) - 1
        qx = jnp.clip(qx, 0, (nc_real - 1).astype(jnp.int32))
        g = g0 + j
        nx = (lo[qx].astype(jnp.int64) + (g - ccum[qx]))
        nx_c = jnp.clip(nx, 0, (nc_real - 1).astype(jnp.int64))
        keep = valid & (ends[nx_c] >= starts[qx])
        a = rid[qx].astype(jnp.int64)
        b = rid[nx_c].astype(jnp.int64)
        keep &= a != b
        pk = jnp.minimum(a, b) * R + jnp.maximum(a, b)
        flag = (a > b).astype(jnp.int32)
        sk = (flag * _SK_FLAG
              + (irk[qx].astype(jnp.int64) * max_nc + nx).astype(jnp.int32))
        pk = jnp.where(keep, pk, jnp.int64(BIG))
        sk = jnp.where(keep, sk, _SK_BIG)
        # lexicographic (pair, first-encounter) sort: group firsts ARE the
        # per-pair minima
        pk_s, sk_s = jax.lax.sort((pk, sk), num_keys=2)
        first = jnp.concatenate(
            [jnp.ones(1, bool), pk_s[1:] != pk_s[:-1]])
        first &= pk_s != jnp.int64(BIG)
        cnt = jnp.sum(first)
        # compact: stable sort by ~first keeps uniques (pair-sorted) first
        key = jnp.where(first, jnp.int32(0), jnp.int32(1))
        _, pk_u, sk_u = jax.lax.sort((key, pk_s, sk_s), num_keys=1,
                                     is_stable=True)
        return pk_u, sk_u, cnt

    return fn


@functools.lru_cache(maxsize=None)
def _dedup_fn(N: int):
    import jax
    import jax.numpy as jnp

    @_jit()
    def fn(pk, sk):
        pk_s, sk_s = jax.lax.sort((pk, sk), num_keys=2)
        first = jnp.concatenate(
            [jnp.ones(1, bool), pk_s[1:] != pk_s[:-1]])
        first &= pk_s != jnp.int64(BIG)
        cnt = jnp.sum(first)
        key = jnp.where(first, jnp.int32(0), jnp.int32(1))
        _, pk_u, sk_u = jax.lax.sort((key, pk_s, sk_s), num_keys=1,
                                     is_stable=True)
        return pk_u, sk_u, cnt

    return fn


def _split_pair(jnp, pk, sk, R):
    """(a=query read, b=other read, rest) from the 12-byte pair state."""
    p_lo = pk // R
    p_hi = pk % R
    flag = sk // _SK_FLAG
    rest = sk - flag * _SK_FLAG
    a = jnp.where(flag == 1, p_hi, p_lo)
    b = jnp.where(flag == 1, p_lo, p_hi)
    return a, b, rest


@functools.lru_cache(maxsize=None)
def _gate_fn(N: int):
    """Both reads derive from the 12-byte pair state, so only
    (gate, border, n_border) come back — every extra N-sized operand here
    costs HBM at 250M+ pairs."""
    import jax.numpy as jnp

    @_jit()
    def fn(pk, sk, qlen2, naln, R, t_q, t_n):
        valid = pk != jnp.int64(BIG)
        a, b, _ = _split_pair(jnp, pk, sk, R)
        eq = jnp.clip(a, 0, R - 1).astype(jnp.int32)
        eo = jnp.clip(b, 0, R - 1).astype(jnp.int32)
        q1 = qlen2[eq]
        q2 = qlen2[eo]
        r_q = jnp.minimum(q1, q2) / jnp.maximum(jnp.maximum(q1, q2),
                                                jnp.float32(1e-12))
        n1 = naln[eq]
        n2 = naln[eo]
        r_n = jnp.minimum(n1, n2) / jnp.maximum(n1, n2)
        eps = jnp.float32(_GATE_EPS)
        sure_pass = (r_q >= t_q + eps) | (r_n >= t_n + eps)
        sure_fail = (r_q <= t_q - eps) & (r_n <= t_n - eps)
        border = valid & ~sure_pass & ~sure_fail
        gate = valid & sure_pass
        n_border = jnp.sum(border)
        return gate, border, n_border

    return fn


@functools.lru_cache(maxsize=None)
def _border_index_fn(N: int):
    import jax
    import jax.numpy as jnp

    @_jit()
    def fn(border, pk, sk, R):
        a, b, _ = _split_pair(jnp, pk, sk, R)
        key = jnp.where(border, jnp.int32(0), jnp.int32(1))
        idx = jnp.arange(N, dtype=jnp.int32)
        _, idx_s, eq_s, eo_s = jax.lax.sort(
            (key, idx, a.astype(jnp.int32), b.astype(jnp.int32)),
            num_keys=1, is_stable=True)
        return idx_s, eq_s, eo_s

    return fn


@functools.lru_cache(maxsize=None)
def _order_fn(N: int, R: int):
    """Sort gated entries into traversal order.  The traversal key
    rebuilds from the pair state; only (key, eo) are sort operands,
    keeping peak HBM near the floor of input+output buffers."""
    import jax
    import jax.numpy as jnp

    @_jit()
    def fn(pk, sk, gate, max_itv, max_nc, trav_scale):
        big = jnp.int64(BIG)
        a, b, rest = _split_pair(jnp, pk, sk, R)
        tv = a * trav_scale + rest.astype(jnp.int64)
        key = jnp.where(gate, tv, big)
        eo = jnp.clip(b, 0, R - 1).astype(jnp.int32)
        key_s, eo_s = jax.lax.sort((key, eo), num_keys=1)
        E = jnp.sum(gate)
        eq_s = key_s // trav_scale          # >= R for dropped entries
        ei_s = (key_s // max_nc) % max_itv
        # nxt[i] = first j > i where the (read, interval) run changes
        iota = jnp.arange(N, dtype=jnp.int32)
        flag = jnp.concatenate(
            [jnp.ones(1, bool),
             (eq_s[1:] != eq_s[:-1]) | (ei_s[1:] != ei_s[:-1])])
        m = jnp.where(flag, iota, jnp.int32(N))
        sfx = jax.lax.cummin(m[::-1])[::-1]
        nxt = jnp.concatenate([sfx[1:], jnp.full(1, N, jnp.int32)])
        bounds = jnp.searchsorted(eq_s,
                                  jnp.arange(R + 1, dtype=jnp.int64))
        return key_s, eo_s, nxt, bounds, E

    return fn


@functools.lru_cache(maxsize=None)
def _fetch_fn():
    import jax
    import jax.numpy as jnp

    @_jit()
    def fn(key, eo, nxt, rows, max_itv, max_nc):
        k = jnp.take(key, rows)
        ei = ((k // max_nc) % max_itv).astype(jnp.int32)
        return jnp.stack([ei, jnp.take(eo, rows),
                          jnp.take(nxt, rows)])

    return fn


class EntrySet:
    """Gated, traversal-ordered pair entries, device-resident.

    Stored as (traversal key int64, other-read int32, run-jump int32) —
    the query read and interval rank derive from the key.
    ``bounds[q]:bounds[q+1]`` is query q's entry range.  ``fetch(ranges)``
    gathers (ei, eo, nxt) rows for a batch of [start, stop) ranges in ONE
    transfer."""

    def __init__(self, key_d, eo_d, nxt_d, bounds: np.ndarray, E: int,
                 max_itv: int = 1, max_nc: int = 1):
        self._key, self._eo, self._nxt = key_d, eo_d, nxt_d
        self.bounds = bounds
        self.E = E
        self._mi, self._mn = max_itv, max_nc

    def _gather(self, idx: np.ndarray) -> np.ndarray:
        import jax
        import jax.numpy as jnp
        with jax.enable_x64():
            return np.asarray(_fetch_fn()(
                self._key, self._eo, self._nxt, jnp.asarray(idx),
                jnp.int64(self._mi), jnp.int64(self._mn)))

    def fetch(self, ranges: list[tuple[int, int]]):
        """Returns a list of (ei, eo, nxt) int32 array triples, one per
        requested [start, stop) range; one device gather + one transfer."""
        if not ranges:
            return []
        starts = np.fromiter((s for s, _ in ranges), np.int64,
                             len(ranges))
        lens = np.fromiter((t - s for s, t in ranges), np.int64,
                           len(ranges))
        tot = int(lens.sum())
        offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
        idx = (np.arange(tot, dtype=np.int64)
               + np.repeat(starts - offs, lens))
        packed = self._gather(idx)
        out = []
        off = 0
        for s, t in ranges:
            n = t - s
            out.append((packed[0, off:off + n], packed[1, off:off + n],
                        packed[2, off:off + n]))
            off += n
        return out

    def fetch_all(self):
        packed = self._gather(np.arange(self.E, dtype=np.int64))
        return packed[0], packed[1], packed[2]


def build_entries(jobs: list[ChromJob], R: int, max_itv: int, max_nc: int,
                  qlen2: np.ndarray, naln: np.ndarray, qlen_thresh: float,
                  naln_thresh: float, slice_cap: int,
                  merge_cap: int = 96 * 1024 * 1024) -> EntrySet:
    """Full device pipeline: enumerate -> per-pair min -> gate -> order.

    qlen_thresh/naln_thresh are the float64 host values ``1 - qlen_diff``
    and ``1 - n_alignment_diff``; borderline float32 ratios are re-checked
    exactly on host.

    The whole build runs under the scoped ``jax.enable_x64()`` context —
    pair and traversal keys genuinely need 64-bit integers (the flag is
    scoped, so the rest of the engine keeps default 32-bit tracing).
    """
    import jax
    with jax.enable_x64():
        return _build_entries_x64(jobs, R, max_itv, max_nc, qlen2, naln,
                                  qlen_thresh, naln_thresh, slice_cap,
                                  merge_cap)


def _build_entries_x64(jobs, R, max_itv, max_nc, qlen2, naln, qlen_thresh,
                       naln_thresh, slice_cap, merge_cap) -> EntrySet:
    import os
    import sys
    import time

    import jax.numpy as jnp

    dbg = bool(os.environ.get('FSLR_ENC_DEBUG'))
    t_start = time.time()

    def _dbg(msg):
        if dbg:
            print(f'[enc] +{time.time() - t_start:6.2f}s {msg}',
                  file=sys.stderr)

    trav_scale = max_itv * max_nc
    assert trav_scale * (R + 1) < (1 << 62), 'traversal key overflow'
    assert trav_scale < _SK_FLAG, \
        'interval-rank state exceeds 2^30 (caller must use the host path)'

    R_j = jnp.int64(R)
    mn_j = jnp.int64(max_nc)

    # ---- phase 1: per-slice enumerate + reduce -------------------------
    parts: list[tuple] = []      # (pk_dev(T,), tv_dev(T,), cnt_dev)
    held = 0
    merged: list[tuple] = []     # [(pk_dev, tv_dev)] compact uniques

    def drain_parts():
        nonlocal held
        if not parts:
            return
        cnts = np.asarray(jnp.stack([c for (_, _, c) in parts]))
        for (pk_u, tv_u, _), c in zip(parts, cnts):
            c = int(c)
            if c:
                merged.append((pk_u[:c], tv_u[:c]))
        parts.clear()
        held = 0
        _maybe_merge()

    def _maybe_merge(force=False):
        tot = sum(int(p.shape[0]) for p, _ in merged)
        if len(merged) <= 1 or (not force and tot < merge_cap):
            return
        N = _bucket(tot)
        pk = jnp.concatenate(
            [p for p, _ in merged]
            + [jnp.full(N - tot, BIG, jnp.int64)])
        sk = jnp.concatenate(
            [s for _, s in merged]
            + [jnp.full(N - tot, _SK_BIG, jnp.int32)])
        pk_u, sk_u, cnt = _dedup_fn(N)(pk, sk)
        del pk, sk
        c = int(cnt)
        merged.clear()
        merged.append((pk_u[:c], sk_u[:c]))

    for job in jobs:
        nc = len(job.starts)
        total = int(job.ccum[-1])
        if total == 0:
            continue
        NCpad = _bucket(nc, tuple(1 << s for s in range(10, 32)))
        ccum_d = jnp.asarray(np.concatenate(
            [job.ccum, np.full(NCpad - nc, job.ccum[-1], np.int64)]))
        pad32 = lambda a: jnp.asarray(np.concatenate(  # noqa: E731
            [a.astype(np.int32), np.zeros(NCpad - nc, np.int32)]))
        lo_d, st_d, en_d = (pad32(job.lo), pad32(job.starts),
                            pad32(job.ends))
        rid_d, irk_d = pad32(job.rid), pad32(job.irk)
        nc_j = jnp.int64(nc)
        g0 = 0
        while g0 < total:
            tot_s = min(total - g0, slice_cap)
            T = _bucket(tot_s)
            pk_u, sk_u, cnt = _enum_reduce_fn(T)(
                ccum_d, lo_d, st_d, en_d, rid_d, irk_d,
                jnp.int64(g0), jnp.int64(tot_s), nc_j, R_j, mn_j)
            parts.append((pk_u, sk_u, cnt))
            held += T
            if held >= merge_cap:
                drain_parts()
            g0 += tot_s
    drain_parts()
    _dbg('slices enumerated + drained')
    _maybe_merge(force=True)
    _dbg(f'final merge done '
         f'(U={int(merged[0][0].shape[0]) if merged else 0})')

    if not merged:
        return EntrySet(None, None, None, np.zeros(R + 1, np.int64), 0)
    pk_fin, sk_fin = merged[0]
    merged.clear()
    U = int(pk_fin.shape[0])
    N = _bucket(U)
    if N != U:
        pk_fin = jnp.concatenate([pk_fin, jnp.full(N - U, BIG, jnp.int64)])
        sk_fin = jnp.concatenate(
            [sk_fin, jnp.full(N - U, _SK_BIG, jnp.int32)])

    # ---- phase 2: gate (banded f32 + exact host borderline) ------------
    ql_d = jnp.asarray(qlen2.astype(np.float32))
    na_d = jnp.asarray(naln.astype(np.float32))
    gate, border, n_border = _gate_fn(N)(
        pk_fin, sk_fin, ql_d, na_d, R_j, jnp.float32(qlen_thresh),
        jnp.float32(naln_thresh))
    nb = int(n_border)
    _dbg(f'gate done (nb={nb})')
    if nb:
        idx_s, eq_b, eo_b = _border_index_fn(N)(border, pk_fin, sk_fin,
                                                R_j)
        pk_b = np.asarray(jnp.stack(
            [idx_s[:nb].astype(jnp.int64), eq_b[:nb].astype(jnp.int64),
             eo_b[:nb].astype(jnp.int64)]))
        bi, ba, bb = pk_b[0], pk_b[1], pk_b[2]
        q1, q2 = qlen2[ba], qlen2[bb]
        n1, n2 = naln[ba], naln[bb]
        ok = ((np.minimum(q1, q2) / np.maximum(np.maximum(q1, q2), 1e-12))
              >= qlen_thresh) | \
             ((np.minimum(n1, n2) / np.maximum(n1, n2)) >= naln_thresh)
        # border entries are disjoint from sure_pass, so a plain set works
        gate = gate.at[jnp.asarray(bi.astype(np.int32))].set(
            jnp.asarray(ok))
    del border

    # ---- phase 3: traversal order + run-jump + bounds -------------------
    key_s, eo_s, nxt, bounds_d, E = _order_fn(N, R)(
        pk_fin, sk_fin, gate, jnp.int64(max_itv), jnp.int64(max_nc),
        jnp.int64(trav_scale))
    del pk_fin, sk_fin, gate
    bounds = np.asarray(bounds_d).astype(np.int64)
    E = int(E)
    # trim the non-gated tail (pow2-bucketed) to release device memory
    Ek = _bucket(max(E, 1))
    if Ek < N:
        key_s, eo_s, nxt = key_s[:Ek], eo_s[:Ek], nxt[:Ek]
    _dbg(f'order done (E={E})')
    return EntrySet(key_s, eo_s, nxt, bounds, E, max_itv, max_nc)
