"""Batched striped Smith-Waterman for TPU (Pallas) with a pure-JAX fallback.

This single kernel backs both reference use-sites of SIMD Smith-Waterman
(scikit-bio StripedSmithWaterman): the concatemer scan
(/root/reference/fslr/filter_junk_from_fq.py:92,103, score >= 28 decision) and
primer identification / trimming
(/root/reference/fslr/find_reads_with_primers.py:57-58, normalized score +
target_begin / target_end_optimal for the trim).

Layout (TPU-first, not a transcription of the CPU striped layout):
  * query positions j live on the 128 VPU lanes (primers/targets are <= 68 bp),
  * batch elements live on sublanes,
  * target positions i are scanned sequentially.

The affine-gap recurrence has an in-row dependency (gaps consuming query
bases, Farrar's "lazy F" loop).  We replace it with a closed form: with
first-gap cost fg >= gap-extend e,

    F[i][j] = max_{k<j}( Hno[i][k] - fg - (j-k-1)*e )
            = cummax_{k<=j-1}( Hno[i][k] + k*e ) - fg - (j-1)*e

where Hno is H computed without F contributions.  (Opening a new query-gap
from a cell that itself ends in a query-gap is never better than extending
the original gap when fg >= e, so Hno may replace H inside the cummax.)
The cummax is a log2(128)-step shifted-max over lanes — pure VPU work.

End-position semantics replicate the ssw library: per-lane running maxima
with strict ">" updates give, per column j, the first row where the column
maximum is reached; the reported query end is the smallest j achieving the
global maximum (ssw's maxColumn scan) and the reported target end is the
first row at which the global maximum is reached.  ``target_begin`` is
recovered ssw-style by re-aligning reversed prefixes.

Gap conventions (config.ScoringConfig.gap_open_is_first_base):
  * ssw / scikit-bio: gap of length g costs open + (g-1)*extend,
  * bwa (-O5 -E2):    gap of length g costs open + g*extend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fslr_tpu.config import ScoringConfig

NEG = -1e30
QP = 128          # query lanes (max query length supported by this layout)
DEF_BT = 256      # batch tile (sublanes)
DEF_TT = 512      # target tile




def pad_rows_pow2(n: int, minimum: int = 256) -> int:
    """Next power-of-two row count (>= minimum): strict shape discipline so
    varying batch sizes reuse a handful of compiled kernel shapes instead
    of recompiling per batch (remote Pallas compiles cost 20-60 s)."""
    m = minimum
    while m < n:
        m *= 2
    return m


def first_gap_cost(sc: ScoringConfig) -> float:
    return float(sc.gap_open if sc.gap_open_is_first_base
                 else sc.gap_open + sc.gap_extend)


def _shift_right(x, d, fill, roll_fn, jidx):
    """x[j] -> x[j-d], positions j < d become ``fill``."""
    rolled = roll_fn(x, d)
    return jnp.where(jidx >= d, rolled, fill)


def _cummax_exclusive(x, roll_fn, jidx):
    """max over k <= j-1 of x[k]; -inf at j == 0."""
    y = _shift_right(x, 1, NEG, roll_fn, jidx)
    d = 1
    while d < QP:
        y = jnp.maximum(y, _shift_right(y, d, NEG, roll_fn, jidx))
        d *= 2
    return y


def _sw_step(H, E, bestH, bestI, s, i_idx, tmask, qmask, jidx,
             fg, ext, roll_fn):
    """One target row of the batched DP.  All arrays are (BT, QP) f32."""
    E = jnp.maximum(E - ext, H - fg)
    diag = _shift_right(H, 1, 0.0, roll_fn, jidx)
    Hno = jnp.maximum(jnp.maximum(diag + s, E), 0.0)
    Cm = _cummax_exclusive(Hno + jidx * ext, roll_fn, jidx)
    F = Cm - fg - (jidx - 1.0) * ext
    H = jnp.maximum(Hno, F)
    upd = (H > bestH) & tmask & qmask
    bestH = jnp.where(upd, H, bestH)
    bestI = jnp.where(upd, i_idx, bestI)
    return H, E, bestH, bestI


def _finalize(bestH, bestI, qmask, jidx):
    """Reduce per-lane maxima to (score, target_end, query_end)."""
    bh = jnp.where(qmask, bestH, NEG)
    score = jnp.max(bh, axis=1)
    is_best = bh == score[:, None]
    big = jnp.float32(1e9)
    qend = jnp.min(jnp.where(is_best, jidx, big), axis=1)
    tend = jnp.min(jnp.where(is_best, bestI, big), axis=1)
    score = jnp.maximum(score, 0.0)
    none = score <= 0.0
    qend = jnp.where(none, 0.0, qend)
    tend = jnp.where(none, 0.0, tend)
    return score, tend.astype(jnp.int32), qend.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Pure-JAX implementation (CPU fallback + oracle for the Pallas kernel)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=('match', 'mismatch', 'fg', 'ext'))
def _sw_jax(q, t, qlens, tlens, *, match, mismatch, fg, ext):
    B, T = t.shape
    jidx = jnp.broadcast_to(jnp.arange(QP, dtype=jnp.float32)[None, :], (B, QP))
    qmask = jidx < qlens[:, None].astype(jnp.float32)
    roll_fn = lambda x, d: jnp.roll(x, d, axis=1)

    q = q.astype(jnp.int32)
    subs_valid = q < 4

    def step(carry, inp):
        H, E, bestH, bestI = carry
        tcol, i = inp
        tcol = tcol[:, None]
        eq = (q == tcol) & subs_valid & (tcol < 4)
        s = jnp.where(eq, float(match), float(mismatch))
        s = jnp.where(qmask, s, NEG)
        tmask = (i < tlens)[:, None]
        H, E, bestH, bestI = _sw_step(
            H, E, bestH, bestI, s, jnp.float32(i), tmask, qmask, jidx,
            fg, ext, roll_fn)
        return (H, E, bestH, bestI), None

    zeros = jnp.zeros((B, QP), jnp.float32)
    init = (zeros, jnp.full((B, QP), NEG), jnp.full((B, QP), NEG), zeros)
    (H, E, bestH, bestI), _ = jax.lax.scan(
        step, init, (t.astype(jnp.int32).T, jnp.arange(T)), unroll=4)
    return _finalize(bestH, bestI, qmask, jidx)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

def _sw_kernel(q_ref, t_ref, qlen_ref, tlen_ref,
               score_ref, tend_ref, qend_ref,
               H_s, E_s, bH_s, bI_s,
               *, TT, match, mismatch, fg, ext):
    BT = q_ref.shape[0]
    tt = pl.program_id(1)
    n_tt = pl.num_programs(1)

    jidx = jax.lax.broadcasted_iota(jnp.int32, (BT, QP), 1).astype(jnp.float32)
    qmask = jidx < qlen_ref[:].astype(jnp.float32)
    tlens = tlen_ref[:].astype(jnp.float32)
    roll_fn = lambda x, d: pltpu.roll(x, shift=d, axis=1)

    @pl.when(tt == 0)
    def _():
        H_s[:] = jnp.zeros((BT, QP), jnp.float32)
        E_s[:] = jnp.full((BT, QP), NEG, jnp.float32)
        bH_s[:] = jnp.full((BT, QP), NEG, jnp.float32)
        bI_s[:] = jnp.zeros((BT, QP), jnp.float32)

    q = q_ref[:]
    subs_valid = q < 4
    base_i = jnp.float32(tt * TT)

    # Mosaic only allows lane-aligned dynamic slices, so we load the target
    # in 128-wide blocks and peel one column per DP step by rotating the
    # block left and reading lane 0 (a static slice).
    def outer(b, carry):
        H, E, bestH, bestI = carry
        off = pl.multiple_of(b * 128, 128)
        blk0 = t_ref[:, pl.ds(off, 128)]
        blk_base = base_i + (b * 128).astype(jnp.float32)

        def inner(si, c2):
            H, E, bestH, bestI, blk = c2
            tcol = blk[:, 0:1]
            eq = (q == tcol) & subs_valid & (tcol < 4)
            s = jnp.where(eq, float(match), float(mismatch))
            s = jnp.where(qmask, s, NEG)
            gi = blk_base + si.astype(jnp.float32)
            tmask = gi < tlens
            H, E, bestH, bestI = _sw_step(
                H, E, bestH, bestI, s, gi, tmask, qmask, jidx,
                fg, ext, roll_fn)
            blk = pltpu.roll(blk, shift=127, axis=1)
            return (H, E, bestH, bestI, blk)

        H, E, bestH, bestI, _ = jax.lax.fori_loop(
            0, 128, inner, (H, E, bestH, bestI, blk0))
        return (H, E, bestH, bestI)

    carry = (H_s[:], E_s[:], bH_s[:], bI_s[:])
    H, E, bestH, bestI = jax.lax.fori_loop(0, TT // 128, outer, carry)
    H_s[:], E_s[:], bH_s[:], bI_s[:] = H, E, bestH, bestI

    @pl.when(tt == n_tt - 1)
    def _():
        score, tend, qend = _finalize(bH_s[:], bI_s[:], qmask, jidx)
        score_ref[:] = score[:, None]
        tend_ref[:] = tend[:, None]
        qend_ref[:] = qend[:, None]


def _pad_to(x, n, fill):
    if x.shape[0] == n:
        return x
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=fill)


@functools.partial(jax.jit,
                   static_argnames=('match', 'mismatch', 'fg', 'ext', 'BT', 'TT'))
def _sw_pallas(q, t, qlens, tlens, *, match, mismatch, fg, ext,
               BT=DEF_BT, TT=DEF_TT):
    # int8 narrow dynamic slices are unsupported by Mosaic; widen to
    # int32 ON DEVICE (inputs stay uint8 so host->device transfer is 4x
    # smaller over the TPU tunnel).
    q = q.astype(jnp.int32)
    t = t.astype(jnp.int32)
    B0, T0 = t.shape
    B = pad_rows_pow2(B0, BT)
    T = ((T0 + TT - 1) // TT) * TT
    q = _pad_to(q, B, 4)
    t = jnp.pad(t, [(0, B - B0), (0, T - T0)], constant_values=4)
    qlens = _pad_to(qlens.astype(jnp.int32)[:, None], B, 1)
    tlens = _pad_to(tlens.astype(jnp.int32)[:, None], B, 0)
    if q.shape[1] != QP:
        q = jnp.pad(q, [(0, 0), (0, QP - q.shape[1])], constant_values=4)

    kernel = functools.partial(_sw_kernel, TT=TT, match=match,
                               mismatch=mismatch, fg=fg, ext=ext)
    grid = (B // BT, T // TT)
    score, tend, qend = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BT, QP), lambda b, s: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, TT), lambda b, s: (b, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 1), lambda b, s: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 1), lambda b, s: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BT, 1), lambda b, s: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 1), lambda b, s: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 1), lambda b, s: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BT, QP), jnp.float32),
            pltpu.VMEM((BT, QP), jnp.float32),
            pltpu.VMEM((BT, QP), jnp.float32),
            pltpu.VMEM((BT, QP), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=30 * B * T * QP, bytes_accessed=B * (T + QP) * 4,
            transcendentals=0),
    )(q, t, qlens, tlens)
    return score[:B0, 0], tend[:B0, 0], qend[:B0, 0]


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def _use_pallas(backend: str | None) -> bool:
    if backend == 'pallas':
        return True
    if backend == 'jax':
        return False
    return jax.default_backend() == 'tpu'


def sw_max(queries, targets, qlens, tlens, scoring: ScoringConfig,
           backend: str | None = None):
    """Best local alignment of queries[b] vs targets[b] for every batch row.

    Args:
      queries: (B, <=128) uint8 codes (padded with 4/N).
      targets: (B, T) uint8 codes.
      qlens, tlens: (B,) int32 true lengths.
    Returns:
      (score f32, target_end i32, query_end i32), each (B,); end positions are
      0-based inclusive (ssw ``target_end_optimal`` convention); score 0 rows
      report ends of 0.
    """
    q = jnp.asarray(queries, jnp.uint8)
    t = jnp.asarray(targets, jnp.uint8)
    if q.shape[1] < QP:
        q = jnp.pad(q, [(0, 0), (0, QP - q.shape[1])], constant_values=4)
    kw = dict(match=float(scoring.match), mismatch=float(scoring.mismatch),
              fg=first_gap_cost(scoring), ext=float(scoring.gap_extend))
    qlens = jnp.asarray(qlens, jnp.int32)
    tlens = jnp.asarray(tlens, jnp.int32)
    if backend == 'pallas_interpret':
        with pltpu.force_tpu_interpret_mode():
            return _sw_pallas(q, t, qlens, tlens, **kw)
    fn = _sw_pallas if _use_pallas(backend) else _sw_jax
    return fn(q, t, qlens, tlens, **kw)


@functools.partial(jax.jit, static_argnames=())
def _reverse_prefix(x, ends, pad_val):
    """out[b, i] = x[b, ends[b] - i] for i <= ends[b], else pad."""
    B, L = x.shape
    idx = ends[:, None] - jnp.arange(L)[None, :]
    valid = idx >= 0
    gathered = jnp.take_along_axis(x, jnp.clip(idx, 0, L - 1), axis=1)
    return jnp.where(valid, gathered, pad_val)


def sw_locate(queries, targets, qlens, tlens, scoring: ScoringConfig,
              backend: str | None = None):
    """Like :func:`sw_max` but also recovers alignment begins ssw-style:
    a second pass aligns reversed prefixes ending at the optimum
    (begin = end - reverse_end).  Returns dict of (B,) arrays:
    score, target_begin, target_end, query_begin, query_end.
    """
    q = jnp.asarray(queries, jnp.uint8)
    t = jnp.asarray(targets, jnp.uint8)
    score, tend, qend = sw_max(q, t, qlens, tlens, scoring, backend)
    rq = _reverse_prefix(q, qend, jnp.uint8(4))
    rt = _reverse_prefix(t, tend, jnp.uint8(4))
    rscore, rtend, rqend = sw_max(rq, rt, qend + 1, tend + 1, scoring, backend)
    none = score <= 0.0
    tbegin = jnp.where(none, 0, tend - rtend)
    qbegin = jnp.where(none, 0, qend - rqend)
    return {
        'score': score,
        'target_begin': tbegin.astype(jnp.int32),
        'target_end': tend.astype(jnp.int32),
        'query_begin': qbegin.astype(jnp.int32),
        'query_end': qend.astype(jnp.int32),
    }


# ---------------------------------------------------------------------------
# Lane-packed variant: several short queries per 128-lane row
# ---------------------------------------------------------------------------
#
# The concatemer scan aligns every ~21 bp primer (forward + revcomp)
# against the same 10 kb read window (filter_junk_from_fq.py:82-104
# semantics) — one row per primer wastes 107/128 lanes and re-streams the
# window per primer.  Here up to 128//stride primers pack into one row at
# fixed lane strides; segments are isolated inside the DP:
#
#   * the diagonal predecessor is reset to 0 at segment-start lanes
#     (each primer starts its own local alignment);
#   * the lane prefix-max that implements lazy-F gets + seg * SEG_BIG
#     added before and subtracted after, so a query-gap can never cross a
#     segment boundary (cross-segment contributions are -SEG_BIG lower).
#
# All DP values stay integer-valued and < 2^24, so f32 stays exact.
# Returns the row-global max — exactly the "any primer scores >= t"
# predicate the scan consumes.

SEG_BIG = 1.0e6


def _sw_step_packed(H, E, bestH, bestI, s, i_idx, tmask, lane_valid,
                    segf, seg_start, jidx, fg, ext, roll_fn):
    E = jnp.maximum(E - ext, H - fg)
    diag = _shift_right(H, 1, 0.0, roll_fn, jidx)
    diag = jnp.where(seg_start, 0.0, diag)
    Hno = jnp.maximum(jnp.maximum(diag + s, E), 0.0)
    Cm = _cummax_exclusive(Hno + jidx * ext + segf * SEG_BIG, roll_fn, jidx)
    F = Cm - segf * SEG_BIG - fg - (jidx - 1.0) * ext
    H = jnp.maximum(Hno, F)
    upd = (H > bestH) & tmask & lane_valid
    bestH = jnp.where(upd, H, bestH)
    bestI = jnp.where(upd, i_idx, bestI)
    return H, E, bestH, bestI


@functools.partial(jax.jit,
                   static_argnames=('match', 'mismatch', 'fg', 'ext',
                                    'stride'))
def _sw_packed_jax(q, t, tlens, *, match, mismatch, fg, ext, stride):
    B, T = t.shape
    jidx = jnp.broadcast_to(jnp.arange(QP, dtype=jnp.float32)[None, :],
                            (B, QP))
    segf = jnp.floor(jidx / float(stride))
    seg_start = jnp.mod(jidx, float(stride)) == 0.0
    roll_fn = lambda x, d: jnp.roll(x, d, axis=1)
    q = q.astype(jnp.int32)
    lane_valid = q < 4

    def step(carry, inp):
        H, E, bestH, bestI = carry
        tcol, i = inp
        tcol = tcol[:, None]
        eq = (q == tcol) & lane_valid & (tcol < 4)
        s = jnp.where(eq, float(match), float(mismatch))
        s = jnp.where(lane_valid, s, NEG)
        tmask = (i < tlens)[:, None]
        H, E, bestH, bestI = _sw_step_packed(
            H, E, bestH, bestI, s, jnp.float32(i), tmask, lane_valid,
            segf, seg_start, jidx, fg, ext, roll_fn)
        return (H, E, bestH, bestI), None

    zeros = jnp.zeros((B, QP), jnp.float32)
    init = (zeros, jnp.full((B, QP), NEG), jnp.full((B, QP), NEG), zeros)
    (H, E, bestH, bestI), _ = jax.lax.scan(
        step, init, (t.astype(jnp.int32).T, jnp.arange(T)), unroll=4)
    return _finalize(bestH, bestI, lane_valid, jidx)


def _sw_packed_kernel(q_ref, t_ref, tlen_ref,
                      score_ref, tend_ref, qend_ref,
                      H_s, E_s, bH_s, bI_s,
                      *, TT, match, mismatch, fg, ext, stride):
    BT = q_ref.shape[0]
    tt = pl.program_id(1)
    n_tt = pl.num_programs(1)
    jidx = jax.lax.broadcasted_iota(jnp.int32, (BT, QP), 1) \
        .astype(jnp.float32)
    segf = jnp.floor(jidx / float(stride))
    seg_start = jnp.mod(jidx, float(stride)) == 0.0
    tlens = tlen_ref[:].astype(jnp.float32)
    roll_fn = lambda x, d: pltpu.roll(x, shift=d, axis=1)

    @pl.when(tt == 0)
    def _():
        H_s[:] = jnp.zeros((BT, QP), jnp.float32)
        E_s[:] = jnp.full((BT, QP), NEG, jnp.float32)
        bH_s[:] = jnp.full((BT, QP), NEG, jnp.float32)
        bI_s[:] = jnp.zeros((BT, QP), jnp.float32)

    q = q_ref[:]
    lane_valid = q < 4
    base_i = jnp.float32(tt * TT)

    def outer(b, carry):
        H, E, bestH, bestI = carry
        off = pl.multiple_of(b * 128, 128)
        blk0 = t_ref[:, pl.ds(off, 128)]
        blk_base = base_i + (b * 128).astype(jnp.float32)

        def inner(si, c2):
            H, E, bestH, bestI, blk = c2
            tcol = blk[:, 0:1]
            eq = (q == tcol) & lane_valid & (tcol < 4)
            s = jnp.where(eq, float(match), float(mismatch))
            s = jnp.where(lane_valid, s, NEG)
            gi = blk_base + si.astype(jnp.float32)
            tmask = gi < tlens
            H, E, bestH, bestI = _sw_step_packed(
                H, E, bestH, bestI, s, gi, tmask, lane_valid, segf,
                seg_start, jidx, fg, ext, roll_fn)
            blk = pltpu.roll(blk, shift=127, axis=1)
            return (H, E, bestH, bestI, blk)

        H, E, bestH, bestI, _ = jax.lax.fori_loop(
            0, 128, inner, (H, E, bestH, bestI, blk0))
        return (H, E, bestH, bestI)

    carry = (H_s[:], E_s[:], bH_s[:], bI_s[:])
    H, E, bestH, bestI = jax.lax.fori_loop(0, TT // 128, outer, carry)
    H_s[:], E_s[:], bH_s[:], bI_s[:] = H, E, bestH, bestI

    @pl.when(tt == n_tt - 1)
    def _():
        score, tend, qend = _finalize(bH_s[:], bI_s[:], q_ref[:] < 4, jidx)
        score_ref[:] = score[:, None]
        tend_ref[:] = tend[:, None]
        qend_ref[:] = qend[:, None]


@functools.partial(jax.jit,
                   static_argnames=('match', 'mismatch', 'fg', 'ext',
                                    'stride', 'BT', 'TT'))
def _sw_packed_pallas(q, t, tlens, *, match, mismatch, fg, ext, stride,
                      BT=DEF_BT, TT=DEF_TT):
    q = q.astype(jnp.int32)
    t = t.astype(jnp.int32)
    B0, T0 = t.shape
    B = pad_rows_pow2(B0, BT)
    T = ((T0 + TT - 1) // TT) * TT
    q = _pad_to(q, B, 4)
    t = jnp.pad(t, [(0, B - B0), (0, T - T0)], constant_values=4)
    tlens = _pad_to(tlens.astype(jnp.int32)[:, None], B, 0)
    if q.shape[1] != QP:
        q = jnp.pad(q, [(0, 0), (0, QP - q.shape[1])], constant_values=4)
    kernel = functools.partial(_sw_packed_kernel, TT=TT, match=match,
                               mismatch=mismatch, fg=fg, ext=ext,
                               stride=stride)
    score, tend, qend = pl.pallas_call(
        kernel,
        grid=(B // BT, T // TT),
        in_specs=[
            pl.BlockSpec((BT, QP), lambda b, s: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, TT), lambda b, s: (b, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 1), lambda b, s: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BT, 1), lambda b, s: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 1), lambda b, s: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 1), lambda b, s: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BT, QP), jnp.float32),
            pltpu.VMEM((BT, QP), jnp.float32),
            pltpu.VMEM((BT, QP), jnp.float32),
            pltpu.VMEM((BT, QP), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=30 * B * T * QP, bytes_accessed=B * (T + QP) * 4,
            transcendentals=0),
    )(q, t, tlens)
    return score[:B0, 0], tend[:B0, 0], qend[:B0, 0]


def pack_queries(code_lists, stride: int):
    """Pack short query code arrays into (n_rows, 128) at ``stride`` lane
    offsets.  Returns (rows uint8, row_of, lane_seg_of) where
    row_of[i]/lane_seg_of[i] locate query i."""
    per_row = QP // stride
    n_rows = (len(code_lists) + per_row - 1) // per_row
    rows = np.full((max(n_rows, 1), QP), 4, np.uint8)
    row_of = np.zeros(len(code_lists), np.int32)
    seg_of = np.zeros(len(code_lists), np.int32)
    for i, c in enumerate(code_lists):
        if len(c) > stride:
            raise ValueError(f'query {i} longer than stride {stride}')
        r, g = divmod(i, per_row)
        rows[r, g * stride:g * stride + len(c)] = c
        row_of[i] = r
        seg_of[i] = g
    return rows, row_of, seg_of


def sw_max_packed(queries, targets, tlens, scoring: ScoringConfig,
                  stride: int, backend: str | None = None):
    """Row-global best score over all packed queries vs targets[b].
    ``queries`` (B, 128) uint8 with one query per ``stride``-lane segment
    (pad 4).  Returns (score, target_end, lane_of_best)."""
    q = jnp.asarray(queries, jnp.uint8)
    t = jnp.asarray(targets, jnp.uint8)
    if q.shape[1] < QP:
        q = jnp.pad(q, [(0, 0), (0, QP - q.shape[1])], constant_values=4)
    kw = dict(match=float(scoring.match), mismatch=float(scoring.mismatch),
              fg=first_gap_cost(scoring), ext=float(scoring.gap_extend),
              stride=stride)
    tlens = jnp.asarray(tlens, jnp.int32)
    if backend == 'pallas_interpret':
        with pltpu.force_tpu_interpret_mode():
            return _sw_packed_pallas(q, t, tlens, **kw)
    fn = _sw_packed_pallas if _use_pallas(backend) else _sw_packed_jax
    return fn(q, t, tlens, **kw)
