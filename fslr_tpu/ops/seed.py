"""Device seeding + diagonal candidate generation for the aligner.

Replaces bwa mem's FM-index SMEM seeding + chaining
(/root/reference/fslr/main.py:125, flags -k 11 -c 1000 -r 1.25 -D 0.25)
with a TPU-native design: exact k-mer lookups against the host-built sorted
index (index/reference.py) are pure gathers; "chaining" becomes diagonal
density-peak selection with non-max suppression — for each read, hits
(qpos, rpos) are sorted by diagonal d = rpos - qpos, a windowed density is
computed per hit (cumsum + searchsorted), and up to ``max_candidates``
diagonal bands are peeled off greedily, suppressing hits within 2x the band
width.  Every step is fixed-shape vector work; no data-dependent loops.

This is not a transcription of bwa's heuristics: parity is targeted at the
*selection* level (SURVEY.md section 7, hard part 1) — candidate bands must
contain the true split segments, which exact-k-mer density peaks achieve
for amplicon reads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIG = 2 ** 30


@functools.partial(
    jax.jit,
    static_argnames=('k', 'stride', 'occ_drop', 'band_w', 'max_cand', 'S',
                     'C'))
def seed_candidates(reads, lens, counts, positions, *, k, stride,
                    occ_drop, band_w, max_cand, S, C):
    """Find candidate diagonal bands for each read (one strand).

    Args:
      reads: (B, L) uint8 codes (the strand to align: forward or revcomp).
      lens:  (B,) int32.
      counts: (4^k + 1,) int32/int64 cumulative k-mer offsets.
      positions: (N,) int32 global reference positions, k-mer sorted.
      S: number of sampled query positions (static; = (L - k)//stride + 1).
      C: per-seed occurrence cap (static).
    Returns dict of (B, max_cand) arrays: diag, count, qmin, qmax, rmin,
      rmax, valid.
    """
    B, L = reads.shape
    reads = reads.astype(jnp.int32)
    qpos = jnp.arange(S, dtype=jnp.int32) * stride            # (S,)

    # rolling k-mer codes at sampled positions
    code = jnp.zeros((B, S), jnp.int32)
    valid = jnp.ones((B, S), jnp.bool_)
    for p in range(k):
        col = reads[:, p:p + (S - 1) * stride + 1:stride]
        col = col[:, :S]
        code = code * 4 + jnp.where(col < 4, col, 0)
        valid &= col < 4
    valid &= (qpos[None, :] + k) <= lens[:, None]

    counts = counts.astype(jnp.int32)
    start = counts[code]                                       # (B, S)
    occ = counts[code + 1] - start
    valid &= (occ > 0) & (occ <= occ_drop)                     # bwa -c analog
    use = jnp.minimum(occ, C)

    # evenly sample occ_cap hits from each seed's occurrence list
    cidx = jnp.arange(C, dtype=jnp.int32)                      # (C,)
    take = start[:, :, None] + jnp.where(
        occ[:, :, None] > C,
        (cidx[None, None, :] * occ[:, :, None]) // C,
        cidx[None, None, :])
    hit_valid = valid[:, :, None] & (cidx[None, None, :] < use[:, :, None])
    rpos = positions.astype(jnp.int32)[jnp.clip(take, 0, len(positions) - 1)]
    diag = rpos - qpos[None, :, None]                          # (B, S, C)

    M = S * C
    diag = diag.reshape(B, M)
    hq = jnp.broadcast_to(qpos[None, :, None], (B, S, C)).reshape(B, M)
    hr = rpos.reshape(B, M)
    hv = hit_valid.reshape(B, M)

    diag_s = jnp.where(hv, diag, BIG)
    order = jnp.argsort(diag_s, axis=1)
    diag_s = jnp.take_along_axis(diag_s, order, axis=1)
    hq = jnp.take_along_axis(hq, order, axis=1)
    hr = jnp.take_along_axis(hr, order, axis=1)
    hv = jnp.take_along_axis(hv, order, axis=1)

    # windowed density: hits within (d - band_w, d]
    lo = jax.vmap(lambda row, v: jnp.searchsorted(row, v, side='left'))(
        diag_s, diag_s - band_w)                               # (B, M)
    idx = jnp.arange(M, dtype=jnp.int32)

    alive = hv
    out = {n: [] for n in ('diag', 'count', 'qmin', 'qmax', 'rmin', 'rmax',
                           'valid')}
    for _ in range(max_cand):
        cum = jnp.cumsum(alive.astype(jnp.int32), axis=1)
        cum0 = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), cum], axis=1)
        dens = cum - jnp.take_along_axis(cum0, lo, axis=1)
        dens = jnp.where(alive, dens, 0)
        j = jnp.argmax(dens, axis=1)                           # (B,)
        d0 = jnp.take_along_axis(diag_s, j[:, None], axis=1)   # (B, 1)
        sel = alive & (jnp.abs(diag_s - d0) <= band_w)
        cnt = jnp.sum(sel, axis=1)
        qmin = jnp.min(jnp.where(sel, hq, BIG), axis=1)
        qmax = jnp.max(jnp.where(sel, hq + k, -1), axis=1)
        rmin = jnp.min(jnp.where(sel, hr, BIG), axis=1)
        rmax = jnp.max(jnp.where(sel, hr + k, -1), axis=1)
        # median-ish anchor diagonal: mean of selected diagonals
        dsum = jnp.sum(jnp.where(sel, diag_s, 0), axis=1)
        danchor = jnp.where(cnt > 0, dsum // jnp.maximum(cnt, 1), 0)
        out['diag'].append(danchor)
        out['count'].append(cnt)
        out['qmin'].append(qmin)
        out['qmax'].append(qmax)
        out['rmin'].append(rmin)
        out['rmax'].append(rmax)
        out['valid'].append(cnt > 0)
        alive = alive & (jnp.abs(diag_s - d0) > 2 * band_w)
    return {n: jnp.stack(v, axis=1) for n, v in out.items()}
