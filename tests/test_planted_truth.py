"""Planted-truth alignment validation (round-1 verdict item 3).

The golden snapshot pins this engine's *own* output, which catches
regressions but not wrongness.  These tests plant synthetic split reads
with KNOWN segment coordinates (chrom, start, end, strand per segment)
and sweep substitution/indel noise through the nanopore range, then
assert on the full seed -> chain -> extend -> select stage
(fslr_tpu/stages/align.py — the bwa mem | dodi replacement,
/root/reference/fslr/main.py:125,137):

  * segment recall — every planted segment must be recovered by a
    selected alignment on the right chrom/strand at the right place;
  * breakpoint position error — recovered segment boundaries must land
    within a few bases of the planted coordinates (fusion calling
    clusters on these boundary intervals, so their accuracy is the
    product's accuracy);
  * seeding sensitivity — each planted segment must retain enough seed
    support to form a candidate (guards the stride / occurrence-cap
    heuristics against silent sensitivity regressions).
"""

import sys

import numpy as np
import pytest

from fslr_tpu.config import PipelineConfig
from fslr_tpu.encode import decode, revcomp
from fslr_tpu.index.reference import Reference, build_seed_index
from fslr_tpu.stages import align as align_stage
from tests.oracles import mutate, random_seq

CONFIG = PipelineConfig()

# (sub_rate, indel_rate, end_tolerance_bp, min_recall)
SWEEP = [
    (0.03, 0.01, 12, 1.00),    # high-accuracy nanopore (R10 duplex-ish)
    (0.06, 0.03, 20, 0.99),    # typical simplex
    (0.10, 0.05, 30, 0.95),    # noisy tail
]


@pytest.fixture(scope='module')
def planted_ref():
    rng = np.random.default_rng(20260820)
    sizes = [60_000, 50_000]
    names = ['chr1', 'chr2']
    parts = [random_seq(rng, s) for s in sizes]
    lengths = np.array(sizes, dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    ref = Reference(names=names, lengths=lengths, offsets=offsets,
                    codes=np.concatenate(parts))
    return ref, build_seed_index(ref, k=CONFIG.align.seed_k)


def _plant_reads(rng, ref, n_reads, sub, indel):
    """Build split reads of 2-3 segments with known truth.

    Returns (seqs, truths) where truths[i] is a list of
    (chrom_idx, start, end_exclusive, strand_rev) per planted segment.
    Segments are drawn >=2 kb apart so one segment cannot satisfy two
    truth entries.
    """
    seqs, truths = [], []
    for _ in range(n_reads):
        n_seg = int(rng.integers(2, 4))
        truth = []
        parts = []
        for s in range(n_seg):
            seg_len = int(rng.integers(600, 1400))
            while True:
                ci = int(rng.integers(0, len(ref.names)))
                start = int(rng.integers(0,
                                         int(ref.lengths[ci]) - seg_len))
                # segments of one read stay >=3 kb apart so an alignment
                # can only satisfy its own truth entry (no merges or
                # ambiguous matches)
                if all(tc != ci or abs(start - ts) >= 3000
                       for (tc, ts, _, _) in truth):
                    break
            lo = int(ref.offsets[ci])
            seg = ref.codes[lo + start:lo + start + seg_len]
            strand_rev = bool(rng.integers(0, 2))
            if strand_rev:
                seg = revcomp(seg)
            parts.append(mutate(rng, seg, sub=sub, indel=indel))
            truth.append((ci, start, start + seg_len, strand_rev))
        seqs.append(decode(np.concatenate(parts)))
        truths.append(truth)
    return seqs, truths


def _match_segments(out, truths, tol):
    """Per planted segment: recovered flag + max boundary error (bp)."""
    by_read: dict[int, list] = {}
    for i in range(len(out)):
        by_read.setdefault(int(out.read_idx[i]), []).append(i)
    recovered, errors = [], []
    for ridx, truth in enumerate(truths):
        alns = by_read.get(ridx, [])
        for (ci, start, end, strand_rev) in truth:
            best = None
            for i in alns:
                if int(out.chrom_idx[i]) != ci:
                    continue
                if bool(out.strand_rev[i]) != strand_rev:
                    continue
                # rstart/rend are 0-based inclusive contig-local
                e = max(abs(int(out.rstart[i]) - start),
                        abs(int(out.rend[i]) + 1 - end))
                if best is None or e < best:
                    best = e
            recovered.append(best is not None and best <= tol)
            errors.append(best if best is not None else -1)
    return np.array(recovered), np.array(errors)


@pytest.mark.parametrize('sub,indel,tol,min_recall', SWEEP)
def test_planted_segment_recall(planted_ref, sub, indel, tol, min_recall):
    ref, sidx = planted_ref
    rng = np.random.default_rng(int(sub * 1000) + int(indel * 100))
    seqs, truths = _plant_reads(rng, ref, n_reads=16, sub=sub, indel=indel)
    out = align_stage.align_batch(seqs, ref, sidx, CONFIG, backend='jax')
    recovered, errors = _match_segments(out, truths, tol)
    recall = recovered.mean()
    hit_err = errors[(errors >= 0) & recovered]
    print(f'\n[planted-truth] sub={sub} indel={indel}: '
          f'recall={recall:.4f} ({recovered.sum()}/{recovered.size} '
          f'segments), boundary error median='
          f'{np.median(hit_err) if hit_err.size else -1:.1f}bp '
          f'p95={np.percentile(hit_err, 95) if hit_err.size else -1:.1f}bp',
          file=sys.stderr)
    assert recall >= min_recall, (
        f'segment recall {recall:.4f} < {min_recall} at '
        f'sub={sub} indel={indel} (recovered {recovered.sum()} of '
        f'{recovered.size})')
    # breakpoint accuracy: median boundary error stays within a few bases
    assert np.median(hit_err) <= 6, np.median(hit_err)


def test_breakpoint_error_low_noise(planted_ref):
    """At near-clean noise the selected boundaries must be near-exact —
    the cluster stage builds Jaccard intervals straight from these."""
    ref, sidx = planted_ref
    rng = np.random.default_rng(99)
    seqs, truths = _plant_reads(rng, ref, n_reads=12, sub=0.01, indel=0.005)
    out = align_stage.align_batch(seqs, ref, sidx, CONFIG, backend='jax')
    # tol=12: a substitution in the last ~5 bases of a segment legally
    # erodes the local-alignment end by up to ~2x the mismatch/match
    # ratio (bwa behaves identically); observed worst case is 11 bp
    recovered, errors = _match_segments(out, truths, tol=12)
    print(f'\n[planted-truth] low-noise boundary errors (desc): '
          f'{sorted(errors.tolist(), reverse=True)[:8]}', file=sys.stderr)
    assert recovered.all(), (
        f'{(~recovered).sum()} of {recovered.size} segments missed at '
        f'1% noise; errors={sorted(errors.tolist(), reverse=True)[:8]}')
    hit_err = errors[errors >= 0]
    assert np.median(hit_err) <= 3, np.median(hit_err)
    assert hit_err.max() <= 12, hit_err.max()


def test_seeding_sensitivity(planted_ref):
    """Every planted segment must produce a candidate band BEFORE
    extension/selection — isolates seeding+chaining sensitivity from
    selection behavior, so a stride/occ-cap regression is attributed
    correctly."""
    ref, sidx = planted_ref
    rng = np.random.default_rng(7)
    seqs, truths = _plant_reads(rng, ref, n_reads=12, sub=0.08, indel=0.04)
    from fslr_tpu.encode import encode_cat
    cat, off = encode_cat(seqs)
    cands = align_stage._seed_rows(cat, off, ref, sidx, CONFIG,
                                   backend='jax')
    cands = align_stage._chain_filter(cands, np.diff(off), CONFIG)
    cand_rows = list(zip(cands.ridx, cands.srev, cands.dga, cands.cnt,
                         cands.qmn, cands.qmx))
    # candidate coverage per read in query space
    got = 0
    tot = 0
    for ridx, truth in enumerate(truths):
        # reverse-strand candidates carry query coords on the revcomp'd
        # read, so the planted midpoint must be mirrored for them
        L = len(seqs[ridx])
        spans = [(srev, qmn, qmx) for (ri, srev, dga, cnt, qmn, qmx)
                 in cand_rows if ri == ridx]
        qoff = 0
        for (ci, start, end, strand_rev) in truth:
            seg_len = end - start
            mid = qoff + seg_len // 2
            tot += 1
            if any(qmn <= ((L - 1 - mid) if srev else mid) <= qmx
                   for (srev, qmn, qmx) in spans):
                got += 1
            qoff += seg_len
    sens = got / tot
    print(f'\n[planted-truth] seeding sensitivity at 8%/4% noise: '
          f'{sens:.4f} ({got}/{tot}); stride='
          f'{CONFIG.align.seed_stride} k={CONFIG.align.seed_k}',
          file=sys.stderr)
    assert sens >= 0.98, sens
