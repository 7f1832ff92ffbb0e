"""Repetitive-genome recall (round-3 verdict item 6).

Planted-truth validation on UNIQUE sequence lives in
test_planted_truth.py; this file stresses seeding recall where bwa's
occurrence heuristics matter most (bwa -c 1000 drops seeds with more
occurrences, /root/reference/fslr/main.py:125): fusion reads whose
anchor segments sit inside tandem-duplicated loci (5-50 copies of a
~2 kb unit), so every seed inside the anchor has copy-count
occurrences and the adaptive per-seed occurrence cap + occ_drop
sampling (stages/align.py, AlignConfig.max_kmer_occ / occ_drop) are
actually exercised.

Recall criterion: a tandem-duplicated anchor is unplaceable between
copies (bwa reports an arbitrary copy at MAPQ 0), so an anchor counts
as recovered when a selected alignment on the right strand covers its
query span inside the duplicated locus at the planted offset MODULO
the unit length; the unique mate segment must still be recovered at
its exact position (the breakpoint side that fusion calling anchors
on).
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
UNIT = 2000         # tandem unit length
NOISE = dict(sub=0.03, indel=0.01)


def _make_ref(rng, n_copies):
    """chr1 = random flank + n_copies tandem copies of a 2 kb unit +
    random flank; chr2 = unique sequence."""
    unit = random_seq(rng, UNIT)
    flank_l = random_seq(rng, 30_000)
    flank_r = random_seq(rng, 30_000)
    chr1 = np.concatenate([flank_l] + [unit] * n_copies + [flank_r])
    chr2 = random_seq(rng, 60_000)
    lengths = np.array([len(chr1), len(chr2)], np.int64)
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    ref = Reference(names=['chr1', 'chr2'], lengths=lengths,
                    offsets=offsets,
                    codes=np.concatenate([chr1, chr2]))
    locus = (len(flank_l), len(flank_l) + n_copies * UNIT)
    return ref, build_seed_index(ref, k=CONFIG.align.seed_k), locus


def _plant(rng, ref, locus, n_reads):
    """Reads = [tandem anchor][unique chr2 segment][tandem anchor].

    Truth per read: (anchor1, unique, anchor2) with
    anchor = ('anchor', offset_mod_unit, q0, q1, strand_rev) — q0/q1 the
    anchor's query span in the final (mutated) read — and
    unique = ('unique', start, end, strand_rev) on chr2."""
    lo1 = int(ref.offsets[0])
    lo2 = int(ref.offsets[1])
    seqs, truths = [], []
    for _ in range(n_reads):
        parts, truth = [], []
        q = 0
        for side in range(2):
            a_len = int(rng.integers(700, 1500))
            a_start = int(rng.integers(locus[0],
                                       locus[1] - a_len))
            seg = ref.codes[lo1 + a_start:lo1 + a_start + a_len]
            rev = bool(rng.integers(0, 2))
            if rev:
                seg = revcomp(seg)
            if side == 0:
                m = mutate(rng, seg, **NOISE)
                parts.append(m)
                truth.append(('anchor', (a_start - locus[0]) % UNIT,
                              q, q + len(m), rev))
                q += len(m)
            else:
                u_len = int(rng.integers(700, 1500))
                u_start = int(rng.integers(0,
                                           int(ref.lengths[1]) - u_len))
                u_seg = ref.codes[lo2 + u_start:lo2 + u_start + u_len]
                u_rev = bool(rng.integers(0, 2))
                if u_rev:
                    u_seg = revcomp(u_seg)
                m = mutate(rng, u_seg, **NOISE)
                parts.append(m)
                truth.append(('unique', u_start, u_start + u_len, u_rev))
                q += len(m)
                m = mutate(rng, seg, **NOISE)
                parts.append(m)
                truth.append(('anchor', (a_start - locus[0]) % UNIT,
                              q, q + len(m), rev))
                q += len(m)
        seqs.append(decode(np.concatenate(parts)))
        truths.append(truth)
    return seqs, truths


def _recall(out, truths, locus, tol=60, min_cov=0.85):
    """(anchor_recovered, unique_recovered) boolean arrays.

    An anchor is unplaceable BETWEEN copies, and a placement at the
    array's last copy legitimately wraps: the aligner splits it into a
    piece at the array end plus a piece at the array start (both
    modulo-unit consistent).  So an anchor counts as recovered when
    modulo-consistent pieces on the right strand inside the locus cover
    >= min_cov of its query span."""
    by_read: dict[int, list] = {}
    for i in range(len(out)):
        by_read.setdefault(int(out.read_idx[i]), []).append(i)
    anchor_ok, unique_ok = [], []
    for ridx, truth in enumerate(truths):
        alns = by_read.get(ridx, [])
        for t in truth:
            if t[0] == 'unique':
                _, start, end, rev = t
                hit = any(
                    int(out.chrom_idx[i]) == 1
                    and bool(out.strand_rev[i]) == rev
                    and abs(int(out.rstart[i]) - start) <= tol
                    and abs(int(out.rend[i]) + 1 - end) <= tol
                    for i in alns)
                unique_ok.append(hit)
                continue
            _, off_mod, q0, q1, rev_p = t
            covered = []
            for i in alns:
                if int(out.chrom_idx[i]) != 0:
                    continue
                if bool(out.strand_rev[i]) != rev_p:
                    continue
                rs, re = int(out.rstart[i]), int(out.rend[i]) + 1
                if rs < locus[0] - tol or re > locus[1] + tol:
                    continue
                qlen = int(out.qlen[i])
                if rev_p:
                    qs = qlen - int(out.qend_o[i])
                    qe = qlen - int(out.qstart_o[i])
                else:
                    qs, qe = int(out.qstart_o[i]), int(out.qend_o[i])
                lo = max(qs, q0)
                hi = min(qe, q1)
                if hi - lo < 50:
                    continue
                # modulo-unit placement consistency at the piece start
                if rev_p:
                    expect = off_mod + (q1 - qe)
                else:
                    expect = off_mod + (qs - q0)
                d = (rs - locus[0] - expect) % UNIT
                if min(d, UNIT - d) > tol:
                    continue
                covered.append((lo, hi))
            cov = 0
            last = -1
            for lo, hi in sorted(covered):
                lo = max(lo, last)
                if hi > lo:
                    cov += hi - lo
                    last = hi
            anchor_ok.append(cov >= min_cov * (q1 - q0))
    return np.asarray(anchor_ok), np.asarray(unique_ok)


@pytest.mark.parametrize('n_copies,min_recall', [(5, 0.99), (10, 0.99),
                                                 (50, 0.99)])
def test_tandem_duplicated_anchor_recall(n_copies, min_recall):
    rng = np.random.default_rng(9000 + n_copies)
    ref, sidx, locus = _make_ref(rng, n_copies)
    seqs, truths = _plant(rng, ref, locus, n_reads=14)
    out = align_stage.align_batch(seqs, ref, sidx, CONFIG, backend='jax')
    anchor_ok, unique_ok = _recall(out, truths, locus)
    a_recall = anchor_ok.mean()
    u_recall = unique_ok.mean()
    print(f'\n[repetitive] copies={n_copies}: anchor recall '
          f'{a_recall:.3f} ({anchor_ok.sum()}/{anchor_ok.size}), unique '
          f'recall {u_recall:.3f} ({unique_ok.sum()}/{unique_ok.size})',
          file=sys.stderr)
    assert a_recall >= min_recall, (
        f'anchor recall {a_recall:.3f} < {min_recall} at '
        f'{n_copies} copies')
    assert u_recall == 1.0, (
        f'unique-segment recall {u_recall:.3f} < 1.0 at '
        f'{n_copies} copies')


def test_occ_cap_is_active_at_50_copies():
    """The 50-copy locus must actually push seeds past the adaptive
    occurrence cap — otherwise the recall sweep above isn't testing the
    sampling heuristics at all."""
    rng = np.random.default_rng(77_50)
    ref, sidx, locus = _make_ref(rng, 50)
    # count occurrences of a k-mer from the middle of the unit
    k = CONFIG.align.seed_k
    probe = ref.codes[locus[0] + UNIT // 2:
                      locus[0] + UNIT // 2 + k].astype(np.int64)
    key = 0
    for c in probe:
        key = key * 4 + int(c)
    occ = int(sidx.counts[key + 1] - sidx.counts[key])
    assert occ >= 45, occ
    assert occ > CONFIG.align.max_kmer_occ
