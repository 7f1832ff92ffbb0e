"""Differential oracles for the junk-filter and primer-stage DECISION
logic, head-to-head against the reference's own code (round-4 verdict
item: these stages rested on hand-written mirror tests while clustering
and the mapping table had real vendored oracles).

The reference logic below is vendored VERBATIM-in-structure from
/root/reference/fslr/filter_junk_from_fq.py:15-183 and
/root/reference/fslr/find_reads_with_primers.py:48-117, with three
sanctioned substitutions (each keeps the decision semantics identical):

  1. StripedSmithWaterman is replaced by ``_ShimSSW`` backed by THIS
     repo's ssw kernel (ops/ssw.sw_locate) so both sides consume the
     same alignment scores — the kernel itself has its own oracle
     (tests/test_ssw.py); here only the decision logic is on trial.
  2. File/pysam I/O is replaced by in-memory records.
  3. The reference builds ``primer_pairs`` as a *set* (iteration order
     nondeterministic); the oracle enumerates pairs in the repo's
     documented deterministic order (stages/find_primers.ORIENT_COMBOS),
     which is the order the repo's take-last tie-break is defined
     against.

Both sides also consume the SAME repeat mask: the reference takes
tantan's lowercase masking as input; the repo computes its own HMM mask
(ops/tantan.py, decision-parity-tested separately), so the oracle feeds
the repo's mask to the vendored logic — differences would otherwise be
mask differences, not decision differences.
"""

import sys
from collections import defaultdict
from math import exp

import numpy as np
import pytest

sys.path.insert(0, '/root/repo/tests')

from fslr_tpu.config import PipelineConfig
from fslr_tpu.encode import encode, revcomp_str
from fslr_tpu.io.fastq import FastxRecord, records_to_arrays
from fslr_tpu.panel import load_panel
from fslr_tpu.stages.filter_junk import filter_junk_records
from fslr_tpu.stages.find_primers import ORIENT_COMBOS, label_and_chop
from tests.oracles import random_seq

CONFIG = PipelineConfig()
PANEL = load_panel().subset(['21q1', '17p6'])


# ---------------------------------------------------------------------------
# SSW shim: skbio-compatible facade over the repo's kernel
# ---------------------------------------------------------------------------

class _Aln:
    def __init__(self, score, tb, te):
        self.optimal_alignment_score = int(score)
        self.target_begin = int(tb)
        self.target_end_optimal = int(te)


class _ShimSSW:
    """StripedSmithWaterman(query)(target) facade over ops/ssw.sw_locate
    (scoring = the pipeline's primer/junk ScoringConfig, skbio gap
    convention)."""

    def __init__(self, query, suppress_sequences=False):
        self.q = encode(query)

    def __call__(self, target):
        from fslr_tpu.ops import ssw

        def pad(arr, min_len):
            L = max(min_len, 1 << int(np.ceil(np.log2(max(len(arr), 2)))))
            out = np.full((1, L), 4, np.uint8)
            out[0, :len(arr)] = arr
            return out

        t = encode(target)
        res = ssw.sw_locate(pad(self.q, 128), pad(t, 128),
                            np.array([len(self.q)], np.int32),
                            np.array([len(t)], np.int32),
                            CONFIG.scoring, backend='jax')
        return _Aln(np.asarray(res['score'])[0],
                    np.asarray(res['target_begin'])[0],
                    np.asarray(res['target_end'])[0])


# ---------------------------------------------------------------------------
# Vendored reference junk-filter decision logic
# (filter_junk_from_fq.py:15-183)
# ---------------------------------------------------------------------------

def ref_find_lower_case(s):
    i = 0
    while i < len(s):
        if s[i].islower():
            end = i + 1
            for j in range(end, len(s)):
                if not s[j].islower():
                    break
                end += 1
            yield i, end
            i = end
        else:
            i += 1


def ref_compute_rep(seq):
    last_visited = {}
    tot_amount = 0
    total_seen = 0
    for k in (2, 3, 4, 5, 6):
        decay = 0.25 * 1 / k
        max_amount = exp(-decay) * k
        sub_ptr = 0
        for i in range(len(seq) - k):
            a = seq[sub_ptr:sub_ptr + k]
            if a in last_visited:
                diff = i - last_visited[a]
                x = exp(-decay * diff)
                amount = (k * x) / max_amount
            else:
                amount = 0
            if i > k:
                tot_amount += amount
                total_seen += 1
            last_visited[a] = i
            sub_ptr += 1
    if total_seen == 0:
        return 0
    return tot_amount / total_seen


def ref_check_for_concatemer(seq, target_primers, primers, primers_r):
    if len(seq) < 200:
        return '_short'
    trim_size = 100
    for k in target_primers:
        for s in (primers[k], primers_r[k]):
            trim = seq[trim_size:len(seq) - trim_size]
            if not trim:
                return '_short'
            if len(trim) > 10000:
                seq_len = len(trim)
                start = 0
                end = 10000
                chunk_overlap = len(s) + 10
                while start < seq_len:
                    chunk_start = max(0, start - chunk_overlap
                                      if start > 0 else 0)
                    chunk_end = min(end + chunk_overlap
                                    if end < seq_len else seq_len, seq_len)
                    sub = trim[chunk_start:chunk_end]
                    aln = _ShimSSW(s)(sub)
                    if aln.optimal_alignment_score >= 28:
                        return '_concatemer'
                    if end >= seq_len:
                        break
                    start += 10000
                    end += 10000
            else:
                aln = _ShimSSW(s)(trim)
                if aln.optimal_alignment_score >= 28:
                    return '_concatemer'
    return ''


def ref_telmer_pct(rot, s):
    telmer_count = 0
    tot = 0
    for kmer in (s[ii:ii + 6] for ii in range(len(s) - 6 + 1)):
        if kmer in rot:
            telmer_count += 1
        tot += 1
    return telmer_count / tot


def _rev_comp(s):
    d = {"A": "T", "T": "A", "C": "G", "G": "C", "N": "N"}
    return "".join([d[i] for i in s])[::-1]


def _make_rotations():
    from collections import deque
    targets = ["CCCTAA", "CCCTGA", "CCCGAA", "CCCTAC", "CCCTCA", "CCCCAA",
               "CCCTTA", "CCCTAT", "CCCTAG", "CCCAAA", "CCCACT", "CCCCAT",
               "CCCGCA", "CCCGCT", "CCCTCT"]
    targets += [_rev_comp(t) for t in targets]
    rot = set()
    for tel in targets:
        d = deque(tel)
        for _ in range(len(tel) - 1):
            d.rotate()
            rot.add("".join(d))
    return rot


def ref_junk_decisions(masked_seqs, primer_list, primers, primers_r):
    """get_seqs_to_drop's per-read decision core
    (filter_junk_from_fq.py:120-183): returns (reason per read, counts);
    reason in {'', '_junk', '_short', '_concatemer'}."""
    length = 150
    rot = _make_rotations()
    counts = {'total_kept': 0, 'concatemers_dropped': 0,
              'total_dropped': 0, 'junk_seqs_dropped': 0,
              'short_seqs_dropped': 0}
    reasons = []
    for seq in masked_seqs:
        drop = False
        reason = ''
        for start, end in ref_find_lower_case(seq):
            if end - start > length:
                s = seq[start:end].upper()
                pct_tel = ref_telmer_pct(rot, s)
                if pct_tel > 0.3:
                    continue
                rep = ref_compute_rep(s)
                if rep < 0.3:
                    continue
                counts['junk_seqs_dropped'] += 1
                drop = True
                reason = '_junk'
                break
        else:
            reason = ref_check_for_concatemer(seq, primer_list, primers,
                                              primers_r)
            if reason:
                if reason == '_short':
                    counts['short_seqs_dropped'] += 1
                elif reason == '_concatemer':
                    counts['concatemers_dropped'] += 1
                drop = True
        if not drop:
            counts['total_kept'] += 1
        else:
            counts['total_dropped'] += 1
        reasons.append(reason)
    return reasons, counts


# ---------------------------------------------------------------------------
# Vendored reference primer-stage logic
# (find_reads_with_primers.py:48-117)
# ---------------------------------------------------------------------------

def _oracle_pairs():
    """Deterministic pair enumeration in the repo's documented order
    (the reference uses a set — substitution #3 in the module
    docstring)."""
    pairs = []
    for k1 in PANEL.names:
        for k2 in PANEL.names:
            k1f, k2f = PANEL.targets[k1], PANEL.targets[k2]
            for (s1, s2) in ORIENT_COMBOS:
                p1 = k1f if s1 == 'F' else _rev_comp(k1f)
                p2 = k2f if s2 == 'F' else _rev_comp(k2f)
                pairs.append((p1, p2, k1, k2, s1, s2))
    return pairs


def ref_check_primer2(primer_pairs, seq, quality, trim_thresh):
    res = []
    ss = 500
    for primer1, primer2, p1name, p2name, strand1, strand2 in primer_pairs:
        max_score1 = len(primer1) * 2
        max_score2 = len(primer2) * 2
        p1_space = min(int(len(seq) / 2), ss)
        p2_space = min(int(len(seq) / 2), ss)
        aln1 = _ShimSSW(primer1)(seq[:p1_space])
        aln2 = _ShimSSW(primer2)(seq[-p2_space:])
        score1 = aln1.optimal_alignment_score / max_score1
        score2 = aln2.optimal_alignment_score / max_score2
        name1 = 'False' if score1 < trim_thresh else p1name + strand1
        name2 = 'False' if score2 < trim_thresh else p2name + strand2
        res.append((round(score1, 2), round(score2, 2), name1, name2,
                    aln1, aln2, p1_space, p2_space))
    best = sorted(res, key=lambda x: (x[0] + x[1]))[-1]
    if best[2] == 'False' and best[3] == 'False':
        return best[0], best[1], best[2], best[3], 0, seq, quality
    target_begin = best[4].target_begin
    target_end = len(seq) - best[7] + best[5].target_end_optimal
    trimmed = target_begin + (len(seq) - target_end)
    new_seq = seq[target_begin:target_end]
    new_q = quality[target_begin:target_end] if quality else quality
    return best[0], best[1], best[2], best[3], trimmed, new_seq, new_q


def ref_label_and_chop(records, trim_thresh):
    """label_and_chop_primers' per-read core
    (find_reads_with_primers.py:79-117)."""
    pairs = _oracle_pairs()
    counts = defaultdict(int)
    counts['starting_bases'] = 0
    counts['trimmed_bases'] = 0
    counts['trimmed_reads'] = 0
    out = []
    for rec in records:
        counts['starting_bases'] += len(rec.sequence)
        (s1, s2, n1, n2, trimmed, new_seq,
         new_q) = ref_check_primer2(pairs, rec.sequence, rec.quality,
                                    trim_thresh)
        counts['trimmed_bases'] += trimmed
        if trimmed > 0:
            counts['trimmed_reads'] += 1
        name = f'{rec.name}.{s1}_{s2}.{n1}_{n2}'
        routed = n1 != 'False' or n2 != 'False'
        out.append((name, new_seq, new_q, routed))
        counts[f'{n1}_{n2}'] += 1
    return out, counts


# ---------------------------------------------------------------------------
# Test data
# ---------------------------------------------------------------------------

def _decode(arr):
    return ''.join('ACGTN'[c] for c in arr)


def _junk_reads(rng, n):
    """Randomized reads covering every decision branch: clean, telomeric
    blocks (kept), low-complexity tandem junk, interior-primer
    concatemers, short reads."""
    recs = []
    tel = 'CCCTAA'
    p21 = PANEL.seqs['21q1']
    for i in range(n):
        kind = i % 5
        if kind == 0:        # clean random read
            seq = _decode(random_seq(rng, int(rng.integers(300, 2000))))
        elif kind == 1:      # telomeric block (masked but telomer-gated)
            block = tel * 45
            seq = (_decode(random_seq(rng, 300)) + block
                   + _decode(random_seq(rng, 300)))
        elif kind == 2:      # tandem low-complexity junk block
            unit = _decode(random_seq(rng, int(rng.integers(2, 7))))
            block = unit * (400 // len(unit))
            seq = (_decode(random_seq(rng, 250)) + block
                   + _decode(random_seq(rng, 250)))
        elif kind == 3:      # concatemer: primer in the interior
            seq = (_decode(random_seq(rng, 400)) + p21
                   + _decode(random_seq(rng, 400)))
        else:                # short
            seq = _decode(random_seq(rng, int(rng.integers(40, 199))))
        recs.append(FastxRecord(name=f'r{i}', sequence=seq,
                                quality='I' * len(seq)))
    return recs


@pytest.mark.parametrize('seed', range(3))
def test_junk_filter_differential(seed):
    rng = np.random.default_rng(3100 + seed)
    recs = _junk_reads(rng, 25)
    reads = records_to_arrays(recs)
    keep, flat_mask, junk, short, concat, counters = filter_junk_records(
        reads, PANEL, CONFIG, backend='jax')

    # feed the repo's repeat mask to the vendored reference logic as
    # tantan-style lowercase
    masked = []
    off = reads.seq_off
    for i, rec in enumerate(recs):
        m = flat_mask[off[i]:off[i + 1]]
        masked.append(''.join(
            ch.lower() if mm else ch
            for ch, mm in zip(rec.sequence, m)))
    primers = dict(PANEL.seqs)
    primers_r = {k: _rev_comp(v) for k, v in primers.items()}
    reasons, ref_counts = ref_junk_decisions(
        masked, list(PANEL.names), primers, primers_r)

    for i, reason in enumerate(reasons):
        assert bool(keep[i]) == (reason == ''), (i, reason, recs[i].name)
        assert bool(junk[i]) == (reason == '_junk'), (i, reason)
        assert bool(short[i]) == (reason == '_short'), (i, reason)
        assert bool(concat[i]) == (reason == '_concatemer'), (i, reason)
    for k, v in ref_counts.items():
        assert counters[k] == v, (k, counters[k], v)


def _primer_reads(rng, n):
    """Reads hitting every labelling branch: proper F/R pairs, same-
    orientation pairs, one-sided, none, mutated primers near threshold."""
    t21 = PANEL.targets['21q1']
    t17 = PANEL.targets['17p6']
    recs = []
    for i in range(n):
        kind = i % 6
        mid = _decode(random_seq(rng, int(rng.integers(150, 800))))
        if kind == 0:
            seq = t21 + mid + revcomp_str(t17)
        elif kind == 1:
            seq = revcomp_str(t21) + mid + t17
        elif kind == 2:
            seq = t21 + mid + t17
        elif kind == 3:
            seq = t21 + mid                     # one-sided
        elif kind == 4:
            seq = mid                            # none
        else:
            # heavily mutated primer: scores land near the 0.4 threshold
            t = list(t21)
            for p in rng.choice(len(t), size=len(t) // 3, replace=False):
                t[p] = 'ACGT'[rng.integers(0, 4)]
            seq = ''.join(t) + mid + revcomp_str(t17)
        recs.append(FastxRecord(name=f'p{i}', sequence=seq,
                                quality='I' * len(seq)))
    return recs


@pytest.mark.parametrize('seed', range(3))
def test_primer_stage_differential(seed):
    rng = np.random.default_rng(3200 + seed)
    recs = _primer_reads(rng, 24)
    out_records, has_primer, counters = label_and_chop(
        records_to_arrays(recs), PANEL, CONFIG, backend='jax')
    ref_out, ref_counts = ref_label_and_chop(recs, 0.4)

    assert len(out_records) == len(ref_out)
    for i, (rec, (name, seq, qual, routed)) in enumerate(
            zip(out_records, ref_out)):
        assert rec.name == name, (i, rec.name, name)
        assert rec.sequence == seq, (i, recs[i].name)
        assert (rec.quality or None) == (qual or None), i
        assert bool(has_primer[i]) == routed, (i, name)
    for k, v in ref_counts.items():
        assert counters[k] == v, (k, counters[k], v)
