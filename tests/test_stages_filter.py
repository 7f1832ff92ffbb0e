"""Stage-level tests: junk filter (A) and primer ID + trim (B) vs oracles."""

import numpy as np
import pytest

from fslr_tpu.config import PipelineConfig
from fslr_tpu.encode import decode, encode, revcomp_str
from fslr_tpu.io.fastq import FastxRecord, read_fastx
from fslr_tpu.panel import load_panel
from fslr_tpu.stages import filter_junk, find_primers
from tests.oracles import random_seq, sw_locate_oracle

CONFIG = PipelineConfig(primers=('21q1', '17p6'))
PANEL = load_panel().subset(['21q1', '17p6'])


def _rand(rng, n):
    return decode(random_seq(rng, n))


# --------------------------- stage A ---------------------------------------

def test_filter_junk_decisions(tmp_path):
    rng = np.random.default_rng(5)
    normal = FastxRecord('normal', _rand(rng, 1200))
    short = FastxRecord('short', _rand(rng, 150))
    concat = FastxRecord('concat', _rand(rng, 500) + PANEL.seqs['21q1']
                         + _rand(rng, 500))
    junk = FastxRecord('junk', _rand(rng, 300) + 'AT' * 200 + _rand(rng, 300))
    telo = FastxRecord('telo', _rand(rng, 300) + 'TTAGGG' * 70
                       + _rand(rng, 300))
    recs = [normal, short, concat, junk, telo]
    keep, masks, junkf, shortf, concatf, counters = \
        filter_junk.filter_junk_records(recs, PANEL, CONFIG)
    assert list(keep) == [True, False, False, False, True]
    assert counters['short_seqs_dropped'] == 1
    assert counters['concatemers_dropped'] == 1
    assert counters['junk_seqs_dropped'] == 1
    assert counters['total_kept'] == 2
    assert counters['total_dropped'] == 3


def test_filter_junk_concatemer_revcomp(tmp_path):
    """Reverse-complement primer hits count too (reference scans both)."""
    rng = np.random.default_rng(6)
    rc = revcomp_str(PANEL.seqs['17p6'])
    rec = FastxRecord('r', _rand(rng, 400) + rc + _rand(rng, 400))
    keep, *_, counters = filter_junk.filter_junk_records([rec], PANEL, CONFIG)
    assert not keep[0]
    assert counters['concatemers_dropped'] == 1


def test_filter_junk_primer_at_end_kept():
    """Primers within the 100bp end trim must NOT be concatemer hits."""
    rng = np.random.default_rng(7)
    seq = PANEL.seqs['21q1'] + _rand(rng, 500) + revcomp_str(PANEL.seqs['17p6'])
    rec = FastxRecord('amplicon', seq)
    keep, *_ = filter_junk.filter_junk_records([rec], PANEL, CONFIG)
    assert keep[0]


def test_filter_junk_file_roundtrip(tmp_path):
    rng = np.random.default_rng(8)
    fq = tmp_path / 'in.fastq'
    with open(fq, 'w') as fh:
        for i in range(3):
            s = _rand(rng, 800)
            fh.write(f'@read{i}\n{s}\n+\n{"I" * len(s)}\n')
    cfg = CONFIG.replace(out=str(tmp_path), name='S')
    counters = filter_junk.run_file(str(fq), PANEL, cfg)
    assert counters['total_kept'] == 3
    import glob
    outs = glob.glob(str(tmp_path / 'S.*.filtered_junk.fq'))
    assert len(outs) == 1
    recs = list(read_fastx(outs[0]))
    assert len(recs) == 3
    assert recs[0].quality is None          # FASTA out, like tantan's output


# --------------------------- stage B ---------------------------------------

def _oracle_check_primer2(seq, panel, trim_thresh=0.4, window=500):
    """Mirror of the reference check_primer2 with our deterministic pair
    order (see stages/find_primers.py docstring)."""
    res = []
    names = list(panel.names)
    for k1 in names:
        for k2 in names:
            for (s1, s2) in find_primers.ORIENT_COMBOS:
                t1 = panel.targets[k1] if s1 == 'F' else revcomp_str(
                    panel.targets[k1])
                t2 = panel.targets[k2] if s2 == 'F' else revcomp_str(
                    panel.targets[k2])
                space1 = min(len(seq) // 2, window)
                space2 = min(len(seq) // 2, window)
                a1 = sw_locate_oracle(encode(t1), encode(seq[:space1]))
                a2 = sw_locate_oracle(encode(t2), encode(seq[-space2:]))
                sc1 = a1['score'] / (2 * len(t1))
                sc2 = a2['score'] / (2 * len(t2))
                n1 = 'False' if sc1 < trim_thresh else k1 + s1
                n2 = 'False' if sc2 < trim_thresh else k2 + s2
                res.append((round(sc1, 2), round(sc2, 2), n1, n2, a1, a2,
                            space1, space2))
    best = sorted(res, key=lambda x: (x[0] + x[1]))[-1]
    if best[2] == 'False' and best[3] == 'False':
        return best[0], best[1], best[2], best[3], 0, seq
    tb = best[4]['target_begin']
    te = len(seq) - best[7] + best[5]['target_end']
    return (best[0], best[1], best[2], best[3], tb + (len(seq) - te),
            seq[tb:te])


@pytest.mark.parametrize('case', ['both', 'one', 'none', 'short_read'])
def test_find_primers_vs_oracle(case):
    rng = np.random.default_rng(hash(case) % 2**32)
    t21 = PANEL.targets['21q1']
    t17 = PANEL.targets['17p6']
    if case == 'both':
        seq = _rand(rng, 11) + t21 + _rand(rng, 900) + revcomp_str(t17) \
            + _rand(rng, 7)
    elif case == 'one':
        seq = _rand(rng, 5) + t21 + _rand(rng, 900)
    elif case == 'none':
        seq = _rand(rng, 800)
    else:
        seq = _rand(rng, 20) + t21[:40] + _rand(rng, 100)
    rec = FastxRecord('r0', seq, quality='I' * len(seq))
    out, has_primer, counters = find_primers.label_and_chop(
        [rec], PANEL, CONFIG)
    s1, s2, n1, n2, trimmed, oseq = _oracle_check_primer2(seq, PANEL)
    assert out[0].name == f'r0.{s1}_{s2}.{n1}_{n2}'
    assert out[0].sequence == oseq
    assert len(out[0].quality) == len(oseq)
    assert has_primer[0] == (n1 != 'False' or n2 != 'False')
    assert counters['trimmed_bases'] == trimmed
    assert counters[f'{n1}_{n2}'] == 1


def test_find_primers_batch_counters():
    rng = np.random.default_rng(11)
    t21 = PANEL.targets['21q1']
    t17 = PANEL.targets['17p6']
    recs = []
    for i in range(20):
        seq = _rand(rng, rng.integers(3, 30)) + t21 + \
            _rand(rng, rng.integers(400, 1200)) + revcomp_str(t17)
        recs.append(FastxRecord(f'r{i}', seq))
    out, has_primer, counters = find_primers.label_and_chop(
        recs, PANEL, CONFIG)
    assert has_primer.all()
    assert counters['21q1F_17p6R'] == 20
    assert counters['trimmed_reads'] == 20
    assert counters['starting_bases'] == sum(len(r.sequence) for r in recs)


def test_find_primers_file_roundtrip(tmp_path):
    rng = np.random.default_rng(12)
    t21 = PANEL.targets['21q1']
    path = tmp_path / 'S.x.filtered_junk.fq'
    with open(path, 'w') as fh:
        fh.write(f'>with_primer\n{t21}{_rand(rng, 600)}\n')
        fh.write(f'>no_primer\n{_rand(rng, 600)}\n')
    cfg = CONFIG.replace(out=str(tmp_path), keep_temp=True)
    find_primers.run_file(str(path), PANEL, cfg)
    lab = list(read_fastx(str(tmp_path / 'S.x.primers_labelled.fq')))
    nop = list(read_fastx(str(tmp_path / 'S.x.no_primers.fq')))
    assert len(lab) == 1 and lab[0].name.startswith('with_primer.')
    assert len(nop) == 1 and nop[0].name.startswith('no_primer.')
    assert nop[0].name.endswith('.False_False')
