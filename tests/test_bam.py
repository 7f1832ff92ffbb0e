"""BAM layer unit tests: BGZF framing, record round-trip, CIGARs."""

import gzip
import struct

import pytest

from fslr_tpu.io import bam


def _mk_record(**kw):
    base = dict(qname='read1', flag=0, ref_id=0, pos=100, mapq=60,
                cigar=[(5, 'S'), (90, 'M'), (5, 'S')], seq='ACGT' * 25,
                qual='I' * 100, tags={'AS': 180})
    base.update(kw)
    return bam.BamRecord(**base)


def test_bgzf_block_is_valid_gzip(tmp_path):
    p = tmp_path / 'x.bgzf'
    w = bam.BgzfWriter(str(p))
    payload = b'hello bgzf world' * 1000
    w.write(payload)
    w.close()
    with gzip.open(p, 'rb') as fh:
        assert fh.read() == payload
    # trailing EOF marker present
    raw = open(p, 'rb').read()
    assert raw.endswith(bam.BGZF_EOF)


def test_record_roundtrip(tmp_path):
    p = tmp_path / 'x.bam'
    recs = [
        _mk_record(),
        _mk_record(qname='sup1', flag=2048 | 16, pos=50,
                   cigar=[(10, 'H'), (40, 'M'), (2, 'I'), (48, 'M'),
                          (3, 'D'), (10, 'H')], seq='', qual=None,
                   tags={'AS': 99}),
        _mk_record(qname='chr2read', ref_id=1, pos=5),
    ]
    bam.write_bam(str(p), ['chr1', 'chr2'], [1000, 2000], recs)
    names, lengths, out = bam.read_bam(str(p))
    assert names == ['chr1', 'chr2']
    assert lengths == [1000, 2000]
    assert len(out) == 3
    by_name = {r.qname: r for r in out}
    r0 = by_name['read1']
    assert r0.seq == 'ACGT' * 25
    assert r0.qual == 'I' * 100
    assert r0.cigar == [(5, 'S'), (90, 'M'), (5, 'S')]
    assert r0.tags['AS'] == 180
    sup = by_name['sup1']
    assert sup.flag == 2064
    assert sup.seq == ''
    assert sup.infer_read_length() == 10 + 40 + 2 + 48 + 10
    assert sup.reference_span() == 40 + 48 + 3
    # coordinate-sorted: chr1 pos50, chr1 pos100, chr2 pos5
    assert [(r.ref_id, r.pos) for r in out] == [(0, 50), (0, 100), (1, 5)]


def test_get_chromosome_lengths(tmp_path):
    p = tmp_path / 'x.bam'
    bam.write_bam(str(p), ['a', 'b'], [10, 20], [])
    assert bam.get_chromosome_lengths(str(p)) == {'a': 10, 'b': 20}


@pytest.mark.parametrize('qstart,qend,qlen,rspan,expect_ops', [
    (0, 100, 100, 100, [(100, 'M')]),
    (10, 90, 100, 80, [(10, 'S'), (80, 'M'), (10, 'S')]),
    (0, 100, 100, 95, 'D'),   # ref shorter: deletion inserted
    (0, 100, 100, 105, 'D'),
])
def test_approx_cigar_consistency(qstart, qend, qlen, rspan, expect_ops):
    cig = bam.approx_cigar(qstart, qend, qlen, rspan, hard_clips=False)
    qspan = sum(n for n, op in cig if op in 'MIS') \
        - sum(n for n, op in cig if op == 'S')
    assert qspan == qend - qstart
    assert sum(n for n, op in cig if op in 'MD') == rspan
    assert sum(n for n, op in cig if op in 'MIS') == qlen
    if isinstance(expect_ops, list):
        assert cig == expect_ops
