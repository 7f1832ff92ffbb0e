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


def test_bai_index_and_fetch(tmp_path):
    """write_index=True emits a spec .bai; fetch() must return exactly the
    records a brute-force overlap scan returns (parity with the
    reference's samtools index + pysam fetch usage, main.py:140,167)."""
    import numpy as np

    from fslr_tpu.io import bam as bamio

    rng = np.random.default_rng(9)
    names = ['chrA', 'chrB']
    lengths = [2_000_000, 500_000]
    records = []
    for i in range(400):
        rid = int(rng.integers(0, 2))
        pos = int(rng.integers(0, lengths[rid] - 5000))
        span = int(rng.integers(50, 4000))
        records.append(bamio.BamRecord(
            qname=f'r{i}', flag=0, ref_id=rid, pos=pos, mapq=60,
            cigar=[(span, 'M')], seq='A' * span, qual=None,
            tags={'AS': span}))
    # a few unmapped records exercise the unmapped-count field
    for i in range(3):
        records.append(bamio.BamRecord(
            qname=f'u{i}', flag=4, ref_id=-1, pos=-1, mapq=0,
            cigar=[], seq='ACGT', qual=None, tags={}))
    path = str(tmp_path / 'x.bam')
    bamio.write_bam(path, names, lengths, records, write_index=True)
    import os
    assert os.path.exists(path + '.bai')

    _, _, all_recs = bamio.read_bam(path)
    for ref_name, beg, end in [('chrA', 0, 10_000), ('chrA', 500_000,
                                                     600_000),
                               ('chrB', 100_000, 100_001),
                               ('chrA', 1_990_000, 2_000_000),
                               ('chrB', 0, 500_000)]:
        rid = names.index(ref_name)
        want = sorted((r.qname for r in all_recs
                       if r.ref_id == rid and r.pos < end
                       and r.pos + max(r.reference_span(), 1) > beg))
        got = sorted(r.qname for r in bamio.fetch(path, ref_name, beg, end))
        assert got == want, (ref_name, beg, end, len(got), len(want))


def test_bai_linear_index_prunes_blocks(tmp_path):
    """fetch on a tail region must not decode every record (the linear
    index skips leading chunks)."""
    from fslr_tpu.io import bam as bamio

    names = ['chrA']
    lengths = [50_000_000]
    records = [bamio.BamRecord(
        qname=f'r{i}', flag=0, ref_id=0, pos=i * 1000, mapq=60,
        cigar=[(500, 'M')], seq='C' * 500, qual=None, tags={})
        for i in range(5000)]
    path = str(tmp_path / 'big.bam')
    bamio.write_bam(path, names, lengths, records, write_index=True)
    got = bamio.fetch(path, 'chrA', 4_999_000, 5_000_000)
    assert [r.qname for r in got] == ['r4999']


def test_stream_raw_records_roundtrip(tmp_path):
    """Raw-payload streaming must expose exactly the records read_bam
    decodes (qname/ref/pos/ref_end), and copied payloads must re-read
    identically (the consensus delete/merge fast path)."""
    from fslr_tpu.io import bam as bamio
    path = str(tmp_path / 'r.bam')
    recs = [
        bamio.BamRecord(qname=f'q{i}', flag=0 if i % 2 == 0 else 16,
                        ref_id=i % 2, pos=100 * i, mapq=40,
                        cigar=[(30, 'M'), (2, 'D'), (10, 'M')],
                        seq='ACGT' * 10, qual='I' * 40,
                        tags={'AS': 77 + i})
        for i in range(6)
    ]
    bamio.write_bam(path, ['c0', 'c1'], [10_000, 10_000], recs)
    names, lengths, raw = bamio.stream_raw_records(path)
    assert names == ['c0', 'c1']
    rows = list(raw)
    _, _, decoded = bamio.read_bam(path)
    assert len(rows) == len(decoded)
    for (pl, qn, rid, pos, rend), d in zip(rows, decoded):
        assert (qn, rid, pos) == (d.qname, d.ref_id, d.pos)
        assert rend == d.pos + max(d.reference_span(), 1)
    # payload copy round-trips byte-identically
    out = str(tmp_path / 'copy.bam')
    bamio.write_bam_items(out, names, lengths,
                          ((rid, pos, rend, pl)
                           for (pl, qn, rid, pos, rend) in rows),
                          sort_by_coord=False)
    _, _, redecoded = bamio.read_bam(out)
    assert [r.qname for r in redecoded] == [r.qname for r in decoded]
    assert [r.seq for r in redecoded] == [r.seq for r in decoded]
    # contig remap patch
    pl0 = rows[0][0]
    patched = bamio.patch_ref_id(pl0, 1)
    assert bamio._decode_record(patched[4:], 0, len(patched) - 4).ref_id == 1


def test_encode_chunk_items_byte_identical(tmp_path):
    """The vectorized chunk encoder (io/bam.encode_chunk_items) must be
    byte-identical to the per-record fallback on real aligner output
    (both strands, clips, primaries with reversed seq/qual, AS tags)."""
    import numpy as np

    from fslr_tpu.config import PipelineConfig
    from fslr_tpu.encode import decode, revcomp_str
    from fslr_tpu.index.reference import Reference, build_seed_index
    from fslr_tpu.io import bam as bamio
    from fslr_tpu.io.fastq import read_reads
    from fslr_tpu.pipeline import _encode_chunk_fallback
    from fslr_tpu.stages import align as align_stage
    from tests.oracles import mutate, random_seq

    cfg = PipelineConfig()
    rng = np.random.default_rng(4242)
    chrA = random_seq(rng, 120_000)
    ref = Reference(names=['chrA'], lengths=np.array([120_000]),
                    offsets=np.array([0, 120_000]), codes=chrA)
    sidx = build_seed_index(ref, k=cfg.align.seed_k)

    fq = tmp_path / 'r.fastq'
    with open(fq, 'w') as fh:
        for i in range(12):
            a = int(rng.integers(0, 50_000))
            b = int(rng.integers(60_000, 110_000))
            seg1 = mutate(rng, chrA[a:a + 800], sub=0.02, indel=0.01)
            seg2 = mutate(rng, chrA[b:b + 700], sub=0.02, indel=0.01)
            s = decode(np.concatenate([seg1, seg2]))
            if i % 3 == 0:
                s = revcomp_str(s)
            q = ''.join(chr(33 + int(x))
                        for x in rng.integers(0, 60, len(s)))
            fh.write(f'@read{i} extra\n{s}\n+\n{q}\n')
    fa = read_reads(str(fq))
    seqs = fa.seq_strs(0, fa.n)
    qnames = fa.name_strs(0, fa.n)
    aln = align_stage.align_batch(seqs, ref, sidx, cfg, backend='jax')
    assert len(aln) >= 20
    assert aln.cig_rle is not None and bool(np.all(aln.cig_rle[0]))

    buf, ofs, plens, rids, poss, rends = bamio.encode_chunk_items(
        aln, 0, fa._names, fa.name_off, fa.codes, fa.seq_off,
        fa._quals, fa.qual_off)
    fast = [(int(r), int(p), int(e), bytes(buf[o:o + ln]))
            for r, p, e, o, ln in zip(rids, poss, rends, ofs, plens)]

    slow: list = []
    _encode_chunk_fallback(aln, qnames, seqs, fa, 0, cfg, slow)
    assert len(fast) == len(slow)
    for i, (f, s) in enumerate(zip(fast, slow)):
        assert f[:3] == s[:3], i
        assert f[3] == s[3], f'payload differs at record {i}'
