"""Native C++ FASTX parser tests (skipped when the toolchain is absent)."""

import gzip

import numpy as np
import pytest

from fslr_tpu.encode import encode
from fslr_tpu.io import fastq
from fslr_tpu.io.native import parse_fastx


def _native_or_skip(path):
    fa = parse_fastx(path)
    if fa is None:
        pytest.skip('native library unavailable')
    return fa


def test_native_fastq_matches_python(tmp_path):
    p = tmp_path / 'x.fastq'
    p.write_text('@r1 comment here\nACGTNacgt\n+\nIIIIIIIII\n'
                 '@r2\nGGGG\n+\nJJJJ\n')
    fa = _native_or_skip(str(p))
    recs = list(fastq._read_fastx_py(str(p)))
    assert fa.n == len(recs) == 2
    for i, rec in enumerate(recs):
        assert fa.name(i) == rec.name
        assert fa.comment(i) == rec.comment
        assert fa.qual(i) == rec.quality
        np.testing.assert_array_equal(fa.seq_codes(i), encode(rec.sequence))
    np.testing.assert_array_equal(
        fa.lower_mask(0), [0, 0, 0, 0, 0, 1, 1, 1, 1])


def test_native_fasta_gz(tmp_path):
    p = tmp_path / 'x.fa.gz'
    with gzip.open(p, 'wt') as fh:
        fh.write('>c1 desc\nACGT\nTTTT\n>c2\nNNNA\n')
    fa = _native_or_skip(str(p))
    assert fa.n == 2
    assert fa.name(0) == 'c1' and fa.comment(0) == 'desc'
    assert fa.length(0) == 8
    assert fa.qual(0) is None
    np.testing.assert_array_equal(fa.seq_codes(1), [4, 4, 4, 0])


def test_read_reads_default_matches_fallback(tmp_path, monkeypatch):
    """read_reads (the stages' default columnar path — native parser when
    buildable) must agree with the pure-Python fallback byte-for-byte."""
    p = tmp_path / 'x.fastq'
    p.write_text('@r1 c1\nACGTNacgtXx\n+\nIIIIIIIIIII\n'
                 '@r2\nGGGGTT\n+\nJJJJJJ\n')
    fa = fastq.read_reads(str(p))
    monkeypatch.setenv('FSLR_NO_NATIVE', '1')
    fb = fastq.read_reads(str(p))
    assert fa.n == fb.n == 2
    for i in range(2):
        np.testing.assert_array_equal(fa.seq_codes(i), fb.seq_codes(i))
        np.testing.assert_array_equal(
            np.asarray(fa.lower_mask(i), bool),
            np.asarray(fb.lower_mask(i), bool))
        assert fa.name(i) == fb.name(i)
        assert fa.qual(i) == fb.qual(i)
        assert fa.comment(i) == fb.comment(i)
        assert fa.seq_str(i) == fb.seq_str(i)


def test_subset_and_lower_override(tmp_path):
    p = tmp_path / 'y.fastq'
    p.write_text('@a\nACGTACGT\n+\nIIIIIIII\n@b\nTTTT\n+\nJJJJ\n'
                 '@c\nGGCC\n+\nKKKK\n')
    fa = fastq.read_reads(str(p))
    mask = np.array([0, 0, 1, 1], np.uint8)
    sub = fa.subset([2, 0], lower_override=[mask,
                                            np.zeros(8, np.uint8)])
    assert sub.n == 2
    assert sub.name(0) == 'c' and sub.name(1) == 'a'
    assert sub.seq_str(0) == 'GGcc'
    assert sub.qual(0) == 'KKKK' and sub.qual(1) == 'IIIIIIII'


def test_subset_lower_override_padded(tmp_path):
    # filter stage computes repeat masks on padded length buckets; a mask
    # longer than its read must not shift the NEXT read's mask (the
    # advisor's round-2 repro: a 2-read subset returned 'TTTT' where
    # 'ttTT' was expected)
    p = tmp_path / 'z.fastq'
    p.write_text('@a\nACGTACGT\n+\nIIIIIIII\n@b\nTTTT\n+\nJJJJ\n')
    fa = fastq.read_reads(str(p))
    mask_a = np.zeros(16, np.uint8)         # padded to a 16-bucket
    mask_b = np.zeros(16, np.uint8)
    mask_b[:2] = 1
    sub = fa.subset([0, 1], lower_override=[mask_a, mask_b])
    assert sub.seq_str(0) == 'ACGTACGT'
    assert sub.seq_str(1) == 'ttTT'
    # short override pads with uppercase rather than misaligning
    sub2 = fa.subset([1, 0], lower_override=[np.array([1], np.uint8),
                                             np.zeros(8, np.uint8)])
    assert sub2.seq_str(0) == 'tTTT'
    assert sub2.seq_str(1) == 'ACGTACGT'


def test_native_large_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    p = tmp_path / 'big.fastq'
    seqs = []
    with open(p, 'w') as fh:
        for i in range(500):
            s = ''.join('ACGT'[c] for c in rng.integers(0, 4, 777))
            seqs.append(s)
            fh.write(f'@read{i}\n{s}\n+\n{"F" * 777}\n')
    fa = _native_or_skip(str(p))
    assert fa.n == 500
    for i in (0, 250, 499):
        np.testing.assert_array_equal(fa.seq_codes(i), encode(seqs[i]))
        assert fa.name(i) == f'read{i}'
