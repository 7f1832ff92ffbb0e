"""PAF filter utility (fslr_tpu/tools/filter_paf.py).

Reference semantics: /root/reference/fslr/filter_paf.py:10-34 — drop
self-hits, require query/target coverage >= min_cov, and matching-bases
>= 0.5 of both lengths.
"""

import io
import subprocess
import sys

from fslr_tpu.tools.filter_paf import row_passes, run


def _paf(qname, qlen, qs, qe, tname, tlen, ts, te, nmatch):
    return '\t'.join(map(str, [qname, qlen, qs, qe, '+', tname, tlen, ts,
                               te, nmatch, max(qe - qs, te - ts), 60]))


def test_row_rules():
    # self-hit dropped regardless of coverage
    assert not row_passes(_paf('a', 100, 0, 100, 'a', 100, 0, 100,
                               100).split('\t'), 0.5)
    # full reciprocal overlap, high identity: kept
    assert row_passes(_paf('a', 100, 0, 100, 'b', 100, 0, 100,
                           90).split('\t'), 0.8)
    # query coverage below threshold: dropped
    assert not row_passes(_paf('a', 100, 0, 70, 'b', 100, 0, 100,
                               70).split('\t'), 0.8)
    # target coverage below threshold: dropped
    assert not row_passes(_paf('a', 100, 0, 100, 'b', 200, 0, 150,
                               100).split('\t'), 0.8)
    # matching bases under half the target length: dropped
    assert not row_passes(_paf('a', 100, 0, 100, 'b', 250, 0, 250,
                               90).split('\t'), 0.3)
    # boundary: coverage exactly at the threshold is kept
    assert row_passes(_paf('a', 100, 10, 90, 'b', 100, 10, 90,
                           60).split('\t'), 0.8)


def test_run_streams_and_counts():
    lines = [
        _paf('a', 100, 0, 100, 'b', 100, 0, 100, 95) + '\n',
        _paf('a', 100, 0, 100, 'a', 100, 0, 100, 95) + '\n',   # self
        _paf('c', 100, 0, 40, 'b', 100, 0, 100, 40) + '\n',    # low qcov
    ]
    out, err = io.StringIO(), io.StringIO()
    run(io.StringIO(''.join(lines)), out, err, 0.8)
    assert out.getvalue() == lines[0]
    assert 'Input alignments: 3, kept alignments 1' in err.getvalue()


def test_cli_stdin_stdout():
    line = _paf('x', 50, 0, 50, 'y', 50, 0, 50, 48) + '\n'
    p = subprocess.run(
        [sys.executable, '-m', 'fslr_tpu.tools.filter_paf', '0.9'],
        input=line + _paf('x', 50, 0, 50, 'x', 50, 0, 50, 48) + '\n',
        capture_output=True, text=True)
    assert p.returncode == 0
    assert p.stdout == line
    assert 'kept alignments 1' in p.stderr
