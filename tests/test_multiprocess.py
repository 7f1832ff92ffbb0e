"""Multi-HOST execution: two real OS processes under jax.distributed
must produce the artifacts of a single-process run (SURVEY section 5.8;
the reference's Pool-over-files analog, main.py:95-114)."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pandas as pd
import pytest

from fslr_tpu.encode import decode, revcomp_str
from fslr_tpu.panel import load_panel
from tests.oracles import random_seq

PANEL = load_panel().subset(['21q1', '17p6'])


def _make_dataset(root):
    rng = np.random.default_rng(5)
    chrA = random_seq(rng, 400_000)
    ref_path = root / 'ref.fa'
    with open(ref_path, 'w') as fh:
        fh.write('>chrA\n' + decode(chrA) + '\n')
    t21 = PANEL.targets['21q1']
    t17rc = revcomp_str(PANEL.targets['17p6'])

    def read(b):
        return (t21 + decode(chrA[100_000:100_600])
                + decode(chrA[b:b + 700])
                + decode(chrA[150_000:150_600]) + t17rc)

    fq_dir = root / 'reads'
    fq_dir.mkdir()
    # several input FILES so the per-process shard is non-trivial
    for f in range(4):
        with open(fq_dir / f'b{f}.fastq', 'w') as fh:
            for i in range(5):
                seq = read(200_000 + (f % 2) * 50_000)
                fh.write(f'@f{f}r{i}\n{seq}\n+\n{"I" * len(seq)}\n')
    return str(ref_path), str(fq_dir)


_RUNNER = textwrap.dedent('''
    import sys
    import jax
    jax.config.update('jax_platforms', 'cpu')
    sys.path.insert(0, {repo!r})
    from fslr_tpu.config import PipelineConfig
    from fslr_tpu.pipeline import run_pipeline
    cfg = PipelineConfig(
        name='M', out={out!r}, ref={ref!r}, primers=('21q1', '17p6'),
        basecalled={fq!r}, n_processes={nproc}, process_id={pid},
        coordinator={coord!r})
    run_pipeline(cfg, backend='jax')
''')


def test_two_process_artifacts_match_single(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ref_path, fq_dir = _make_dataset(tmp_path)

    # ---- single-process reference run --------------------------------
    out1 = tmp_path / 'out_single'
    from fslr_tpu.config import PipelineConfig
    from fslr_tpu.pipeline import run_pipeline
    cfg = PipelineConfig(name='M', out=str(out1), ref=ref_path,
                         primers=('21q1', '17p6'), basecalled=fq_dir)
    run_pipeline(cfg, backend='jax')

    # ---- two-process run ---------------------------------------------
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        port = s.getsockname()[1]
    coord = f'127.0.0.1:{port}'
    out2 = tmp_path / 'out_multi'
    procs = []
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    for pid in range(2):
        script = _RUNNER.format(repo=repo, out=str(out2), ref=ref_path,
                                fq=fq_dir, nproc=2, pid=pid, coord=coord)
        procs.append(subprocess.Popen(
            [sys.executable, '-c', script], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode(errors='replace'))
    for pid, p in enumerate(procs):
        assert p.returncode == 0, \
            f'process {pid} failed:\n{outs[pid][-4000:]}'

    # ---- artifacts match ---------------------------------------------
    for art in ('mappings.bed', 'mappings.cluster.bed',
                'mappings.representative.bed',
                'filter_counts_summary.csv'):
        a = open(out1 / f'M.{art}').read()
        b = open(out2 / f'M.{art}').read()
        assert a == b, f'artifact {art} differs'

    # BAMs: equal as record multisets (coordinate ties across processes
    # may interleave differently than the single-process stable sort)
    from fslr_tpu.io import bam as bamio
    _, _, r1 = bamio.read_bam(str(out1 / 'M.bwa_dodi.bam'))
    _, _, r2 = bamio.read_bam(str(out2 / 'M.bwa_dodi.bam'))

    def key(r):
        return (r.qname, r.flag, r.ref_id, r.pos, str(r.cigar), r.seq)
    assert sorted(map(key, r1)) == sorted(map(key, r2))
    assert len(r1) > 10
