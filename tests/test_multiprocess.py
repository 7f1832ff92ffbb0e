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


_RUNNER_MESH = textwrap.dedent('''
    import os
    import sys
    os.environ['XLA_FLAGS'] = (
        '--xla_force_host_platform_device_count=4 '
        + os.environ.get('XLA_FLAGS', ''))
    import jax
    jax.config.update('jax_platforms', 'cpu')
    sys.path.insert(0, {repo!r})
    import time
    time.sleep({delay})
    import numpy as np
    from jax.sharding import Mesh
    from fslr_tpu.config import PipelineConfig
    from fslr_tpu.parallel.mesh import READS_AXIS
    from fslr_tpu.pipeline import run_pipeline

    # ownership spy (round-3 verdict item 3): every intermediate this
    # process consumes must carry its OWN process tag — a foreign path
    # means the shared-out-dir ownership race is back
    from fslr_tpu.stages import find_primers as _fp
    _orig = _fp.run_file
    def _spy(path, *a, **kw):
        assert '__p{pid}.' in os.path.basename(path), (
            'process {pid} consumed foreign intermediate: ' + path)
        return _orig(path, *a, **kw)
    _fp.run_file = _spy

    cfg = PipelineConfig(
        name='M', out={out!r}, ref={ref!r}, primers=('21q1', '17p6'),
        basecalled={fq!r}, n_processes=2, process_id={pid},
        coordinator={coord!r})
    # distributed bootstrap must precede ANY backend touch (incl. the
    # local_devices() call below) — the pipeline's own call is idempotent
    from fslr_tpu.parallel.cluster_merge import initialize_distributed
    initialize_distributed(cfg.coordinator, 2, {pid})
    # per-process LOCAL mesh: the two parallelism axes compose as
    # (process file shard) x (local 4-device read mesh) — SURVEY 5.8
    mesh = Mesh(np.array(jax.local_devices()[:4]), (READS_AXIS,))
    run_pipeline(cfg, backend='jax', mesh=mesh)
''')


def _run_two_process_mesh(tmp_path, delays):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ref_path, fq_dir = _make_dataset(tmp_path)

    out1 = tmp_path / 'out_single'
    from fslr_tpu.config import PipelineConfig
    from fslr_tpu.pipeline import run_pipeline
    cfg = PipelineConfig(name='M', out=str(out1), ref=ref_path,
                         primers=('21q1', '17p6'), basecalled=fq_dir)
    run_pipeline(cfg, backend='jax')

    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        port = s.getsockname()[1]
    coord = f'127.0.0.1:{port}'
    out2 = tmp_path / 'out_mesh'
    procs = []
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    for pid in range(2):
        script = _RUNNER_MESH.format(repo=repo, out=str(out2),
                                     ref=ref_path, fq=fq_dir, pid=pid,
                                     coord=coord, delay=delays[pid])
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

    for art in ('mappings.bed', 'mappings.cluster.bed',
                'mappings.representative.bed',
                'filter_counts_summary.csv'):
        a = open(out1 / f'M.{art}').read()
        b = open(out2 / f'M.{art}').read()
        assert a == b, f'artifact {art} differs'


def test_two_process_four_device_mesh(tmp_path):
    """Round-3 verdict item 8: n_processes=2, each with a local 4-device
    virtual CPU mesh — the two parallelism axes combined must still
    produce single-process artifacts byte-identically."""
    _run_two_process_mesh(tmp_path, delays=(0, 0))


def test_two_process_forced_skew(tmp_path):
    """Round-3 verdict item 3: process 1 delayed 10 s, so process 0
    finishes its whole filter->primer phase first.  With the explicit
    per-process intermediate lists nothing can claim (or delete) the
    laggard's files: artifacts and counters must stay exact, and the
    in-runner ownership spy asserts no foreign intermediate is ever
    consumed."""
    _run_two_process_mesh(tmp_path, delays=(0, 10))
