"""Golden-snapshot regression test.

A small fixed scenario's ``mappings.bed`` is pinned row-for-row so that
refactors of the aligner/selection/mapping stages cannot silently change
the observable output contract.  Regenerate deliberately with:

    python tests/test_golden_snapshot.py --regen
"""

import os

import numpy as np
import pandas as pd
import pytest

from fslr_tpu.config import PipelineConfig
from fslr_tpu.encode import decode, revcomp_str
from fslr_tpu.panel import load_panel
from fslr_tpu.pipeline import run_pipeline
from tests.oracles import mutate, random_seq

GOLDEN = os.path.join(os.path.dirname(__file__), 'golden',
                      'mappings.golden.bed')


def _build(tmp_root):
    rng = np.random.default_rng(2024)
    chrA = random_seq(rng, 400_000)
    chrB = random_seq(rng, 400_000)
    ref_path = os.path.join(tmp_root, 'ref.fa')
    with open(ref_path, 'w') as fh:
        fh.write('>chrA\n' + decode(chrA) + '\n>chrB\n' + decode(chrB)
                 + '\n')
    panel = load_panel().subset(['21q1', '17p6'])
    t21 = panel.targets['21q1']
    t17rc = revcomp_str(panel.targets['17p6'])
    reads = []
    for i in range(6):
        seq = (t21 + decode(chrA[100_000:100_800])
               + decode(chrB[200_000 + i % 2 * 1000:201_000
                             + i % 2 * 1000])
               + decode(chrA[300_000:300_800]) + t17rc)
        reads.append((f'r{i}', seq))
    # one mutated read (exercises indel CIGARs deterministically)
    mseq = decode(mutate(rng, np.concatenate(
        [chrA[150_000:151_500]]), sub=0.03, indel=0.01))
    reads.append(('m0', t21 + mseq))
    fq_dir = os.path.join(tmp_root, 'reads')
    os.makedirs(fq_dir, exist_ok=True)
    with open(os.path.join(fq_dir, 'b.fastq'), 'w') as fh:
        for name, seq in reads:
            fh.write(f'@{name}\n{seq}\n+\n{"I" * len(seq)}\n')
    return ref_path, fq_dir


def _run(tmp_root):
    ref_path, fq_dir = _build(tmp_root)
    out = os.path.join(tmp_root, 'out')
    config = PipelineConfig(name='G', out=out, ref=ref_path,
                            primers=('21q1', '17p6'), basecalled=fq_dir,
                            skip_clustering=True)
    run_pipeline(config, backend='jax')
    df = pd.read_csv(os.path.join(out, 'G.mappings.bed'), sep='\t')
    # fslr_version changes release to release; seq is pinned separately
    return df.drop(columns=['fslr_version'])


def test_mappings_bed_matches_golden(tmp_path):
    if not os.path.exists(GOLDEN):
        pytest.skip('golden file missing; run --regen')
    df = _run(str(tmp_path))
    gold = pd.read_csv(GOLDEN, sep='\t')
    pd.testing.assert_frame_equal(df.reset_index(drop=True),
                                  gold.reset_index(drop=True),
                                  check_dtype=False)


if __name__ == '__main__':
    import sys
    import tempfile
    if '--regen' in sys.argv:
        import jax
        jax.config.update('jax_platforms', 'cpu')
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        df = _run(tempfile.mkdtemp())
        df.to_csv(GOLDEN, sep='\t', index=False)
        print(f'wrote {GOLDEN} ({len(df)} rows)')
