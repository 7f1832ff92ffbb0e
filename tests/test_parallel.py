"""Multi-chip path tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    c = {k: int(v) for k, v in out['counters'].items()}
    assert c['total_kept'] + c['total_dropped'] == args[0].shape[0]
    assert c['aligned_segments'] > 0


@pytest.mark.parametrize('n', [2, 8])
def test_dryrun_multichip(n):
    graft.dryrun_multichip(n)


def test_sharded_matches_single_device():
    """The sharded step must produce identical per-read outputs."""
    from fslr_tpu.config import PipelineConfig
    from fslr_tpu.parallel.mesh import make_mesh, replicate, shard_reads
    from fslr_tpu.parallel.step import make_device_step, make_sharded_step

    L = 512
    args, NP = graft._example_inputs(L=L, B=16)
    config = PipelineConfig()
    n_seed = (L - config.align.seed_k) // config.align.seed_stride + 1

    single = jax.jit(make_device_step(config, NP, L, n_seed))(*args)

    mesh = make_mesh(4)
    step = make_sharded_step(mesh, config, NP, L, n_seed)
    reads, lens = shard_reads(mesh, args[0], args[1])
    rest = replicate(mesh, *args[2:])
    sharded = step(reads, lens, *rest)

    for key in ('junk', 'concat', 'p1_scores', 'sel_score', 'sel_chosen'):
        np.testing.assert_array_equal(np.asarray(single[key]),
                                      np.asarray(sharded[key]), err_msg=key)
    for key, v in single['counters'].items():
        assert int(v) == int(sharded['counters'][key]), key


def test_production_pipeline_sharded_artifacts_identical(tmp_path):
    """THE multi-chip guarantee: running the PRODUCTION pipeline with every
    stage kernel shard_mapped over an 8-device mesh produces artifacts
    byte-for-byte identical to the single-device run (VERDICT round-1
    item 1)."""
    from fslr_tpu.config import PipelineConfig
    from fslr_tpu.parallel.mesh import make_mesh
    from fslr_tpu.pipeline import run_pipeline

    ref_path, fq_dir = graft.write_tiny_dataset(str(tmp_path))

    def run(tag, mesh):
        out = str(tmp_path / f'out_{tag}')
        config = PipelineConfig(name='P', out=out, ref=ref_path,
                                primers=('21q1', '17p6'), basecalled=fq_dir)
        run_pipeline(config, backend='jax', mesh=mesh)
        return out

    out1 = run('single', None)
    out8 = run('mesh8', make_mesh(8))

    for suffix in ('.mappings.bed', '.mappings.cluster.bed',
                   '.mappings.representative.bed',
                   '.filter_counts_summary.csv', '.without_primers.fq',
                   '.bwa_dodi.bam'):
        with open(f'{out1}/P{suffix}', 'rb') as f1, \
             open(f'{out8}/P{suffix}', 'rb') as f8:
            assert f1.read() == f8.read(), suffix


def test_distributed_cluster_merge():
    """Per-shard edges all-gathered over the mesh give the same components
    as a single-host computation."""
    from fslr_tpu.ops.components import connected_components_padded
    from fslr_tpu.parallel.cluster_merge import merged_components
    from fslr_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    n_nodes = 64
    all_edges = rng.integers(0, n_nodes, size=(40, 2)).astype(np.int32)
    single = np.asarray(connected_components_padded(all_edges, n_nodes))

    mesh = make_mesh(4)
    shards = np.array_split(all_edges, 4)
    merged = merged_components(mesh, shards, n_nodes, max_local_edges=16)
    np.testing.assert_array_equal(single, merged)
