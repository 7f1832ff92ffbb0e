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
