#!/usr/bin/env python
"""End-to-end benchmark: synthetic amplicon config -> reads/s.

Runs the full pipeline (filter -> primer ID -> align+select -> mapping
table -> clustering) on a synthetic fusion dataset (BASELINE.json config-1
scale: 1k reads, 2-primer panel, small reference) on the default backend
(the real TPU chip), and prints ONE JSON line:

  {"metric": ..., "value": reads/s, "unit": "reads/s", "vs_baseline": r}

vs_baseline is measured against the same pipeline forced onto the host CPU
backend (the reference pipeline's native CPU tools are not installed in
this image, so the CPU baseline is this engine's own CPU execution; the
result is cached in .bench_baseline.json).  First invocation pays Pallas
compile time into the persistent XLA cache; the reported number is the
best of three warm runs (steady state: the tunnelled TPU link's latency
fluctuates several-fold between runs).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

N_READS = 1000
N_READS_CPU = 1000     # full config-1 scale (round-3: best of 3 runs)
REF_MB = 2_000_000


def make_dataset(root, n_reads=N_READS, n_groups=20, ref_mb=None):
    import numpy as np

    from fslr_tpu.encode import decode, revcomp_str
    from fslr_tpu.panel import load_panel

    if ref_mb is None:
        # size the reference so breakpoint groups never overlap (span >=
        # 1500 bp vs 1000 bp interior intervals): cross-group interval
        # overlap would inflate the pair set ~7x past what the measured
        # configuration intends
        ref_mb = max(REF_MB, 700_000 + n_groups * 1500 + 100_000)
    rng = np.random.default_rng(123)
    chrA = rng.integers(0, 4, ref_mb).astype(np.uint8)
    chrB = rng.integers(0, 4, ref_mb).astype(np.uint8)
    ref_path = os.path.join(root, 'ref.fa')
    with open(ref_path, 'w') as fh:
        fh.write('>chrA\n' + decode(chrA) + '\n>chrB\n' + decode(chrB) + '\n')
    panel = load_panel().subset(['21q1', '17p6'])
    t21 = panel.targets['21q1']
    t17rc = revcomp_str(panel.targets['17p6'])

    def sub(arr, lo, n):
        return decode(arr[lo:lo + n])

    fq_dir = os.path.join(root, 'reads')
    os.makedirs(fq_dir, exist_ok=True)
    path = os.path.join(fq_dir, 'b0.fastq')
    # span 40k for the historical 20-group configs (round-over-round
    # comparability); packed tighter only when n_groups needs it
    span = max(1, min(40_000, (ref_mb - 700_000) // n_groups))
    with open(path, 'w', buffering=1 << 22) as fh:
        for i in range(n_reads):
            g = i % n_groups
            bpos = 600_000 + g * span
            seq = (t21 + sub(chrA, 1_000_000, 800) + sub(chrB, bpos, 1000)
                   + sub(chrA, 1_200_000, 800) + t17rc)
            fh.write(f'@r{i}\n{seq}\n+\n{"I" * len(seq)}\n')
    return ref_path, fq_dir


def run_once(root, ref_path, fq_dir, tag, consensus=False):
    import contextlib
    import json as _json

    from fslr_tpu import instrument
    from fslr_tpu.config import PipelineConfig
    from fslr_tpu.pipeline import run_pipeline

    out = os.path.join(root, f'out_{tag}')
    config = PipelineConfig(name='B', out=out, ref=ref_path,
                            primers=('21q1', '17p6'), basecalled=fq_dir,
                            run_consensus=consensus)
    instrument.reset_cells()
    t0 = time.time()
    # keep stdout clean: the driver parses bench.py's single JSON line
    with contextlib.redirect_stdout(sys.stderr):
        run_pipeline(config)
    dt = time.time() - t0
    with open(os.path.join(out, 'B.timings.json')) as fh:
        stages = _json.load(fh)['timings_s']
    return dt, stages, instrument.cell_counts()


def measure(tag, n_reads=N_READS, repeats=3, consensus=False, n_groups=20):
    """`repeats` warm runs (the tunnelled TPU link's latency fluctuates
    several-fold between runs).  Returns a dict with reads/s of the BEST
    run plus the full spread (min/median/max wall and per-run per-stage
    timings) so rounds can be compared and regressions attributed —
    round-4 verdict: a single sample cannot distinguish a tunnel-latency
    spike from a real regression."""
    root = tempfile.mkdtemp(prefix='fslr_bench_')
    ref_path, fq_dir = make_dataset(root, n_reads, n_groups)
    run_once(root, ref_path, fq_dir, tag + '_warm',
             consensus=consensus)                       # compile warm-up
    runs = [run_once(root, ref_path, fq_dir, f'{tag}{r}',
                     consensus=consensus)
            for r in range(repeats)]
    walls = sorted(r[0] for r in runs)
    dt, stages, cells = min(runs, key=lambda r: r[0])
    align_s = stages.get('align', 0.0)
    total_cells = sum(cells.values())
    return {
        'reads_per_s': n_reads / dt,
        'wall_s': round(dt, 2),
        'wall_s_runs': [round(w, 2) for w in (r[0] for r in runs)],
        'wall_s_min_med_max': [round(walls[0], 2),
                               round(walls[len(walls) // 2], 2),
                               round(walls[-1], 2)],
        'stage_s': {k: round(v, 3) for k, v in sorted(
            stages.items(), key=lambda x: -x[1])},
        'stage_s_runs': [{k: round(v, 3) for k, v in r[1].items()}
                         for r in runs],
        'dp_cells': cells,
        'dp_cells_per_s': int(total_cells / dt),
        'align_dp_cells_per_s': (int(cells.get('extend', 0) / align_s)
                                 if align_s else 0),
        'stage_cells_per_s': stage_cells_per_s(cells, stages),
    }


# cell-tag -> pipeline stage (round-3 verdict item 7: per-stage device
# cells/s as a true utilization metric)
_TAG_STAGE = {'seed': 'align', 'extend': 'align', 'select': 'align',
              'sw_primer': 'find_primers', 'sw_concat': 'filter_junk',
              'hmm': 'filter_junk', 'jaccard': 'clustering',
              'profile': 'consensus'}


def stage_cells_per_s(cells, stages):
    per = {}
    for tag, n in cells.items():
        st = _TAG_STAGE.get(tag, tag)
        per[st] = per.get(st, 0) + n
    return {st: int(n / stages[st]) for st, n in per.items()
            if stages.get(st, 0) > 0.05}


def run_scale(n_reads, n_groups):
    """One-off scale measurement (configs 4-5): one cold + one warm run at
    n_reads; prints a JSON line with reads/s + stage split.  Group count
    keeps recurrent-breakpoint groups at a realistic size (the pair set of
    a group is quadratic in its size — the reference's own tree walk has
    the same scaling, fslr/cluster.py:187-227)."""
    root = tempfile.mkdtemp(prefix='fslr_scale_')
    t0 = time.time()
    ref_path, fq_dir = make_dataset(root, n_reads, n_groups)
    print(json.dumps({'dataset_s': round(time.time() - t0, 1)}),
          file=sys.stderr)
    dt, stages, cells = run_once(root, ref_path, fq_dir, 'scale')
    print(json.dumps({
        'metric': f'end-to-end pipeline reads/s ({n_reads} synthetic '
                  f'fusion reads, {n_groups} breakpoint groups; TPU chip, '
                  f'single warm-cache run)',
        'value': round(n_reads / dt, 2),
        'unit': 'reads/s',
        'wall_s': round(dt, 1),
        'stage_s': {k: round(v, 2) for k, v in sorted(
            stages.items(), key=lambda x: -x[1])},
        'dp_cells': cells,
        'stage_cells_per_s': stage_cells_per_s(cells, stages),
    }))


def run_cluster_scale(n_reads, group=700, verify_groups=5):
    """Config-5's clustering stage at its design point, standalone.

    The full 10M-read pipeline is dominated by linearly-scaling stages
    whose per-read cost is measured at 1M (filter/align/primers); the
    genuinely new regime at 10M is the BREAKPOINT CLUSTERING: ~n*group/2
    unique pairs (~3.4B at 10M reads, groups of 700), which exceeds the
    sharded in-HBM build and lands on the host-spill path
    (ops/encounters.py).  This mode synthesizes the post-keep_fillings
    interval data directly (1 interior interval per read, the shape the
    pipeline produces for the bench amplicons) and runs query_graph +
    components end to end.

    Verification: breakpoint groups are coordinate-disjoint, so a
    group's replay depends only on its own entries — the edge set of
    ``verify_groups`` groups (spread across the pair-key space, hence
    across spill buckets) is recomputed standalone on the exact host
    path and must match the at-scale device/spill output.
    """
    import numpy as np

    from fslr_tpu.config import ClusterConfig
    from fslr_tpu.stages import cluster as C

    n_groups = max(1, n_reads // group)
    rng = np.random.default_rng(7)
    print(json.dumps({'cluster_scale': n_reads, 'groups': n_groups,
                      'group_size': group,
                      'est_pairs': n_groups * group * (group - 1) // 2}),
          file=sys.stderr)

    t0 = time.time()
    # one interior interval per read; groups 5 kb apart, +-40 bp jitter
    gid = np.repeat(np.arange(n_groups, dtype=np.int64), group)
    gid = gid[:n_reads]
    base = 100_000 + gid * 5_000
    start = base + rng.integers(-40, 41, len(gid))
    end = start + 1_000 + rng.integers(-40, 41, len(gid))
    qlen2 = np.full(len(gid), 1_000, np.int64)
    naln = np.full(len(gid), 3, np.int64)
    data = [C.IntervalItem(1, int(s), int(e), float(e - s), r, 3,
                           1_000, int((e - s) // 2 + s), r)
            for r, (s, e) in enumerate(zip(start, end))]
    del qlen2, naln
    # prepare_data sorts by start; replicate so traversal order matches
    data.sort(key=lambda it: it.start)
    build_s = time.time() - t0
    print(json.dumps({'data_build_s': round(build_s, 1)}),
          file=sys.stderr)

    # exact_cap_replay off: at 10M the run uses the device/spill scale
    # paths, whose capped-walk semantics are the closed form; keeping the
    # flag off makes small-n smoke runs (host path) measure and verify
    # the same semantics
    cfg = ClusterConfig(exact_cap_replay=False)
    t0 = time.time()
    match_df, edges, node_pos = C.query_graph(
        data, cfg.overlap, list(cfg.jaccard_cutoffs), cfg.edge_threshold,
        cfg.qlen_diff, cfg.n_alignment_diff, cfg)
    subgraphs = C.get_subgraphs(edges, node_pos)
    wall = time.time() - t0

    import resource
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2 ** 20

    # ---- per-group ground-truth verification --------------------------
    vg = np.linspace(0, n_groups - 1, verify_groups).astype(np.int64)
    by_group_edges: dict[int, set] = {int(g): set() for g in vg}
    vg_set = set(int(g) for g in vg)
    for a, b in edges:
        g = int(a) // group
        if g in vg_set:
            by_group_edges[g].add(tuple(sorted((int(a), int(b)))))
    verified = 0
    for g in vg:
        g = int(g)
        rows = [it for it in data if it.qname // group == g]
        # standalone host run of just this group (read ids global);
        # exact_cap_replay off so both sides use the closed-form replay
        # (the scale paths' semantics — see ops/capwalk.py)
        m2, e2, _ = C.query_graph(
            rows, cfg.overlap, list(cfg.jaccard_cutoffs),
            cfg.edge_threshold, cfg.qlen_diff, cfg.n_alignment_diff,
            ClusterConfig(device_enum_min_encounters=1 << 62,
                          exact_cap_replay=False))
        want = {tuple(sorted((int(a), int(b)))) for a, b in e2}
        assert want == by_group_edges[g], (
            f'group {g}: at-scale edge set diverges from standalone '
            f'host replay ({len(want)} vs {len(by_group_edges[g])})')
        verified += 1

    print(json.dumps({
        'metric': f'breakpoint clustering, {n_reads} reads in '
                  f'{n_groups} groups of {group} '
                  f'(config-5 design point; TPU chip + host-spill)',
        'value': round(n_reads / wall, 2),
        'unit': 'reads/s',
        'wall_s': round(wall, 1),
        'n_edges': len(edges),
        'n_clusters': len(subgraphs),
        'peak_rss_gb': round(rss_gb, 1),
        'verified_groups': verified,
    }))


def main():
    if '--consensus' in sys.argv:
        # consensus-path bench (round-4 verdict item 6): full pipeline +
        # per-cluster POA consensus -> re-filter -> re-primer -> re-align
        # -> merge (reference consensus_seq.py:32-37, dormant there)
        n = 10 * N_READS
        if '--reads' in sys.argv:
            n = int(sys.argv[sys.argv.index('--reads') + 1])
        # realistic consensus regime (round-4 verdict item 6): many
        # clusters of ~20 reads each, so the batched POA engine sees
        # n/20 profile graphs per run rather than 20 giant clusters
        groups = max(20, n // 20)
        r = measure('cons', n_reads=n, repeats=3, consensus=True,
                    n_groups=groups)
        cells = r['dp_cells']
        cons_s = r['stage_s'].get('consensus', 0.0)
        print(json.dumps({
            'metric': f'end-to-end pipeline + POA consensus reads/s '
                      f'({n} synthetic fusion reads, {groups} clusters; '
                      f'TPU chip)',
            'value': round(r['reads_per_s'], 2),
            'unit': 'reads/s',
            'wall_s': r['wall_s'],
            'wall_s_min_med_max': r['wall_s_min_med_max'],
            'stage_s': r['stage_s'],
            'profile_cells': cells.get('profile', 0),
            'profile_cells_per_s': (int(cells.get('profile', 0) / cons_s)
                                    if cons_s else 0),
            'stage_cells_per_s': r['stage_cells_per_s'],
        }))
        return
    if '--cluster-scale' in sys.argv:
        i = sys.argv.index('--cluster-scale')
        run_cluster_scale(int(sys.argv[i + 1]))
        return
    if '--scale' in sys.argv:
        i = sys.argv.index('--scale')
        n = int(sys.argv[i + 1])
        g = (int(sys.argv[sys.argv.index('--groups') + 1])
             if '--groups' in sys.argv else max(20, n // 700))
        run_scale(n, g)
        return
    if '--cpu-baseline' in sys.argv:
        import jax
        jax.config.update('jax_platforms', 'cpu')
        r = measure('cpu', N_READS_CPU, repeats=3)
        print(json.dumps({'cpu_reads_per_s': r['reads_per_s']}))
        return

    here = os.path.dirname(os.path.abspath(__file__))
    cache = os.path.join(here, '.bench_baseline.json')
    baseline = None
    if os.path.exists(cache):
        try:
            baseline = json.load(open(cache))['cpu_reads_per_s']
        except Exception:
            baseline = None
    if baseline is None:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), '--cpu-baseline'],
            capture_output=True, text=True, timeout=3600, cwd=here)
        line = proc.stdout.strip().splitlines()[-1]
        baseline = json.loads(line)['cpu_reads_per_s']
        with open(cache, 'w') as fh:
            json.dump({'cpu_reads_per_s': baseline}, fh)

    tpu = measure('tpu')
    r10k = None
    if '--skip-10k' not in sys.argv:
        r10k = measure('tpu10k', n_reads=10 * N_READS, repeats=3)
    out = {
        'metric': 'end-to-end pipeline reads/s (1k synthetic fusion reads, '
                  '2-primer panel; TPU chip). vs_baseline = this same '
                  'engine forced onto the 2-core host CPU backend — the '
                  'reference pipeline\'s native tools (bwa/dodi/tantan) '
                  'are not installable in this image, so this is NOT a '
                  'measured ratio vs fslr itself',
        'value': round(tpu['reads_per_s'], 2),
        'unit': 'reads/s',
        'vs_baseline': (round(tpu['reads_per_s'] / baseline, 2)
                        if baseline else None),
        'wall_s_min_med_max': tpu['wall_s_min_med_max'],
        'wall_s_runs': tpu['wall_s_runs'],
        'stage_s': tpu['stage_s'],
        'stage_s_runs': tpu['stage_s_runs'],
        'align_dp_cells_per_s': tpu['align_dp_cells_per_s'],
        'dp_cells_per_s': tpu['dp_cells_per_s'],
    }
    out['stage_cells_per_s'] = tpu['stage_cells_per_s']
    if r10k is not None:
        out['reads_per_s_10k'] = round(r10k['reads_per_s'], 2)
        out['wall_s_min_med_max_10k'] = r10k['wall_s_min_med_max']
        out['wall_s_runs_10k'] = r10k['wall_s_runs']
        out['stage_s_10k'] = r10k['stage_s']
        out['stage_s_runs_10k'] = r10k['stage_s_runs']
        out['align_dp_cells_per_s_10k'] = r10k['align_dp_cells_per_s']
        out['stage_cells_per_s_10k'] = r10k['stage_cells_per_s']
    print(json.dumps(out))


if __name__ == '__main__':
    main()
