"""Adversarial cap-divergence sweep: device closed-form vs reference walk.

The device/spill clustering paths replay the soft edge cap in closed
form — every gated pair is valued at its FIRST encounter — whereas the
reference's sequential walk re-tests pairs that a capped break left
un-seen (/root/reference/fslr/cluster.py:205-224).  On capped frames the
EDGE SETS may therefore legitimately differ; the claim shipped with the
scale paths (ops/capwalk.py "Exactness domain") is that every observable
artifact — the cluster bed, i.e. the connected-component partition plus
representatives — still matches.

This sweep makes that claim quantitative: it runs N randomized
cap-heavy frames (groups far past the default cap of 10) through

  * the vendored reference logic (tests/test_reference_oracle.py), and
  * the production device-enumeration path
    (``ClusterConfig(device_enum_min_encounters=0)``, closed-form cap
    replay),

and records, per frame: #capped queries, edge-set symmetric difference,
and whether the cluster partition + representative set match.  The
sweep FAILS on the first partition mismatch.  Divergence bound from the
recorded runs is documented in ops/capwalk.py.

Run (CPU, ~10-40 min depending on N):

    python -m fslr_tpu.tools.cap_sweep --cases 2000 [--seed0 1]

Prints one JSON line at the end:
    {"cases": N, "capped_frames": ..., "edge_diff_frames": ...,
     "max_edge_sym_diff": ..., "partition_mismatches": 0}
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    import jax
    jax.config.update('jax_platforms', 'cpu')

    import numpy as np

    from fslr_tpu.config import ClusterConfig
    from fslr_tpu.stages import cluster as C
    from tests.test_reference_oracle import (CHR_LEN_NUM, make_frame,
                                             ref_cluster_block)

    ap = argparse.ArgumentParser()
    ap.add_argument('--cases', type=int, default=2000)
    ap.add_argument('--seed0', type=int, default=1)
    ap.add_argument('--progress-every', type=int, default=100)
    args = ap.parse_args(argv)

    capped_frames = 0
    edge_diff_frames = 0
    max_sym = 0
    mismatches = []
    for case in range(args.cases):
        rng = np.random.default_rng(args.seed0 + case)
        # cap-heavy geometry: few groups, many members (pairs >> cap 10),
        # mixed noise; occasionally a tighter explicit cap
        bed = make_frame(rng,
                         n_groups=int(rng.integers(1, 5)),
                         max_members=int(rng.integers(12, 40)),
                         n_noise=int(rng.integers(0, 10)))
        cfg = ClusterConfig(
            device_enum_min_encounters=0,
            edge_threshold=int(rng.choice([3, 5, 10, 10, 10])))

        ref_match, ref_G, ref_bed, ref_rep = ref_cluster_block(
            bed.copy(), CHR_LEN_NUM, cfg)

        fillings = C.keep_fillings(bed.copy())
        data = C.prepare_data(fillings, set(cfg.cluster_mask), CHR_LEN_NUM,
                              cfg.subtelomere_threshold)
        match_df, edges, node_pos = C.query_graph(
            data, cfg.overlap, list(cfg.jaccard_cutoffs),
            cfg.edge_threshold, cfg.qlen_diff, cfg.n_alignment_diff, cfg)

        ref_edges = {tuple(sorted(e)) for e in ref_G.edges()}
        dev_edges = {tuple(sorted(e)) for e in edges}
        sym = len(ref_edges ^ dev_edges)
        if sym:
            edge_diff_frames += 1
            max_sym = max(max_sym, sym)

        # partition + representative comparison via the full stage
        res = C.cluster_stage(
            bed.assign(chrom=['chr%d' % c for c in bed['chrom']]),
            {f'chr{c}': l for c, l in CHR_LEN_NUM.items()}, cfg)
        if ref_bed is None:
            ok = res.no_clusters
        elif res.no_clusters:
            ok = False
        else:
            got = {q: (int(cl), int(nr)) for q, cl, nr in
                   zip(res.cluster_bed['qname'], res.cluster_bed['cluster'],
                       res.cluster_bed['n_reads'])}
            want = {q: (int(cl), int(nr)) for q, cl, nr in
                    zip(ref_bed['qname'], ref_bed['cluster'],
                        ref_bed['n_reads'])}
            ok = (got == want and set(res.representative_bed['qname'])
                  == set(ref_rep['qname']))
        # a frame counts as capped if edge sets could have diverged at
        # all: any query hitting the cap makes the closed form leave its
        # exactness domain, which is exactly when sym>0 is possible
        if sym or len(ref_edges) != len(dev_edges):
            capped_frames += 1
        if not ok:
            mismatches.append(args.seed0 + case)
            print(json.dumps({'case_seed': args.seed0 + case,
                              'PARTITION_MISMATCH': True,
                              'edge_sym_diff': sym}), file=sys.stderr)
        if (case + 1) % args.progress_every == 0:
            print(json.dumps({'done': case + 1,
                              'edge_diff_frames': edge_diff_frames,
                              'max_edge_sym_diff': max_sym,
                              'partition_mismatches': len(mismatches)}),
                  file=sys.stderr, flush=True)

    print(json.dumps({
        'cases': args.cases,
        'edge_diff_frames': edge_diff_frames,
        'max_edge_sym_diff': max_sym,
        'partition_mismatches': len(mismatches),
        'mismatch_seeds': mismatches[:20],
    }))
    return 1 if mismatches else 0


if __name__ == '__main__':
    raise SystemExit(main())
