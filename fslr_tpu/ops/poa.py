"""Per-cluster consensus via batched banded alignment + pileup (N5).

Replaces abpoa (/root/reference/fslr/consensus_seq.py:32-37).  Design: the
partial-order-alignment graph DP is replaced by a backbone pileup —
every member read is banded-aligned (with traceback, ops/traceback.py)
against the cluster's backbone read in ONE batched device call across all
clusters, then per-backbone-column votes (base / deletion / insertion)
are tallied and the majority column calls form the consensus.

For amplicon clusters (same molecule, nanopore error ~5-10%) a backbone
pileup and POA give near-identical consensus; the batched-alignment
formulation keeps all heavy compute on the MXU/VPU path with fixed
shapes.  A true banded-POA kernel (per-cluster graph DP) is the planned
upgrade and would slot in behind the same interface.

Divergences from abpoa (documented): member reads beyond
``max_reads_per_cluster`` are subsampled evenly; reads whose banded
alignment to the backbone scores < 30% of the perfect score are excluded
from the pileup (abpoa would still thread them through the graph).
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from fslr_tpu.config import ConsensusConfig, ScoringConfig
from fslr_tpu.encode import decode, encode
from fslr_tpu.ops import traceback as tb


def _pad128(n):
    return ((n + 127) // 128) * 128


def consensus_sequences(clusters: list[list[str]], cfg: ConsensusConfig,
                        backend: str | None = None) -> list[str]:
    """clusters: list of member sequence lists (first member = backbone).
    Returns one consensus string per cluster.  After the first pileup, the
    consensus replaces the backbone and members are re-piled
    ``refine_iterations`` times (abpoa-style iterative refinement)."""
    cons = _consensus_once(clusters, cfg, backend)
    for _ in range(max(cfg.refine_iterations, 0)):
        refined_in = []
        for ci, members in enumerate(clusters):
            members = [m for m in members if m]
            if not members or not cons[ci]:
                refined_in.append(members)
            else:
                refined_in.append([cons[ci]] + members)
        cons = _consensus_once(refined_in, cfg, backend)
    return cons


def _consensus_once(clusters: list[list[str]], cfg: ConsensusConfig,
                    backend: str | None = None) -> list[str]:
    sc = ScoringConfig(gap_open_is_first_base=False)
    jobs = []          # (cluster_idx, member_seq, backbone)
    backbones = []
    for ci, members in enumerate(clusters):
        members = [m for m in members if m]
        if not members:
            backbones.append('')
            continue
        backbone = members[0]
        backbones.append(backbone)
        rest = members[1:]
        cap = cfg.max_reads_per_cluster - 1
        if len(rest) > cap:
            idx = np.linspace(0, len(rest) - 1, cap).astype(int)
            rest = [rest[i] for i in idx]
        for m in rest:
            jobs.append((ci, m, backbone))

    # batch alignments by length bucket
    by_bucket: dict[int, list[int]] = {}
    for ji, (ci, m, b) in enumerate(jobs):
        L = _pad128(min(max(len(m), 1), cfg.max_length))
        by_bucket.setdefault(L, []).append(ji)

    piles = {}         # cluster -> (base_votes, del_votes, ins, n_members)
    for ci, backbone in enumerate(backbones):
        if not backbone:
            continue
        Lb = len(backbone)
        piles[ci] = (np.zeros((Lb, 4), np.int32), np.zeros(Lb, np.int32),
                     {}, 1)

    for L, jidx in sorted(by_bucket.items()):
        N = len(jidx)
        q = np.full((N, L), 4, np.uint8)
        w = np.full((N, L + 256), 4, np.uint8)
        qlens = np.zeros(N, np.int32)
        for r, ji in enumerate(jidx):
            ci, m, b = jobs[ji]
            mc = encode(m)[:L]
            q[r, :len(mc)] = mc
            qlens[r] = len(mc)
            # centre the backbone in the band: window starts 128 before
            bc = encode(b)[:L + 128]
            w[r, 128:128 + len(bc)] = bc
        score, qend, lane, bits = tb.banded_sw_tb(q, w, qlens, sc,
                                                  backend=backend)
        score = np.asarray(score)
        qend = np.asarray(qend)
        lane = np.asarray(lane)
        ops, n_ops, i_fin, l_fin = tb.walk_paths(np.asarray(bits), qend,
                                                 lane)
        for r, ji in enumerate(jidx):
            ci, m, b = jobs[ji]
            if score[r] < 0.3 * 2 * min(len(m), len(b)):
                continue
            cigar = tb.ops_to_cigar(ops[r], int(n_ops[r]))
            base_votes, del_votes, ins, nm = piles[ci]
            qi = int(i_fin[r]) + 1
            ri = qi + int(l_fin[r]) - 128        # backbone coordinate
            mc = encode(m)
            Lb = len(b)
            for (n, op) in cigar:
                if op == 'M':
                    for t in range(n):
                        if 0 <= ri + t < Lb and mc[qi + t] < 4:
                            base_votes[ri + t, mc[qi + t]] += 1
                    qi += n
                    ri += n
                elif op == 'I':
                    if 0 <= ri < Lb:
                        ins.setdefault(ri, []).append(
                            decode(mc[qi:qi + n]))
                    qi += n
                elif op == 'D':
                    for t in range(n):
                        if 0 <= ri + t < Lb:
                            del_votes[ri + t] += 1
                    ri += n
            piles[ci] = (base_votes, del_votes, ins, nm + 1)

    out = []
    for ci, backbone in enumerate(backbones):
        if not backbone:
            out.append('')
            continue
        base_votes, del_votes, ins, nm = piles[ci]
        bc = encode(backbone)
        Lb = len(bc)
        votes = base_votes.copy()
        for i in range(Lb):
            if bc[i] < 4:
                votes[i, bc[i]] += 1             # backbone's own vote
        best = votes.argmax(axis=1)
        best_n = votes.max(axis=1)
        keep = best_n >= del_votes                # deletion majority drops
        parts = []
        half = nm / 2.0
        for i in range(Lb):
            if i in ins and len(ins[i]) > half:
                parts.append(Counter(ins[i]).most_common(1)[0][0])
            if keep[i] and votes[i].sum() > 0:
                parts.append('ACGT'[best[i]])
        out.append(''.join(parts))
    return out
