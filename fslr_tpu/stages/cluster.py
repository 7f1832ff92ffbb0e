"""Breakpoint clustering: the reference cluster.py + main.py:190-352 block.

Replicated semantics (citations into /root/reference/fslr/):

  * rename_chromosomes (cluster.py:34-43): numeric chromosome ids sorted by
    the chrN-numeric key.  The reference sorts a *set* (process-dependent
    tie order for non-chrN names); we fix the deterministic tie-break
    (numeric key, name).
  * delete_false (cluster.py:80-86): drop qnames containing 'False'.
  * keep_fillings (cluster.py:14-31): drop each read's first & last
    alignment rows ("bread"), qlen2 = interior span.
  * filter_high_coverage (cluster.py:52-77): numpy diff-array coverage,
    drop intervals whose midpoint coverage > 10000.
  * prepare_data (cluster.py:109-121): start/end normalization, middle,
    stable sort by start, subtelomere/chromosome masking (cluster.py:89-106;
    the reference's final "reduced to 1 interval" branch compares the
    *whole dataset* length and is unreachable — we mirror the loop only).
  * query_interval_trees (cluster.py:187-227): per-chrom interval search
    (sorted starts + prefix-max ends instead of superintervals; results in
    ascending-start order), pair dedup via seen_edges, qlen2/n_alignments
    gate (cluster.py:178-183), greedy Jaccard (ops/jaccard.py) with
    per-intersection-count thresholds and the soft edge cap of 10
    (main.py:221, cluster.py:223-224).  Pair similarities are computed in
    one batched device call over the (cap-unaware) superset of candidate
    pairs — every pair the reference traversal tests is in the superset and
    its Jaccard value does not depend on where it is tested — then the
    reference loop (including the cap's break behavior) is replayed exactly.
  * connected components (cluster.py:230-234) via ops/components.py, with
    cluster ordering = first-seen node order, matching
    networkx.connected_components iteration.
  * main.py:207-352 post-processing: melt to (cluster, qname, n_reads),
    early exit when the graph has no edges ("No clusters were found."),
    merge onto the bed, singleton cluster ids, chrom restore, and
    choose_alignment representatives (cluster.py:237-254).
"""

from __future__ import annotations

import dataclasses
from collections import namedtuple

import numpy as np
import pandas as pd

from fslr_tpu.config import ClusterConfig
from fslr_tpu.ops import components, jaccard

IntervalItem = namedtuple(
    'IntervalItem',
    ['chrom', 'start', 'end', 'aln_size', 'qname', 'n_alignments', 'qlen2',
     'middle', 'index'])


def rename_chromosomes(bed_file, chromosome_lengths, chromosome_mask):
    def sort_key(x):
        num = (int(x[3:]) if x[:3] == 'chr' and x[3:].isdigit()
               else float('inf'))
        return (num, x)
    chromosome_names = sorted(set(bed_file['chrom'].unique().tolist()),
                              key=sort_key)
    cmap = {name: i + 1 for i, name in enumerate(chromosome_names)}
    chr_lengths = {cmap.get(k): v for k, v in chromosome_lengths.items()}
    bed_file = bed_file.copy()
    bed_file['chrom'] = bed_file['chrom'].map(cmap)
    chromosome_mask = [cmap.get(x) if x != 'subtelomere' else x
                       for x in chromosome_mask]
    return bed_file, chr_lengths, chromosome_mask, cmap


def chrom_to_str(bed_df, cmap):
    num_to_str = {v: k for k, v in cmap.items()}
    bed_df = bed_df.copy()
    bed_df['chrom'] = bed_df['chrom'].map(num_to_str)
    return bed_df


def delete_false(bed_file):
    return bed_file[~bed_file['qname'].str.contains('False')]


def keep_fillings(bed_file):
    first, last = {}, {}
    for idx, qname in zip(bed_file.index, bed_file['qname']):
        if qname not in first:
            first[qname] = idx
        last[qname] = idx
    to_drop = list(first.values()) + list(last.values())
    bed_file = bed_file[~bed_file.index.isin(to_drop)].copy()
    qlen2 = {}
    for qname, grp in bed_file.groupby('qname'):
        qlen2[qname] = grp['qend'].max() - grp['qstart'].min()
    bed_file['qlen2'] = [qlen2[q] for q in bed_file['qname']]
    return bed_file


def calc_coverage(bed_file, chromosome_lengths):
    coverage = {}
    for chrom, group in bed_file.groupby('chrom'):
        if chrom not in chromosome_lengths:
            continue
        c = np.zeros(chromosome_lengths[chrom] + 1)
        np.add.at(c, group['rstart'].values, 1)
        np.add.at(c, group['rend'].values, -1)
        coverage[chrom] = np.cumsum(c)
    return coverage


def filter_high_coverage(data, bed_file, chromosome_lengths, threshold):
    cov = calc_coverage(bed_file, chromosome_lengths)
    return [a for a in data if cov[a.chrom][a.middle] <= threshold]


def mask_sequences(data, mask, chromosome_lengths, threshold=500_000):
    if not mask:
        return data
    chromosome_lengths = {k: v for k, v in chromosome_lengths.items()
                          if v > 1_000_000}
    out = []
    for a in data:
        if a.chrom in mask:
            continue
        if 'subtelomere' in mask:
            if a.chrom in chromosome_lengths and \
                    (a.start < threshold
                     or chromosome_lengths[a.chrom] - a.end < threshold):
                continue
        out.append(a)
    return out


def prepare_data(bed_df, cluster_mask, chromosome_lengths,
                 threshold=500_000):
    bed_df = bed_df.copy()
    bed_df['start'] = np.minimum(bed_df['rstart'], bed_df['rend'])
    bed_df['end'] = np.maximum(bed_df['rstart'], bed_df['rend'])
    bed_df['middle'] = bed_df['aln_size'] // 2 + bed_df['start']
    bed_df = bed_df.sort_values('start', kind='stable')
    columns = ['chrom', 'start', 'end', 'aln_size', 'qname', 'n_alignments',
               'qlen2', 'middle']
    data = [IntervalItem(*vals) for vals in
            zip(*(bed_df[c] for c in columns), bed_df.index)]
    if cluster_mask:
        data = mask_sequences(data, cluster_mask, chromosome_lengths,
                              threshold)
    return data


def different_lengths_or_alignments(itv1, itv2, qlen_diff, diff):
    if (min(itv1.qlen2, itv2.qlen2)
            / max(itv1.qlen2, itv2.qlen2)) >= 1 - qlen_diff:
        return False
    if (min(itv1.n_alignments, itv2.n_alignments)
            / max(itv1.n_alignments, itv2.n_alignments)) >= 1 - diff:
        return False
    return True


class _ChromIndex:
    """Sorted starts + prefix-max ends per chromosome; overlap queries in
    ascending-start order.  ``all_neighbors`` vectorizes the full
    self-join (every interval's overlap list) in one numpy pass."""

    def __init__(self, data):
        self.by_chrom = {}
        for itv in data:
            self.by_chrom.setdefault(itv.chrom, []).append(itv)
        self.arrays = {}
        for chrom, items in self.by_chrom.items():
            starts = np.array([i.start for i in items])
            ends = np.array([i.end for i in items])
            pmax = np.maximum.accumulate(ends)
            self.arrays[chrom] = (starts, ends, pmax, items)

    def search(self, chrom, start, end):
        if chrom not in self.arrays:
            return []
        starts, ends, pmax, items = self.arrays[chrom]
        hi = np.searchsorted(starts, end, side='right')
        lo = np.searchsorted(pmax[:hi], start, side='left')
        if lo >= hi:
            return []
        sel = np.nonzero(ends[lo:hi] >= start)[0] + lo
        return [items[i] for i in sel]

    def all_neighbors(self):
        """For every interval (as an IntervalItem), its overlapping
        intervals in ascending-start order — one vectorized join per
        chromosome.  Returns {id(item): list[IntervalItem]}."""
        out = {}
        for chrom, (starts, ends, pmax, items) in self.arrays.items():
            nc = len(items)
            hi = np.searchsorted(starts, ends, side='right')
            lo = np.searchsorted(pmax, starts, side='left')
            lo = np.minimum(lo, hi)
            counts = hi - lo
            total = int(counts.sum())
            if total == 0:
                for it in items:
                    out[id(it)] = []
                continue
            qidx = np.repeat(np.arange(nc), counts)
            offs = np.concatenate([[0], np.cumsum(counts)])[:-1]
            nidx = (np.arange(total) - np.repeat(offs, counts)
                    + np.repeat(lo, counts))
            keep = ends[nidx] >= starts[qidx]
            qidx = qidx[keep]
            nidx = nidx[keep]
            split = np.searchsorted(qidx, np.arange(nc + 1))
            for qi in range(nc):
                out[id(items[qi])] = [items[j]
                                      for j in nidx[split[qi]:split[qi + 1]]]
        return out


def query_graph(data, overlap_cutoff, jaccard_cutoffs, edge_threshold,
                qlen_diff, n_aln_diff, cfg: ClusterConfig):
    """Returns (match_df, edges list in add order, node first-seen order)."""
    query_intervals = {}
    for itv in data:
        query_intervals.setdefault(itv.qname, []).append(itv)
    index = _ChromIndex(data)

    def as_tuples(lst):
        return [(i.chrom, i.start, i.end, i.aln_size) for i in lst]

    # integer read ids + per-read padded interval arrays (scale path:
    # string-keyed sets and per-pair tuple lists thrash at 10k+ reads)
    qnames_order = list(query_intervals.keys())
    qid = {q: i for i, q in enumerate(qnames_order)}
    R = len(qnames_order)
    M = cfg.max_intervals_per_read
    chrom_a = np.zeros((R, M), np.int32)
    start_a = np.zeros((R, M), np.int32)
    end_a = np.zeros((R, M), np.int32)
    size_a = np.zeros((R, M), np.float32)
    valid_a = np.zeros((R, M), bool)
    lens_a = np.zeros(R, np.int32)
    for q, lst in query_intervals.items():
        r = qid[q]
        lens_a[r] = len(lst)
        for i, itv in enumerate(lst[:M]):
            chrom_a[r, i] = itv.chrom
            start_a[r, i] = itv.start
            end_a[r, i] = itv.end
            size_a[r, i] = itv.aln_size
            valid_a[r, i] = True

    # phase 1 (fully vectorized): the cap-unaware candidate-pair SET.
    # Greedy Jaccard is role-dependent and the edge cap's break can make
    # the replay test a pair from either read's perspective, so both
    # orientations are computed.  Gate/dedup order doesn't matter here —
    # only the replay's traversal order does.
    qlen2_arr = np.zeros(R, np.float64)
    naln_arr = np.zeros(R, np.float64)
    for q, lst in query_intervals.items():
        qlen2_arr[qid[q]] = lst[0].qlen2
        naln_arr[qid[q]] = lst[0].n_alignments
    neighbors = index.all_neighbors()
    pair_keys = []
    for chrom, (starts, ends, pmax, items) in index.arrays.items():
        rid_arr = np.array([qid[i.qname] for i in items], np.int64)
        nc = len(items)
        hi = np.searchsorted(starts, ends, side='right')
        lo = np.minimum(np.searchsorted(pmax, starts, side='left'), hi)
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            continue
        qx = np.repeat(np.arange(nc), counts)
        offs = np.concatenate([[0], np.cumsum(counts)])[:-1]
        nx = (np.arange(total) - np.repeat(offs, counts)
              + np.repeat(lo, counts))
        keep = ends[nx] >= starts[qx]
        a = rid_arr[qx[keep]]
        b = rid_arr[nx[keep]]
        ok = a != b
        a, b = a[ok], b[ok]
        pair_keys.append(np.minimum(a, b) * R + np.maximum(a, b))
    if pair_keys:
        keys = np.unique(np.concatenate(pair_keys))
        pa = (keys // R).astype(np.int64)
        pb = (keys % R).astype(np.int64)
        # the qlen2 / n_alignments gate, vectorized
        q_ok = (np.minimum(qlen2_arr[pa], qlen2_arr[pb])
                / np.maximum(np.maximum(qlen2_arr[pa], qlen2_arr[pb]),
                             1e-12)) >= 1 - qlen_diff
        n_ok = (np.minimum(naln_arr[pa], naln_arr[pb])
                / np.maximum(naln_arr[pa], naln_arr[pb])) >= 1 - n_aln_diff
        gate = q_ok | n_ok          # "not different"
        pa, pb = pa[gate], pb[gate]
    else:
        pa = pb = np.zeros(0, np.int64)

    pair_arr = np.concatenate([
        np.stack([pa, pb], 1), np.stack([pb, pa], 1)]).astype(np.int32)
    j_arr, n_arr = jaccard.jaccard_pairs_indexed(
        pair_arr, chrom_a, start_a, end_a, size_a, valid_a,
        np.minimum(lens_a, M), overlap_cutoff, M=M)
    # reads with more than M intervals: exact host computation
    over = set(np.nonzero(lens_a > M)[0].tolist())
    if over:
        for i in range(len(pair_arr)):
            qa, qb = int(pair_arr[i, 0]), int(pair_arr[i, 1])
            if qa in over or qb in over:
                j_arr[i], n_arr[i] = jaccard.jaccard_host(
                    as_tuples(query_intervals[qnames_order[qa]]),
                    as_tuples(query_intervals[qnames_order[qb]]),
                    overlap_cutoff)
    jmap = {(int(pair_arr[i, 0]), int(pair_arr[i, 1])):
            (float(j_arr[i]), int(n_arr[i]))
            for i in range(len(pair_arr))}

    # phase 2: exact replay of the reference traversal with the edge cap
    seen = set()
    match = set()
    edges = []
    node_pos = {}

    def note(n):
        if n not in node_pos:
            node_pos[n] = len(node_pos)

    for query_key, list1 in query_intervals.items():
        qa = qid[query_key]
        edge_count = 0
        for itv in list1:
            for o in neighbors[id(itv)]:
                qb = qid[o.qname]
                if qb == qa:
                    continue
                b = (qa * R + qb) if qa < qb else (qb * R + qa)
                if b in seen:
                    continue
                seen.add(b)
                if different_lengths_or_alignments(itv, o, qlen_diff,
                                                   n_aln_diff):
                    continue
                key = (qa, qb)
                if key not in jmap:
                    # The edge cap's break re-orders some encounters vs the
                    # cap-unaware phase-1 traversal, and greedy Jaccard is
                    # role-dependent — compute the missing orientation
                    # exactly on host (same greedy-first-match semantics).
                    jmap[key] = jaccard.jaccard_host(
                        as_tuples(query_intervals[query_key]),
                        as_tuples(query_intervals[o.qname]),
                        overlap_cutoff)
                j, n_i = jmap[key]
                if n_i == 0:
                    continue
                target = (jaccard_cutoffs[n_i - 1]
                          if n_i - 1 < len(jaccard_cutoffs)
                          else jaccard_cutoffs[-1])
                if j >= target:
                    match.add((query_key, o.qname, j))
                    note(query_key)
                    note(o.qname)
                    edges.append((query_key, o.qname))
                    edge_count += 1
                if edge_count >= edge_threshold:
                    break

    match_df = pd.DataFrame(
        match, columns=['query1', 'query2', 'jaccard_similarity'])
    return match_df, edges, node_pos


def get_subgraphs(edges, node_pos):
    """Connected components as a list of qname sets, ordered by first-seen
    node (networkx iteration order)."""
    if not edges:
        return []
    n = len(node_pos)
    names = [None] * n
    for name, pos in node_pos.items():
        names[pos] = name
    earr = np.array([[node_pos[a], node_pos[b]] for a, b in edges],
                    dtype=np.int32)
    labels = np.asarray(components.connected_components_padded(earr, n))
    comp_order = []
    comp_members = {}
    for pos in range(n):
        lbl = int(labels[pos])
        if lbl not in comp_members:
            comp_members[lbl] = set()
            comp_order.append(lbl)
        comp_members[lbl].add(names[pos])
    return [comp_members[lbl] for lbl in comp_order]


def choose_alignment(bed_file):
    qname_grouped = bed_file.groupby('qname')
    avg_scores = qname_grouped['alignment_score'].mean()
    bed_file = bed_file.copy()
    bed_file['avg_alignment_score'] = bed_file['qname'].map(avg_scores)
    selected_reads = []
    for cluster_id, group in bed_file.groupby('cluster'):
        selected_reads.append(
            group.loc[group['avg_alignment_score'].idxmax()]['qname'])
    return bed_file[bed_file['qname'].isin(selected_reads)]


@dataclasses.dataclass
class ClusterResult:
    cluster_bed: pd.DataFrame | None
    representative_bed: pd.DataFrame | None
    no_clusters: bool
    subgraphs: list | None = None


def cluster_stage(bed_file: pd.DataFrame, chromosome_lengths: dict,
                  cfg: ClusterConfig) -> ClusterResult:
    """The main.py:207-352 clustering block."""
    chromosome_mask = set()
    if cfg.cluster_mask:
        allowed = set(bed_file['chrom'])
        for item in cfg.cluster_mask:
            if item in allowed or item == 'subtelomere':
                chromosome_mask.add(item)

    bed_file, chr_lengths, chromosome_mask, cmap = rename_chromosomes(
        bed_file, chromosome_lengths, chromosome_mask)
    if cfg.filter_false:
        bed_file = delete_false(bed_file)

    fillings = keep_fillings(bed_file)
    data = prepare_data(fillings, chromosome_mask, chr_lengths,
                        cfg.subtelomere_threshold)
    if cfg.filter_high_coverage:
        # The reference passes the fillings DataFrame straight into
        # filter_high_coverage, whose `for aln in data: aln.chrom` loop
        # cannot work on a DataFrame (main.py:234-235, cluster.py:70-77) —
        # the flag crashes upstream.  We implement the documented intent:
        # drop IntervalItems whose midpoint coverage exceeds the threshold.
        data = filter_high_coverage(data, bed_file, chr_lengths,
                                    cfg.high_coverage_threshold)

    match_df, edges, node_pos = query_graph(
        data, cfg.overlap, list(cfg.jaccard_cutoffs), cfg.edge_threshold,
        cfg.qlen_diff, cfg.n_alignment_diff, cfg)
    subgraphs = get_subgraphs(edges, node_pos)

    n_nodes = len(node_pos)
    if len(subgraphs) == n_nodes:       # true iff no edges
        return ClusterResult(None, None, True, subgraphs)

    subg_df = pd.DataFrame(subgraphs).T
    subg_long = pd.melt(subg_df, var_name='cluster',
                        value_name='qname').dropna()
    subg_long['cluster'] = pd.to_numeric(subg_long['cluster'],
                                         errors='coerce')
    n_reads = subg_long['cluster'].value_counts().rename('n_reads')
    subg_long_reads = pd.merge(subg_long, n_reads, on='cluster')

    bed_file = bed_file.merge(subg_long_reads, on='qname', how='left')
    n_cluster = max(subg_long_reads['cluster']) + 1
    singles = bed_file[~bed_file['qname'].isin(subg_long_reads['qname'])][
        'qname'].unique()
    all_reads = n_cluster + len(singles)
    singleton = pd.DataFrame({'qname': singles.tolist(),
                              'cluster': range(n_cluster, all_reads)})
    bed_file['cluster'] = bed_file['cluster'].fillna(
        bed_file['qname'].map(singleton.set_index('qname')['cluster']))
    bed_file['n_reads'] = bed_file['n_reads'].fillna(1)

    bed_file = chrom_to_str(bed_file, cmap)
    rep = choose_alignment(bed_file)
    return ClusterResult(bed_file, rep, False, subgraphs)
