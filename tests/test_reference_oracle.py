"""Differential oracle: the reference's own executable clustering logic,
vendored, vs fslr_tpu.stages.cluster on randomized frames.

Round-3 verdict item 4 asked for exactly this: port the reference's hot
clustering path VERBATIM into tests and property-test head-to-head, so
transcription errors in the repo's mirrors are caught by the reference's
own code rather than by hand-written expectations.

Vendored (verbatim modulo the two sanctioned substitutions) from
/root/reference/fslr/:
  * cluster.py:14-31   keep_fillings
  * cluster.py:89-121  mask_sequences2 + prepare_data
  * cluster.py:133-170 calculate_overlap + overall_jaccard_similarity
  * cluster.py:178-227 different_lengths_or_alignments + query_interval_trees
  * cluster.py:230-254 get_subgraphs (real networkx) + choose_alignment
  * main.py:207-352    melt/singleton/cluster-bed post-processing block

Substitutions (the native deps are not installable here):
  * superintervals.IntervalMap.search_values -> the repo's
    _ChromIndex.search (same closed-interval overlap predicate, same
    ascending-start result order).
  * pysam BAM header -> chromosome_lengths dict passed directly.

Frames are generated with unique interval start keys: the reference's
prepare_data uses an UNSTABLE sort (pandas default quicksort), so its
behavior on duplicate starts is unspecified; the repo deliberately fixed
a stable order.  Unique keys keep the comparison well-defined.
"""

import collections

import networkx as nx
import numpy as np
import pandas as pd
import pytest

from fslr_tpu.config import ClusterConfig
from fslr_tpu.stages import cluster as C

CHR_LEN_NUM = {1: 10_000_000, 2: 10_000_000, 3: 3_000_000}


# ---------------------------------------------------------------------------
# vendored reference logic (see module docstring for provenance)
# ---------------------------------------------------------------------------

IntervalItem = collections.namedtuple(
    'interval_item',
    ['chrom', 'start', 'end', 'aln_size', 'qname', 'n_alignments', 'qlen2',
     'middle', 'index'])


def ref_keep_fillings(bed_file):                      # cluster.py:14-31
    first = {}
    last = {}
    for idx, qname in zip(bed_file.index, bed_file['qname']):
        if qname not in first:
            first[qname] = idx
            last[qname] = idx
        else:
            last[qname] = idx
    to_drop = list(first.values()) + list(last.values())
    bed_file = bed_file[~bed_file.index.isin(to_drop)]

    qlen2 = {}
    for qname, grp in bed_file.groupby('qname'):
        qlen2[qname] = grp['qend'].max() - grp['qstart'].min()
    bed_file = bed_file.copy()
    bed_file['qlen2'] = [qlen2[q] for q in bed_file['qname']]
    return bed_file


def ref_mask_sequences2(read_alignments, mask, chromosome_lengths,
                        threshold=500_000):          # cluster.py:89-106
    if not mask:
        return read_alignments
    new_alignments = []
    before = len(read_alignments)
    chromosome_lengths = {key: value for key, value
                          in chromosome_lengths.items() if value > 1000000}
    for a in read_alignments:
        if a.chrom in mask:
            continue
        if 'subtelomere' in mask:
            if a.chrom in chromosome_lengths and \
               (a.start < threshold
                    or chromosome_lengths[a.chrom] - a.end < threshold):
                continue
        new_alignments.append(a)
    if len(read_alignments) == 1 and before >= 4:
        return []
    return new_alignments


def ref_prepare_data(bed_df, cluster_mask, chromosome_lengths,
                     threshold=500_000):             # cluster.py:109-121
    bed_df = bed_df.copy()
    bed_df['start'] = np.minimum(bed_df['rstart'], bed_df['rend'])
    bed_df['end'] = np.maximum(bed_df['rstart'], bed_df['rend'])
    bed_df['middle'] = bed_df['aln_size'] // 2 + bed_df['start']
    bed_df = bed_df.sort_values('start')
    columns = ['chrom', 'start', 'end', 'aln_size', 'qname', 'n_alignments',
               'qlen2', 'middle']
    data = []
    for i in zip(*(bed_df[col] for col in columns), bed_df.index):
        data.append(IntervalItem(*i))
    if cluster_mask:
        data = ref_mask_sequences2(data, cluster_mask, chromosome_lengths,
                                   threshold)
    return data


def ref_calculate_overlap(interval1, interval2):     # cluster.py:133-136
    overlap = max(0, (min(interval1.end, interval2.end)
                      - max(interval1.start, interval2.start)))
    reciprocal_overlap = min(overlap / interval1.aln_size,
                             overlap / interval2.aln_size)
    return reciprocal_overlap


def ref_overall_jaccard_similarity(l1, l2, l2_comparisons, percentage,
                                   min_threshold):   # cluster.py:140-170
    if not l1 or not l2:
        return 0, 0
    len1 = len(l1)
    len2 = len(l2)
    len_product = len1 * len2

    l2_comparisons[:len2] = 0
    zeros = len1 + len2
    intersection = 0
    count = 0
    for i, interval1 in enumerate(l1):
        for j, interval2 in enumerate(l2):
            count += 1
            if l2_comparisons[j]:
                continue
            if interval1.chrom == interval2.chrom and \
                    ref_calculate_overlap(interval1, interval2) >= percentage:
                l2_comparisons[j] = 1
                intersection += 1
                zeros -= 2
                break
            if count / len_product < 1 - min_threshold and intersection == 0:
                continue

    union = intersection + zeros
    if union == 0:
        return 0, 0
    return intersection / union, intersection


def ref_different_lengths_or_alignments(itv1, itv2, qlen_diff,
                                        diff):       # cluster.py:178-183
    if (min(itv1.qlen2, itv2.qlen2)
            / max(itv1.qlen2, itv2.qlen2)) >= 1 - qlen_diff:
        return False
    if (min(itv1.n_alignments, itv2.n_alignments)
            / max(itv1.n_alignments, itv2.n_alignments)) >= 1 - diff:
        return False
    return True


def ref_query_interval_trees(interval_trees, data, overlap_cutoff,
                             jaccard_threshold, edge_threshold, qlen_diff,
                             diff):                  # cluster.py:187-227
    min_threshold = min(jaccard_threshold)
    query_intervals = collections.defaultdict(list)
    for itv in data:
        query_intervals[itv.qname].append(itv)
    G = nx.Graph()
    seen_edges = set([])
    match = set([])
    l2_comparisons = np.zeros(100000)

    for query_key, list1 in query_intervals.items():
        edges = 0
        for itv in list1:
            # substitution: repo _ChromIndex.search for superintervals
            # search_values (closed-interval overlap, ascending starts)
            overlap_intervals = interval_trees.search(itv.chrom, itv.start,
                                                      itv.end)
            for o_data in overlap_intervals:
                if o_data.qname == query_key:
                    continue
                b = tuple(sorted((o_data.qname, query_key)))
                if b in seen_edges:
                    continue
                seen_edges.add(b)
                if ref_different_lengths_or_alignments(itv, o_data,
                                                       qlen_diff, diff):
                    continue

                list2 = query_intervals[o_data.qname]
                j, n_i = ref_overall_jaccard_similarity(
                    list1, list2, l2_comparisons, overlap_cutoff,
                    min_threshold)
                if n_i == 0:
                    continue
                target = (jaccard_threshold[n_i - 1]
                          if n_i - 1 < len(jaccard_threshold)
                          else jaccard_threshold[-1])
                if j >= target:
                    match.add((query_key, o_data.qname, j))
                    G.add_edge(query_key, o_data.qname)
                    edges += 1
                if edges >= edge_threshold:
                    break

    match_df = pd.DataFrame(
        match, columns=['query1', 'query2', 'jaccard_similarity'])
    return match_df, G


def ref_choose_alignment(bed_file):                  # cluster.py:237-254
    qname_grouped = bed_file.groupby('qname')
    avg_scores = qname_grouped['alignment_score'].mean()
    bed_file = bed_file.copy()
    bed_file['avg_alignment_score'] = bed_file['qname'].map(avg_scores)
    cluster_grouped = bed_file.groupby('cluster')
    selected_reads = []
    for cluster_id, group in cluster_grouped:
        max_alignment_read = group.loc[
            group['avg_alignment_score'].idxmax()]['qname']
        selected_reads.append(max_alignment_read)
    selected_reads_df = bed_file[bed_file['qname'].isin(selected_reads)]
    return selected_reads_df


def ref_cluster_block(bed_file, chr_lengths, cfg):   # main.py:207-352
    """The inline clustering block, numeric chrom ids already applied."""
    fillings = ref_keep_fillings(bed_file)
    data = ref_prepare_data(fillings, set(cfg.cluster_mask), chr_lengths,
                            cfg.subtelomere_threshold)
    index = C._ChromIndex(data)          # build_interval_trees substitute
    match_df, G = ref_query_interval_trees(
        index, data, cfg.overlap, list(cfg.jaccard_cutoffs),
        cfg.edge_threshold, cfg.qlen_diff, cfg.n_alignment_diff)
    subgraphs = [sorted(s) for s in nx.connected_components(G)]

    if len(subgraphs) == G.number_of_nodes():
        return match_df, G, None, None

    subg_df = pd.DataFrame(subgraphs).T
    subg_long = pd.melt(subg_df, var_name='cluster',
                        value_name='qname').dropna()
    subg_long['cluster'] = pd.to_numeric(subg_long['cluster'],
                                         errors='coerce')
    n_reads = subg_long['cluster'].value_counts().rename('n_reads')
    subg_long_reads = pd.merge(subg_long, n_reads, on='cluster')

    bed_file = bed_file.merge(subg_long_reads, on='qname', how='left')
    n_cluster = max(subg_long_reads['cluster']) + 1
    qname_single = bed_file[
        ~bed_file['qname'].isin(subg_long_reads['qname'])][
        'qname'].unique().tolist()
    all_reads = n_cluster + len(qname_single)
    singleton = pd.DataFrame({'qname': qname_single,
                              'cluster': range(n_cluster, all_reads)})
    bed_file['cluster'] = bed_file['cluster'].fillna(
        bed_file['qname'].map(singleton.set_index('qname')['cluster']))
    bed_file['n_reads'] = bed_file['n_reads'].fillna(1)
    rep = ref_choose_alignment(bed_file)
    return match_df, G, bed_file, rep


# ---------------------------------------------------------------------------
# randomized frame generator
# ---------------------------------------------------------------------------

def make_frame(rng, n_groups=6, max_members=6, n_noise=8):
    """Random mappings-bed style frame with recurrent breakpoint groups.

    Interval start keys are made unique afterwards (module docstring).
    Chrom ids are already numeric (rename_chromosomes is identity-tested
    elsewhere; chrN sorting differences would only obscure this oracle).
    """
    rows = []

    def add_read(qname, segs, score):
        n = len(segs) + 2
        q = 0
        out = [(2, 8_000_000 + rng.integers(0, 1000),
                8_000_500 + rng.integers(0, 1000))]
        out += segs
        out.append((2, 8_100_000 + rng.integers(0, 1000),
                    8_100_500 + rng.integers(0, 1000)))
        for (chrom, rs, re_) in out:
            ln = abs(re_ - rs)
            rows.append(dict(
                chrom=chrom, rstart=rs, rend=re_, qname=qname,
                n_alignments=n, aln_size=ln, qstart=q, qend=q + ln,
                strand='+' if rng.random() < 0.7 else '-',
                mapq=int(rng.integers(0, 61)), qlen=0,
                alignment_score=float(rng.integers(10, 2000)),
                inferred_by_primer=0, seq=''))
            q += ln

    for g in range(n_groups):
        k = int(rng.integers(1, 5))
        base = []
        for _ in range(k):
            chrom = int(rng.integers(1, 4))
            lo = int(rng.integers(600_000, 2_400_000))
            base.append((chrom, lo, lo + int(rng.integers(200, 2000))))
        for m in range(int(rng.integers(1, max_members + 1))):
            segs = []
            for (chrom, rs, re_) in base:
                j1 = int(rng.integers(-40, 41))
                j2 = int(rng.integers(-40, 41))
                if rng.random() < 0.5:     # reversed orientation rows
                    segs.append((chrom, re_ + j2, rs + j1))
                else:
                    segs.append((chrom, rs + j1, re_ + j2))
            if rng.random() < 0.25 and len(segs) > 1:
                segs = segs[:-1]           # vary n_alignments
            add_read(f'g{g}m{m}.9_9.21q1F_17p6R', segs,
                     float(rng.integers(10, 2000)))

    for i in range(n_noise):
        k = int(rng.integers(0, 4))        # k=0 -> bread-only read
        segs = []
        for _ in range(k):
            chrom = int(rng.integers(1, 4))
            lo = int(rng.integers(550_000, 2_500_000))
            segs.append((chrom, lo, lo + int(rng.integers(150, 2500))))
        add_read(f'n{i}.9_9.{"False_False" if i % 3 else "21q1F_17p6R"}',
                 segs, float(rng.integers(10, 2000)))

    bed = pd.DataFrame(rows)
    # unique interval-start keys (see module docstring)
    start = np.minimum(bed['rstart'], bed['rend']).to_numpy().copy()
    order = np.argsort(start, kind='stable')
    bump = np.zeros(len(start), np.int64)
    ss = start[order]
    for i in range(1, len(ss)):
        if ss[i] <= ss[i - 1]:
            bump[order[i]] = ss[i - 1] + 1 - ss[i]
            ss[i] = ss[i - 1] + 1
    fwd = bed['rstart'].to_numpy() <= bed['rend'].to_numpy()
    bed['rstart'] = bed['rstart'] + np.where(fwd, bump, 0)
    bed['rend'] = bed['rend'] + np.where(fwd, 0, bump)
    return bed


# ---------------------------------------------------------------------------
# the differential sweep
# ---------------------------------------------------------------------------

def _canon_matches(df):
    out = set()
    for q1, q2, j in zip(df['query1'], df['query2'],
                         df['jaccard_similarity']):
        a, b = sorted((q1, q2))
        out.add((a, b, round(float(j), 6)))
    return out


def _assert_frame_matches_reference(bed, cfg):
    ref_match, ref_G, ref_bed, ref_rep = ref_cluster_block(
        bed.copy(), CHR_LEN_NUM, cfg)

    fillings = C.keep_fillings(bed.copy())
    data = C.prepare_data(fillings, set(cfg.cluster_mask), CHR_LEN_NUM,
                          cfg.subtelomere_threshold)
    match_df, edges, node_pos = C.query_graph(
        data, cfg.overlap, list(cfg.jaccard_cutoffs), cfg.edge_threshold,
        cfg.qlen_diff, cfg.n_alignment_diff, cfg)

    assert _canon_matches(match_df) == _canon_matches(ref_match)
    assert ({tuple(sorted(e)) for e in edges}
            == {tuple(sorted(e)) for e in ref_G.edges()})
    assert set(node_pos) == set(ref_G.nodes())

    # full-stage comparison (cluster ids + n_reads + representatives)
    res = C.cluster_stage(_numeric_bed_for_repo(bed),
                          {f'chr{c}': l for c, l in CHR_LEN_NUM.items()},
                          cfg)
    if ref_bed is None:
        assert res.no_clusters
        return
    assert not res.no_clusters

    def cluster_map(frame):
        m = {}
        for q, cl, nr in zip(frame['qname'], frame['cluster'],
                             frame['n_reads']):
            m[q] = (int(cl), int(nr))
        return m

    # cluster ids must induce the same partition with the same n_reads;
    # ids themselves must match too (first-seen component order parity)
    assert cluster_map(res.cluster_bed) == cluster_map(ref_bed)
    assert (set(res.representative_bed['qname'])
            == set(ref_rep['qname']))


def _numeric_bed_for_repo(bed):
    """cluster_stage renames chroms itself; oracle frames are already
    numeric, so give it stringy names that rename back to 1,2,3."""
    out = bed.copy()
    out['chrom'] = ['chr%d' % c for c in out['chrom']]
    return out


@pytest.mark.parametrize('seed', range(24))
def test_differential_vs_reference_random_frames(seed):
    rng = np.random.default_rng(1000 + seed)
    cfg = ClusterConfig(cluster_mask=('subtelomere',)
                        if seed % 2 else ())
    bed = make_frame(rng,
                     n_groups=int(rng.integers(2, 9)),
                     max_members=int(rng.integers(2, 8)),
                     n_noise=int(rng.integers(0, 14)))
    _assert_frame_matches_reference(bed, cfg)


def test_differential_device_enumeration_path():
    """Same oracle against the production device-enumeration path."""
    rng = np.random.default_rng(77)
    bed = make_frame(rng, n_groups=8, max_members=8, n_noise=10)
    cfg = ClusterConfig(device_enum_min_encounters=0)
    _assert_frame_matches_reference(bed, cfg)


def test_differential_tight_edge_cap():
    """Soft edge cap (edge_threshold) replay parity under heavy capping.
    This case found the round-4 exact-walk bug: the closed-form replay
    missed the reference's re-testing of pairs left un-seen by a capped
    break (see ops/capwalk.py 'Exactness domain')."""
    rng = np.random.default_rng(88)
    bed = make_frame(rng, n_groups=2, max_members=12, n_noise=0)
    cfg = ClusterConfig(edge_threshold=3)
    _assert_frame_matches_reference(bed, cfg)


@pytest.mark.parametrize('seed', range(6))
def test_differential_capped_default_threshold(seed):
    """Groups well past the default cap of 10: the host path's exact
    multi-occurrence walk must match the reference bit-for-bit."""
    rng = np.random.default_rng(500 + seed)
    bed = make_frame(rng, n_groups=2, max_members=25,
                     n_noise=int(rng.integers(0, 6)))
    _assert_frame_matches_reference(bed, ClusterConfig())


@pytest.mark.parametrize('seed', range(4))
def test_differential_capped_device_components(seed):
    """Device scale path on capped frames: the closed-form replay tests
    each pair at its first encounter, so EDGE sets may legitimately
    differ from the reference once a query exceeds the cap — on these
    frames the observable artifacts (cluster bed, representatives)
    still match.  NOT a universal invariant: the round-5 adversarial
    sweep (fslr_tpu/tools/cap_sweep.py) measured partition flips on
    0.44% of cap-heavy frames (bound documented in ops/capwalk.py);
    the host path stays bit-exact on those seeds (see
    test_cap_sweep_mismatch_seeds_host_exact below)."""
    rng = np.random.default_rng(700 + seed)
    bed = make_frame(rng, n_groups=3, max_members=25, n_noise=4)
    cfg = ClusterConfig(device_enum_min_encounters=0)
    ref_match, ref_G, ref_bed, ref_rep = ref_cluster_block(
        bed.copy(), CHR_LEN_NUM, cfg)
    res = C.cluster_stage(_numeric_bed_for_repo(bed),
                          {f'chr{c}': l for c, l in CHR_LEN_NUM.items()},
                          cfg)
    assert ref_bed is not None and not res.no_clusters

    def cluster_map(frame):
        return {q: (int(cl), int(nr)) for q, cl, nr in
                zip(frame['qname'], frame['cluster'], frame['n_reads'])}

    assert cluster_map(res.cluster_bed) == cluster_map(ref_bed)
    assert (set(res.representative_bed['qname'])
            == set(ref_rep['qname']))


@pytest.mark.parametrize('seed', range(4))
def test_differential_capped_chunked_exact_walk(seed, monkeypatch):
    """The exact capped walk materializes the multi-occurrence stream in
    bounded query chunks (ENCOUNTER_SLICE_CAP; round-4 advisor finding:
    one capping query could blow host RAM on the dense datasets the
    sliced paths were built for).  Force tiny chunks so every frame
    crosses many chunk boundaries and assert bit-exact reference
    parity — consumed-pair state must carry across chunks."""
    monkeypatch.setattr(C, 'ENCOUNTER_SLICE_CAP', 64)
    rng = np.random.default_rng(4200 + seed)
    bed = make_frame(rng, n_groups=2, max_members=25,
                     n_noise=int(rng.integers(0, 6)))
    _assert_frame_matches_reference(bed, ClusterConfig())


@pytest.mark.parametrize('seed', [20, 159, 183, 857])
def test_cap_sweep_mismatch_seeds_host_exact(seed):
    """Regression locks from the round-5 adversarial cap sweep
    (fslr_tpu/tools/cap_sweep.py): these four seeds are the frames (of
    900) where the device closed-form cap replay SPLIT a reference
    cluster bridged only by over-cap re-test edges.  The production
    host path (taken below device_enum_min_encounters; exact capped
    walk) must replay every one of them bit-exact — edges, match rows,
    partition, and representatives."""
    rng = np.random.default_rng(seed)
    bed = make_frame(rng,
                     n_groups=int(rng.integers(1, 5)),
                     max_members=int(rng.integers(12, 40)),
                     n_noise=int(rng.integers(0, 10)))
    cfg = ClusterConfig(edge_threshold=int(rng.choice([3, 5, 10, 10, 10])))
    _assert_frame_matches_reference(bed, cfg)
