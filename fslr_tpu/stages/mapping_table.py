"""Mapping-table extraction: alignments -> ``{name}.mappings.bed``.

Vectorized-pandas replication of the reference collect_mapping_info
(/root/reference/fslr/collect_mapping_info.py):

  * per-read grouping; primary = the single designated primary (the
    reference picks max AS when dodi leaves several, :42-48 — our aligner
    designates exactly one, same outcome);
  * query coordinates from CIGAR clips (:7-16) are our record-orientation
    (qstart_o, qend_o, qlen); alignments on the opposite strand from the
    primary are flipped onto the primary strand (:58-62);
  * rstart is 1-based (reference_start + 1), rend is the 1-based inclusive
    end (pysam reference_end), :70-72;
  * ``overlaps_region`` flag vs --regions bed (:28-36, 74-77, 96-97);
  * single-alignment reads with a primer label and <= 5 bp gap at one end
    get an inferred primer pseudo-alignment (chrom = primer name,
    n_alignments = 2, inferred_by_primer = 1), :105-158;
  * ``short_anchor<50bp`` flags reads whose first/last alignment (by
    qstart) spans < 50 bp (:164-172);
  * output TSV sorted by n_alignments desc, qname, qstart, with the exact
    reference column order (:174-181).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import fslr_tpu
from fslr_tpu.stages.align import Alignments


def build_regions(regions_path):
    regions = {}
    if not regions_path:
        return regions
    with open(regions_path) as fh:
        for line in fh:
            f = line.strip().split('\t')
            if len(f) < 3:
                continue
            regions.setdefault(f[0], []).append((int(f[1]), int(f[2])))
    return regions


def _overlaps(regions, chrom, start, end):
    """pd.Interval default closed='right' overlap: (a, b] vs (c, d]
    intersect iff a < d and c < b."""
    for (s, e) in regions.get(chrom, ()):
        if start < e and s < end:
            return True
    return False


def mapping_table(aln: Alignments, qnames: list[str], seqs: list[str],
                  chrom_names: list[str], regions_path: str | None,
                  primers: dict[str, str]) -> pd.DataFrame:
    """Build the mappings table.  ``qnames``/``seqs`` are indexed by
    aln.read_idx; ``primers`` maps primer name -> primer_seq (20 bp)."""
    version = fslr_tpu.__version__
    regions = build_regions(regions_path)
    n = len(aln)

    if n == 0:
        cols = ['chrom', 'rstart', 'rend', 'qname', 'n_alignments',
                'aln_size', 'qstart', 'qend', 'strand', 'mapq', 'qlen',
                'alignment_score', 'short_anchor<50bp', 'fslr_version',
                'inferred_by_primer', 'seq']
        if regions:
            cols.append('overlaps_region')
        return pd.DataFrame(columns=cols)

    # ---- vectorized per-alignment columns ------------------------------
    ridx = aln.read_idx.astype(np.int64)
    uniq, inv, counts = np.unique(ridx, return_inverse=True,
                                  return_counts=True)
    pris = np.flatnonzero(aln.is_primary)
    pri_reads = ridx[pris]
    ps = np.argsort(pri_reads)
    if len(pris) != len(uniq) or np.any(pri_reads[ps] != uniq):
        raise RuntimeError('primary flag problem: reads without exactly '
                           'one primary alignment')
    pri_per_aln = pris[ps][inv]          # primary alignment index per row
    pri_rev = aln.strand_rev[pri_per_aln]
    n_aligns = counts[inv]
    qlen = aln.qlen.astype(np.int64)
    qs_o = aln.qstart_o.astype(np.int64)
    qe_o = aln.qend_o.astype(np.int64)
    # flip onto the primary strand (collect_mapping_info.py:58-62)
    flip = pri_rev != aln.strand_rev
    qstart = np.where(flip, qlen - qe_o, qs_o)
    qend = np.where(flip, qlen - qs_o, qe_o)
    rstart = aln.rstart.astype(np.int64) + 1
    rend = aln.rend.astype(np.int64) + 1
    chrom_col = np.array(list(chrom_names), object)[aln.chrom_idx]
    strand_col = np.where(aln.strand_rev, '-', '+')
    # BAM SEQ is 4-bit coded, so pysam get_forward_sequence (the
    # reference's seq source, collect_mapping_info.py:51) is always
    # uppercase even though the pipeline carries tantan-masked
    # lowercase through the FASTQ stages.
    seq_col = np.full(n, '', object)
    for i in pris:
        seq_col[i] = seqs[int(ridx[i])].upper()
    qname_col = np.array([qnames[int(r)] for r in ridx], object)
    cols_all = {
        'qname': qname_col, 'n_alignments': n_aligns, 'chrom': chrom_col,
        'rstart': rstart, 'rend': rend, 'strand': strand_col,
        'qstart': qstart, 'qend': qend, 'qlen': qlen,
        'aln_size': qend - qstart, 'mapq': aln.mapq.astype(np.int64),
        'alignment_score': aln.score.astype(np.int64), 'seq': seq_col,
        'fslr_version': np.full(n, version, object),
        'inferred_by_primer': np.zeros(n, np.int64),
    }
    if regions:
        cols_all['overlaps_region'] = np.array(
            [int(_overlaps(regions, chrom_col[i], int(rstart[i]),
                           int(rend[i]))) for i in range(n)], np.int64)

    multi = n_aligns > 1
    df_multi = pd.DataFrame({k: v[multi] for k, v in cols_all.items()})

    # ---- single-alignment reads: inferred primer pseudo-alignments
    # ('missing bread', collect_mapping_info.py:109-158) ------------------
    res = []
    for i in np.flatnonzero(~multi):
        rd = {k: (v[i].item() if isinstance(v[i], np.generic) else v[i])
              for k, v in cols_all.items()}
        qname = rd['qname']
        ql = rd['qlen']
        qstart_gap = rd['qstart']
        qend_gap = ql - rd['qend']
        p_names = qname.split('.')[-1].split('_')
        p1, p2 = [x.rstrip('FR') for x in p_names]

        if qstart_gap > 5 and qend_gap > 5:
            res.append(rd)
            continue
        base = {'qname': qname, 'n_alignments': 2, 'rstart': 0, 'rend': 0,
                'qlen': ql, 'aln_size': 0, 'mapq': 0,
                'alignment_score': 0, 'seq': '', 'fslr_version': version,
                'inferred_by_primer': 1}
        if regions:
            base['overlaps_region'] = 0
        if p1 != 'False':
            rd['n_alignments'] = 2
            p1_rd = dict(base, chrom=p1,
                         strand='-' if p_names[0][-1] == 'R' else '+',
                         qstart=0, qend=len(primers[p1]))
            res += [p1_rd, rd]
        elif p2 != 'False':
            rd['n_alignments'] = 2
            p2_rd = dict(base, chrom=p2,
                         strand='-' if p_names[1][-1] == 'R' else '+',
                         qstart=ql - len(primers[p2]), qend=ql)
            res += [rd, p2_rd]
        else:
            res.append(rd)

    if res:
        df = pd.concat([df_multi, pd.DataFrame.from_records(res)],
                       ignore_index=True)
    else:
        df = df_multi
    df = df.sort_values(['qname', 'qstart'])

    # short-anchor flag: first/last alignment (by qstart) spans < 50 bp
    # (collect_mapping_info.py:164-172); group-start/end extraction over
    # the (qname, qstart)-sorted frame replaces the per-qname groupby loop
    qn = df['qname'].to_numpy()
    sizes = df['aln_size'].to_numpy()
    starts_m = np.ones(len(df), bool)
    starts_m[1:] = qn[1:] != qn[:-1]
    ends_m = np.empty(len(df), bool)
    ends_m[:-1] = starts_m[1:]
    ends_m[-1] = True
    gidx = np.cumsum(starts_m) - 1
    bad = (sizes[starts_m] < 50) | (sizes[ends_m] < 50)
    df['short_anchor<50bp'] = bad[gidx].astype(int)

    df = df.sort_values(['n_alignments', 'qname', 'qstart'],
                        ascending=[False, True, True])
    cols = ['chrom', 'rstart', 'rend', 'qname', 'n_alignments', 'aln_size',
            'qstart', 'qend', 'strand', 'mapq', 'qlen', 'alignment_score',
            'short_anchor<50bp', 'fslr_version', 'inferred_by_primer', 'seq']
    if regions:
        cols.append('overlaps_region')
    return df[cols]


def write_mappings_bed(df: pd.DataFrame, path: str):
    df.to_csv(path, index=False, sep='\t')
