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

    res = []
    order = np.argsort(aln.read_idx, kind='stable')
    by_read: dict[int, list[int]] = {}
    for i in order:
        by_read.setdefault(int(aln.read_idx[i]), []).append(int(i))

    for ridx, idxs in by_read.items():
        qname = qnames[ridx]
        # BAM SEQ is 4-bit coded, so pysam get_forward_sequence (the
        # reference's seq source, collect_mapping_info.py:51) is always
        # uppercase even though the pipeline carries tantan-masked
        # lowercase through the FASTQ stages.
        seq = seqs[ridx].upper()
        pri_candidates = [i for i in idxs if aln.is_primary[i]]
        if len(pri_candidates) != 1:
            raise RuntimeError(f'primary flag problem for {qname}: '
                               f'{len(pri_candidates)}')
        pri = pri_candidates[0]
        primary_reverse = bool(aln.strand_rev[pri])
        n_aligns = len(idxs)

        temp = []
        for i in idxs:
            qstart = int(aln.qstart_o[i])
            qend = int(aln.qend_o[i])
            qlen = int(aln.qlen[i])
            align_reverse = bool(aln.strand_rev[i])
            if primary_reverse != align_reverse:
                start_temp = qlen - qend
                qend = start_temp + qend - qstart
                qstart = start_temp
            chrom = chrom_names[int(aln.chrom_idx[i])]
            start = int(aln.rstart[i]) + 1
            end = int(aln.rend[i]) + 1
            rd = {'qname': qname,
                  'n_alignments': n_aligns,
                  'chrom': chrom,
                  'rstart': start,
                  'rend': end,
                  'strand': '-' if align_reverse else '+',
                  'qstart': qstart,
                  'qend': qend,
                  'qlen': qlen,
                  'aln_size': qend - qstart,
                  'mapq': int(aln.mapq[i]),
                  'alignment_score': int(aln.score[i]),
                  'seq': seq if i == pri else '',
                  'fslr_version': version,
                  'inferred_by_primer': 0,
                  }
            if regions:
                rd['overlaps_region'] = int(_overlaps(regions, chrom, start,
                                                      end))
            temp.append(rd)

        if len(temp) > 1:
            res += temp
            continue

        # inferred primer pseudo-alignments ('missing bread',
        # collect_mapping_info.py:109-158)
        temp = sorted(temp, key=lambda r: r['qstart'])
        qlen = temp[0]['qlen']
        qstart_gap = temp[0]['qstart']
        qend_gap = qlen - temp[0]['qend']
        p_names = qname.split('.')[-1].split('_')
        p1, p2 = [x.rstrip('FR') for x in p_names]

        if qstart_gap > 5 and qend_gap > 5:
            res += temp
            continue
        base = {'qname': qname, 'n_alignments': 2, 'rstart': 0, 'rend': 0,
                'qlen': qlen, 'aln_size': 0, 'mapq': 0,
                'alignment_score': 0, 'seq': '', 'fslr_version': version,
                'inferred_by_primer': 1}
        if regions:
            base['overlaps_region'] = 0
        if p1 != 'False':
            temp[0]['n_alignments'] = 2
            p1_rd = dict(base, chrom=p1,
                         strand='-' if p_names[0][-1] == 'R' else '+',
                         qstart=0, qend=len(primers[p1]))
            temp = [p1_rd, temp[0]]
        elif p2 != 'False':
            temp[0]['n_alignments'] = 2
            p2_rd = dict(base, chrom=p2,
                         strand='-' if p_names[1][-1] == 'R' else '+',
                         qstart=qlen - len(primers[p2]), qend=qlen)
            temp = [temp[0], p2_rd]
        res += temp

    if not res:
        cols = ['chrom', 'rstart', 'rend', 'qname', 'n_alignments',
                'aln_size', 'qstart', 'qend', 'strand', 'mapq', 'qlen',
                'alignment_score', 'short_anchor<50bp', 'fslr_version',
                'inferred_by_primer', 'seq']
        if regions:
            cols.append('overlaps_region')
        return pd.DataFrame(columns=cols)

    df = pd.DataFrame.from_records(res).sort_values(['qname', 'qstart'])

    bad_anchors = []
    for grp, d in df.groupby('qname'):
        aln_s = list(d['aln_size'])
        if aln_s[0] < 50 or aln_s[-1] < 50:
            bad_anchors += [1] * len(d)
        else:
            bad_anchors += [0] * len(d)
    df['short_anchor<50bp'] = bad_anchors

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
