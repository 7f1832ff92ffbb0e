"""Stage A: junk / concatemer filtering.

Replicates the observable contract of the reference worker
(/root/reference/fslr/filter_junk_from_fq.py:207-231 `func` +
:120-183 `get_seqs_to_drop`):

  input FASTQ/FASTA -> repeat-masked records; reads dropped as
    * junk      — any masked block > 150 bp that is non-telomeric
                  (telmer_pct <= 0.3) and repetitive (rep >= 0.3),
    * short     — len <= 200 (min length 200 plus the empty-interior case),
    * concatemer— any primer sequence (fwd or revcomp) aligns with SW score
                  >= 28 inside the read interior (100 bp end-trim), scanned
                  in 10 kb chunks with primer-length+10 overlap;
  survivors written to ``{out}/{name}.{uuid}.filtered_junk.fq`` as
  repeat-masked FASTA records (the reference writes tantan's FASTA records,
  so qualities are dropped and repeats are lowercase), with counters
  total_kept / total_dropped / junk_seqs_dropped / short_seqs_dropped /
  concatemers_dropped.

TPU mapping: the tantan subprocess + per-read Python scanning becomes
batched device ops — ops/tantan.repeat_mask, ops/kmer_stats.junk_blocks and
ops/ssw.sw_max_packed over a flattened (read, window) batch with all
primers (fwd + revcomp) lane-packed into each query row.
Unlike the reference, the concatemer scan uses one window grid with a
common overlap of max(primer len)+10; any alignment scoring >= 28 spans
fewer target bases than the overlap, so decisions are identical.
"""

from __future__ import annotations

import os
import uuid
from collections import Counter

import numpy as np

from fslr_tpu import instrument
from fslr_tpu.config import PipelineConfig
from fslr_tpu.encode import bucket_length, encode, revcomp
from fslr_tpu.io.fastq import read_reads, records_to_arrays
from fslr_tpu.ops import kmer_stats, ssw, tantan
from fslr_tpu.panel import PrimerPanel
from fslr_tpu.parallel import dispatch


def _batch_from_codes(code_slices, L: int):
    """Padded (B, L) uint8 batch + lengths from encoded code slices — the
    columnar replacement for encode-from-string batching."""
    batch = np.full((len(code_slices), L), 4, dtype=np.uint8)
    lens = np.zeros(len(code_slices), dtype=np.int32)
    for i, c in enumerate(code_slices):
        c = c[:L]
        batch[i, :len(c)] = c
        lens[i] = len(c)
    return batch, lens


def _batch_rows(reads, part, step: int, L: int):
    """Padded (step, L) uint8 batch + lengths for read indices ``part``
    via ONE strided gather over the columnar codes (the per-row fill loop
    cost ~1 s per 10k reads across this stage's three batch sites)."""
    part_arr = np.asarray(part, np.int64)
    nb = len(part_arr)
    off = reads.seq_off
    cat = reads.codes
    lf = (off[part_arr + 1] - off[part_arr]).astype(np.int64)
    lw = np.minimum(lf, L)
    ar = np.arange(L, dtype=np.int64)
    batch = np.full((step, L), 4, dtype=np.uint8)
    lens = np.zeros(step, dtype=np.int32)
    if nb:
        pos = off[part_arr][:, None] + ar[None, :]
        v = cat[np.minimum(pos, max(len(cat) - 1, 0))]
        batch[:nb] = np.where(ar[None, :] < lw[:, None], v, 4)
        lens[:nb] = lw
    return batch, lens


def _concatemer_windows(length: int, cfg, overlap: int):
    """Window (start, end) pairs in interior coordinates, replicating the
    reference chunk walk (filter_junk_from_fq.py:79-99)."""
    interior = length - 2 * cfg.end_trim
    if interior <= 0:
        return []
    if interior <= cfg.chunk_size:
        return [(0, interior)]
    out = []
    start = 0
    while start < interior:
        s = max(0, start - overlap)
        e = min(start + cfg.chunk_size + overlap, interior)
        out.append((s, e))
        if start + cfg.chunk_size >= interior:
            break
        start += cfg.chunk_size
    return out


def _pack_mask_device(m):
    """Bit-pack a (N, L) bool mask to (N, ceil(L/8)) uint8 on device
    (little-endian bit order, matching np.unpackbits(bitorder='little'))."""
    import jax.numpy as jnp
    N, L = m.shape
    L8 = (L + 7) // 8 * 8
    if L8 != L:
        m = jnp.pad(m, ((0, 0), (0, L8 - L)))
    w = jnp.array([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(m.reshape(N, L8 // 8, 8).astype(jnp.uint8)
                   * w[None, None, :], axis=2).astype(jnp.uint8)


def _mask_gate_packed(seq, lens, cfg):
    """Repeat mask (bit-packed) + junk gate for one batch — one fused
    device program so the multi-chip dispatch shards a single call."""
    m = tantan.repeat_mask(seq, lens, cfg)
    g = kmer_stats.junk_gates(seq, lens, m, cfg)
    return _pack_mask_device(m), g


def filter_junk_records(reads, panel: PrimerPanel,
                        config: PipelineConfig, backend: str | None = None):
    """Classify reads (a FastxArrays, or a list of FastxRecord which is
    columnarized first).  Returns (keep_flags, masks, junk, short, concat,
    counters)."""
    if isinstance(reads, list):
        reads = records_to_arrays(reads)
    cfg = config.junk
    counters = Counter(total_kept=0, total_dropped=0, junk_seqs_dropped=0,
                       short_seqs_dropped=0, concatemers_dropped=0)
    n = reads.n
    rlens = reads.lengths()
    keep = np.ones(n, dtype=bool)
    junk = np.zeros(n, dtype=bool)
    masks = [None] * n

    # ---- repeat masking + block scoring, bucketed by length ------------
    buckets: dict[int, list[int]] = {}
    for i in range(n):
        L = bucket_length(int(rlens[i]), config.batch.length_buckets)
        buckets.setdefault(L, []).append(i)

    # Dispatch every batch, then fetch ALL results in two transfers (masks
    # bit-packed 8x on device) — per-batch blocking fetches over the
    # high-latency TPU link dominated this stage at 10k+ reads.
    # Pass 1 computes only the repeat mask + the cheap junk GATE (block
    # length + telomere content: no sorts).  The expensive segmented-sort
    # rep score (kmer_stats.junk_blocks) runs in pass 2 on gated reads
    # only — junk requires the gate, so ungated reads are junk=False.
    import jax.numpy as jnp
    mask_pending = []       # (part, L, packed-mask dev, gate dev)
    for L, idxs in sorted(buckets.items()):
        # cap device batch so the HMM forward storage stays bounded
        step = max(1, min(config.batch.batch_size, (1 << 21) // L))
        for off in range(0, len(idxs), step):
            part = idxs[off:off + step]
            # fixed batch shape (step rows) so the HMM compiles once
            seq, lens = _batch_rows(reads, part, step, L)
            mp, g = dispatch.dp_call(_mask_gate_packed, (seq, lens),
                                     statics=(cfg,))
            mask_pending.append((part, L, mp, g))
    gate = np.zeros(n, dtype=bool)
    if mask_pending:
        flat_m = np.asarray(jnp.concatenate(
            [mp.reshape(-1) for (_, _, mp, _) in mask_pending]))
        flat_g = np.asarray(jnp.concatenate(
            [gd.reshape(-1).astype(jnp.uint8)
             for (_, _, _, gd) in mask_pending]))
        mo = go = 0
        for part, L, mp, gd in mask_pending:
            msz = int(np.prod(mp.shape))
            m = np.unpackbits(
                flat_m[mo:mo + msz].reshape(mp.shape).astype(np.uint8),
                axis=1, bitorder='little')[:, :L].astype(bool)
            g = flat_g[go:go + gd.shape[0]]
            mo += msz
            go += gd.shape[0]
            for bi, i in enumerate(part):
                masks[i] = m[bi]
                gate[i] = bool(g[bi])

    # ---- pass 2: rep score for gated reads only -------------------------
    gated = np.flatnonzero(gate)
    if gated.size:
        gbuckets: dict[int, list[int]] = {}
        for i in gated:
            L = bucket_length(int(rlens[i]), config.batch.length_buckets)
            gbuckets.setdefault(L, []).append(int(i))
        rep_pending = []    # (part, junk dev)
        for L, idxs in sorted(gbuckets.items()):
            cap = max(1, min(config.batch.batch_size, (1 << 21) // L))
            for off in range(0, len(idxs), cap):
                part = idxs[off:off + cap]
                # pow2-padded row count: bounded compiled-shape set
                step = 8
                while step < len(part):
                    step *= 2
                step = min(step, cap)
                seq, lens = _batch_rows(reads, part, step, L)
                m = np.zeros((step, L), dtype=bool)
                for bi, i in enumerate(part):
                    m[bi, :len(masks[i])] = masks[i]
                j = dispatch.dp_call(kmer_stats.junk_blocks,
                                     (seq, lens, jnp.asarray(m)),
                                     statics=(cfg,))
                rep_pending.append((part, j))
        flat_j = np.asarray(jnp.concatenate(
            [jd.reshape(-1).astype(jnp.uint8) for (_, jd) in rep_pending])
            if len(rep_pending) > 1
            else rep_pending[0][1].astype(jnp.uint8))
        jo = 0
        for part, jd in rep_pending:
            for bi, i in enumerate(part):
                junk[i] = bool(flat_j[jo + bi])
            jo += jd.shape[0]

    # ---- short / concatemer for non-junk reads -------------------------
    # All primers (fwd + revcomp) lane-pack into query rows at a fixed
    # stride (ops/ssw.sw_max_packed) so one row scans one window against
    # 128//stride primers at once — the drop test is "any primer >= 28",
    # exactly the packed row maximum.
    primers = [panel.seqs[k] for k in panel.names]
    prim_codes = ([encode(p) for p in primers]
                  + [revcomp(encode(p)) for p in primers])
    maxp = max((len(p) for p in primers), default=0)
    overlap = maxp + cfg.chunk_overlap_pad
    stride = 32
    while stride < maxp:
        stride *= 2
    if prim_codes:
        qrows, _, _ = ssw.pack_queries(prim_codes, stride)
    else:
        qrows = np.zeros((0, 128), np.uint8)
    n_qrows = len(qrows)

    win_rows = []      # (read_idx, window_start, window_end, qrow_idx)
    short = np.zeros(n, dtype=bool)
    for i in range(n):
        if junk[i]:
            continue
        L = int(rlens[i])
        if L < cfg.min_read_length or L - 2 * cfg.end_trim <= 0:
            short[i] = True
            continue
        for (s, e) in _concatemer_windows(L, cfg, overlap):
            for qi in range(n_qrows):
                win_rows.append((i, s, e, qi))

    concat = np.zeros(n, dtype=bool)
    if win_rows:
        wlen = max(e - s for (_, s, e, _) in win_rows)
        WT = bucket_length(wlen, (512, 1024, 1536, 2048, 3072, 4096,
                                  6144, 8192,
                                  cfg.chunk_size + 2 * overlap + 64))
        CHUNK = 8192     # fixed-shape chunks: stable compiled shapes
        pending = []
        wr_i = np.array([r[0] for r in win_rows], np.int64)
        wr_s = np.array([r[1] for r in win_rows], np.int64)
        wr_e = np.array([r[2] for r in win_rows], np.int64)
        wr_q = np.array([r[3] for r in win_rows], np.int64)
        arw = np.arange(WT, dtype=np.int64)
        cat_all = reads.codes
        soff = reads.seq_off
        for off in range(0, len(win_rows), CHUNK):
            rows = win_rows[off:off + CHUNK]
            NW = len(rows)
            sl = slice(off, off + NW)
            # interior window [end_trim+s, end_trim+e) of each read, as
            # one strided gather (clipped to the read's interior end)
            we = np.minimum(wr_e[sl],
                            rlens[wr_i[sl]] - 2 * cfg.end_trim)
            wl = np.maximum(we - wr_s[sl], 0)
            start = soff[wr_i[sl]] + cfg.end_trim + wr_s[sl]
            pos = start[:, None] + arw[None, :]
            v = cat_all[np.minimum(pos, max(len(cat_all) - 1, 0))]
            t = np.where(arw[None, :] < wl[:, None], v, 4).astype(np.uint8)
            tlens = wl.astype(np.int32)
            q = qrows[wr_q[sl]]
            score, _, _ = dispatch.dp_call(
                ssw.sw_max_packed, (q, t, tlens),
                statics=(config.scoring, stride, backend))
            instrument.add_cells(int(tlens.sum(dtype=np.int64)) * 128,
                                 'sw_concat')
            pending.append((rows, score))
        flat_s = np.asarray(jnp.concatenate(
            [jnp.ravel(s) for (_, s) in pending]) if len(pending) > 1
            else jnp.ravel(pending[0][1]))
        so = 0
        for rows, score in pending:
            ns = int(np.prod(score.shape))
            svals = flat_s[so:so + ns]
            so += ns
            for r, (i, s, e, qi) in enumerate(rows):
                if svals[r] >= cfg.concatemer_score:
                    concat[i] = True

    # ---- decisions + counters (reference order: junk, then short/concat).
    # Totals go through dispatch.dp_sum: plain numpy sums single-device,
    # per-shard partial sums + psum over the mesh (the reference's
    # Manager-dict counters, main.py:50-57, without locks).
    keep = ~(junk | short | concat)
    nj, ns, nc, nk = dispatch.dp_sum(
        junk, ~junk & short, ~junk & ~short & concat, keep)
    counters['junk_seqs_dropped'] = nj
    counters['short_seqs_dropped'] = ns
    counters['concatemers_dropped'] = nc
    counters['total_kept'] = nk
    counters['total_dropped'] = n - nk
    return keep, masks, junk, short, concat, counters


def run_file(path: str, panel: PrimerPanel, config: PipelineConfig,
             backend: str | None = None, out_box: dict | None = None) -> dict:
    """Process one input file; returns counters.  Writes
    ``{out}/{name}.{uuid}.filtered_junk.fq`` (+ ``.junk.fq`` if keep_temp),
    mirroring the reference worker's file contract
    (filter_junk_from_fq.py:213-216).  When ``out_box`` is given it
    receives {'path': out_path, 'reads': kept masked FastxArrays} so the
    primer stage can skip re-parsing the intermediate file (the file is
    still written — it is the resume/inspection contract)."""
    reads = read_reads(path)
    keep, masks, junk, short, concat, counters = filter_junk_records(
        reads, panel, config, backend)
    temp_name = str(uuid.uuid4())
    out_path = os.path.join(config.out,
                            f'{config.name}.{temp_name}.filtered_junk.fq')
    junk_path = os.path.join(config.out, f'{config.name}.{temp_name}.junk.fq')
    kept_idx = []
    with open(out_path, 'w', buffering=1 << 20) as out, \
         open(junk_path, 'w') as junkf:
        for i in range(reads.n):
            # the reference writes tantan's FASTA records: qualities are
            # dropped, repeats lowercase (filter_junk_from_fq.py:170-172)
            seq = reads.seq_str(i, lower=masks[i])
            name = reads.name(i)
            comment = reads.comment(i)
            head = name if not comment else f'{name} {comment}'
            if keep[i]:
                out.write(f'>{head}\n{seq}\n')
                kept_idx.append(i)
            elif config.keep_temp:
                if junk[i]:
                    suffix = '_junk'
                elif short[i]:
                    suffix = '_short'
                else:
                    suffix = '_concatemer'
                head = (f'{name}{suffix}' if not comment
                        else f'{name}{suffix} {comment}')
                junkf.write(f'>{head}\n{seq}\n')
    if out_box is not None:
        kept = reads.subset(
            kept_idx,
            lower_override=[np.asarray(masks[i], np.uint8)
                            for i in kept_idx])
        kept._quals = b''       # the handoff mirrors the FASTA file
        out_box['path'] = out_path
        out_box['reads'] = kept
    if not config.keep_temp:
        os.remove(junk_path)
    return dict(counters)
