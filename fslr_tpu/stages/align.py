"""Alignment stage: seed -> band candidates -> banded extension -> selection.

The bwa mem + dodi replacement (reference call sites
/root/reference/fslr/main.py:121-171).  Per read batch:

  1. device seeding of forward and reverse-complement strands against the
     host-built k-mer index (ops/seed.py);
  2. candidate diagonal bands filtered by seed support (min_chain_seeds /
     min_band_span are this engine's analogs of bwa's chain filters);
  3. banded affine extension of each candidate (ops/banded.py), forward
     pass for (score, qend, rend) then a reversed-prefix pass for begins;
  4. per-read split-alignment selection DP (ops/selection.py) with
     optional region bias (dodi --bias/--include);
  5. primary designation = max original score among selected
     (collect_mapping_info.py:42-48 workaround semantics).

Alignment records carry query coordinates in *record orientation* (the
aligned strand's coordinates, as a SAM record's CIGAR clips would encode
them), plus the strand flag, so the mapping-table stage can replicate the
reference's strand-normalization math exactly.

MAPQ follows the bwa-mem single-end model family (score-gap scaled by
squared identity with a long-read length damping term, minus a
log-penalty for the number of comparable sub-optimal hits; clamped to
[0, 60]).  s2 (the "sub" score) is the best unselected candidate whose
forward-strand query span overlaps the selected alignment by >50%,
floored at min_seed_len * match_score exactly as bwa floors sub at
``opt->min_seed_len * opt->a``.  The reference pipeline never filters on
MAPQ (mappings.bed carries it through verbatim), so downstream parity
does not depend on the exact constants.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from fslr_tpu import instrument
from fslr_tpu.config import PipelineConfig
from fslr_tpu.encode import bucket_length, encode, revcomp
from fslr_tpu.index.reference import Reference, SeedIndex
from fslr_tpu.ops import banded, seed, selection
from fslr_tpu.parallel import dispatch


@dataclasses.dataclass
class Alignments:
    """Flat arrays over alignments (selected only unless noted)."""
    read_idx: np.ndarray      # index into the input record list
    chrom_idx: np.ndarray     # contig index into Reference.names
    rstart: np.ndarray        # 0-based inclusive, contig-local
    rend: np.ndarray          # 0-based inclusive
    strand_rev: np.ndarray    # bool, True = reverse strand
    qstart_o: np.ndarray      # record-orientation query start (0-based)
    qend_o: np.ndarray        # record-orientation query end (exclusive)
    qlen: np.ndarray          # full read length
    score: np.ndarray         # alignment score (original, unbiased)
    mapq: np.ndarray
    is_primary: np.ndarray    # bool
    overlaps_region: np.ndarray  # bool (all False when no --regions)
    cigars: list | None = None   # per-alignment core CIGAR ops (M/I/D)

    def __len__(self):
        return len(self.read_idx)


_SLICE_BUCKETS = (256, 384, 512, 768, 1024, 1536, 2048, 3072, 4096,
                  6144, 8192, 12288, 16384, 24576, 32768)


def _pad128(n):
    return ((n + 127) // 128) * 128


def _device_arrays(ref: Reference, sidx: SeedIndex):
    """Device-resident genome + index, cached on the SeedIndex so repeated
    batches don't re-upload (the genome can be ~1 GB/shard and the TPU
    link is high-latency).  Under an active mesh the tables are placed
    replicated across every device up front (one transfer, not one per
    sharded kernel call)."""
    mesh = dispatch.active_mesh()
    cached_mesh, cached = getattr(sidx, '_dev', (None, None))
    if cached is None or cached_mesh is not mesh:
        import jax
        import jax.numpy as jnp
        arrs = (ref.codes, sidx.counts.astype(np.int32),
                sidx.positions.astype(np.int32))
        if mesh is not None and mesh.devices.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(mesh, P())
            cached = tuple(jax.device_put(a, sh) for a in arrs)
        else:
            cached = tuple(jnp.asarray(a) for a in arrs)
        sidx._dev = (mesh, cached)
    return cached


def _build_regions(regions_path, names):
    """regions bed -> per-contig sorted interval arrays (pd.Interval
    semantics in the reference are closed intervals; overlap test below
    replicates Interval.overlaps for closed endpoints)."""
    per = {}
    if not regions_path:
        return per
    name_set = set(names)
    with open(regions_path) as fh:
        for line in fh:
            f = line.strip().split('\t')
            if len(f) < 3 or f[0] not in name_set:
                continue
            per.setdefault(f[0], []).append((int(f[1]), int(f[2])))
    return {k: np.array(sorted(v)) for k, v in per.items()}


def _overlaps_region(regions, chrom_name, start, end):
    iv = regions.get(chrom_name)
    if iv is None or len(iv) == 0:
        return False
    # closed-interval overlap (pd.Interval default closed='right'; the
    # reference builds Interval(left=start, right=end) default closed
    # 'right' and t=(start+1-based, end)): overlap iff not disjoint.
    return bool(np.any((iv[:, 0] < end) & (start < iv[:, 1])))


def align_batch(seqs: list[str], ref: Reference, sidx: SeedIndex,
                config: PipelineConfig, regions_path: str | None = None,
                backend: str | None = None,
                masked: tuple[Reference, SeedIndex] | None = None
                ) -> Alignments:
    """Align a list of read sequences.  Returns selected alignments only.

    ``masked``: optional (Reference, SeedIndex) of the masked reference;
    candidates from both references are pooled before selection, exactly as
    the reference pipeline's samtools-merge + single dodi pass arbitrates
    masked-vs-whole-reference candidates (main.py:121-141).  Masked contig
    names must be a subset of the main reference's names.
    """
    cands = _gather_candidates(seqs, ref, sidx, config, backend)
    if masked is not None:
        mref, msidx = masked
        name_to_idx = {n: i for i, n in enumerate(ref.names)}
        for a in _gather_candidates(seqs, mref, msidx, config, backend):
            mname = mref.names[a['chrom_idx']]
            if mname in name_to_idx:
                a['chrom_idx'] = name_to_idx[mname]
                cands.append(a)
    return _select_and_finalize(cands, ref, config, regions_path)


def _gather_candidates(seqs: list[str], ref: Reference, sidx: SeedIndex,
                       config: PipelineConfig,
                       backend: str | None = None) -> list[dict]:
    """Seed + extend: candidate alignments (dicts) against one reference.

    Sharded indexes (genomes > index.reference.MAX_UNSHARDED_BASES, e.g.
    whole human): candidates are gathered per shard with shard-local int32
    positions and contig ids remapped onto the parent reference — the
    selection DP then arbitrates across shards exactly as it does across
    the masked/whole candidate pool."""
    if sidx.shards:
        return _gather_candidates_sharded(seqs, sidx, config, backend)
    cand_rows, enc_fwd = _seed_rows(seqs, ref, sidx, config, backend)
    cand_rows = _chain_filter(cand_rows, seqs, config)
    return _extend_rows(cand_rows, seqs, enc_fwd, ref, sidx, config,
                        backend)


def _gather_candidates_sharded(seqs: list[str], sidx: SeedIndex,
                               config: PipelineConfig,
                               backend: str | None = None) -> list[dict]:
    """Seed every shard, merge candidates to the same per-(read, strand)
    budget a single index would have (top max_candidates by seed count —
    per-shard seeding would otherwise grant each shard its own budget and
    emit extra low-support alignments), then extend per shard."""
    acfg = config.align
    per_shard_rows = []
    enc_fwd: dict[int, np.ndarray] = {}
    merged = {}        # (ridx, srev) -> [(cnt, order_key, shard_i, row)]
    for si, sh in enumerate(sidx.shards):
        rows, enc = _seed_rows(seqs, sh.ref, sh.sidx, config, backend)
        enc_fwd.update(enc)
        for row in rows:
            ridx, srev, dga, cnt = row[0], row[1], row[2], row[3]
            merged.setdefault((ridx, srev), []).append((cnt, si, row))
    keep_by_shard: list[list] = [[] for _ in sidx.shards]
    for key, lst in merged.items():
        lst.sort(key=lambda t: -t[0])
        for cnt, si, row in lst[:acfg.max_candidates]:
            keep_by_shard[si].append(row)
    keep_all = _chain_filter([r for rows in keep_by_shard for r in rows],
                             seqs, config)
    kept_keys = {(r[0], r[1], r[2], r[4]) for r in keep_all}
    out = []
    for si, sh in enumerate(sidx.shards):
        rows = [r for r in keep_by_shard[si]
                if (r[0], r[1], r[2], r[4]) in kept_keys]
        for a in _extend_rows(rows, seqs, enc_fwd, sh.ref,
                              sh.sidx, config, backend):
            a['chrom_idx'] += sh.contig_base
            out.append(a)
    return out


def _chain_filter(cand_rows: list, seqs: list[str],
                  config: PipelineConfig) -> list:
    """bwa mem chain filtering (mem_chain_flt semantics; reference invokes
    bwa with -D 0.25, /root/reference/fslr/main.py:125): candidate bands of
    a read are visited in seed-count order; a band is dropped when its
    query span overlaps a kept band by >= mask_level * its own span and its
    seed count is below drop_ratio of that kept band's.  Spurious 2-3-seed
    bands shadowed by a real segment — 2/3 of all candidates on amplicon
    data — never reach the extension kernel, exactly as bwa never extends
    chains it drops here.  Comparison is across strands in forward-read
    query coordinates, like bwa's per-read chain list."""
    acfg = config.align
    mask_level = acfg.chain_mask_level
    drop_ratio = acfg.chain_drop_ratio
    if drop_ratio <= 0:
        return cand_rows
    by_read: dict[int, list[int]] = {}
    for ci, row in enumerate(cand_rows):
        by_read.setdefault(row[0], []).append(ci)
    keep: list = []
    for ridx, cidxs in by_read.items():
        L = len(seqs[ridx])
        spans = []
        for ci in cidxs:
            _, srev, _, cnt, qmn, qmx = cand_rows[ci]
            lo, hi = (L - qmx, L - qmn) if srev else (qmn, qmx)
            spans.append((cnt, lo, hi, ci))
        spans.sort(key=lambda t: -t[0])
        kept: list[tuple] = []
        for cnt, lo, hi, ci in spans:
            span = max(hi - lo, 1)
            shadowed = False
            for kcnt, klo, khi in kept:
                ov = min(hi, khi) - max(lo, klo)
                if ov >= mask_level * span and cnt < drop_ratio * kcnt:
                    shadowed = True
                    break
            if not shadowed:
                kept.append((cnt, lo, hi))
                keep.append(ci)
    keep.sort()
    return [cand_rows[ci] for ci in keep]


def _seed_kernel(reads, lens, counts, positions, k, stride, occ_drop,
                 band_w, max_cand, S, C):
    """Positional adapter over ops/seed.seed_candidates for dp_call."""
    return seed.seed_candidates(reads, lens, counts, positions, k=k,
                                stride=stride, occ_drop=occ_drop,
                                band_w=band_w, max_cand=max_cand, S=S, C=C)


def _extend_kernel(q, qlens, ws, cmin, cmax, genome, scoring, backend):
    """banded_extend adapter: its packed result is (6, N) — batch-minor —
    so transpose to batch-major for the sharded dispatch; the call site
    transposes back."""
    from fslr_tpu.ops import traceback as tbmod
    packed, emits = tbmod.banded_extend(q, qlens, ws, cmin, cmax, genome,
                                        scoring, backend)
    return packed.T, emits


def _select_kernel(qs, qe, sc, vmask, bias, ol_cost, max_overlap,
                   min_score):
    return selection.select_alignments(
        qs, qe, sc, vmask, ol_cost=ol_cost, max_overlap=max_overlap,
        bias=bias, min_score=min_score)


def _occ_cap(sidx: SeedIndex, acfg) -> int:
    """Data-adaptive per-seed occurrence cap: the seeding hit grid is
    (samples x cap), so a unique-k-mer reference (amplicon panels, small
    contigs) padding to the configured max (16) wastes 4x sort/NMS/gather
    work on empty slots.  Cap at the 99.9th percentile of the index's
    nonzero k-mer occupancy (floor 4, ceiling max_kmer_occ); repetitive
    genomes (human: mean 11-mer occ ~700) keep the full cap."""
    c = getattr(sidx, '_occ_cap', None)
    if c is None:
        occ = np.diff(sidx.counts)
        nz = occ[occ > 0]
        p = int(np.percentile(nz, 99.9)) if nz.size else 1
        c = int(min(acfg.max_kmer_occ, max(4, p)))
        sidx._occ_cap = c
    return c


def _seed_rows(seqs: list[str], ref: Reference, sidx: SeedIndex,
               config: PipelineConfig, backend: str | None = None):
    """Device seeding -> candidate tuples
    (read_idx, strand_rev, diag_anchor, count, qmin, qmax) + encode cache."""
    import jax.numpy as jnp
    acfg = config.align
    k = sidx.k
    _, counts_j, pos_j = _device_arrays(ref, sidx)
    occ_cap = _occ_cap(sidx, acfg)

    # ---- bucket reads by length ---------------------------------------
    buckets: dict[int, list[int]] = {}
    for i, s in enumerate(seqs):
        L = bucket_length(max(len(s), k + 1), config.batch.length_buckets)
        buckets.setdefault(L, []).append(i)

    cand_rows = []   # (read_idx, strand_rev, diag_anchor, count)
    enc_fwd: dict[int, np.ndarray] = {}
    _KEYS = ('valid', 'count', 'diag', 'qmin', 'qmax')
    seed_pending = []     # (part, step, nb, packed-device-array)
    for L, idxs in sorted(buckets.items()):
        S = max(1, (L - k) // acfg.seed_stride + 1)
        step = max(1, min(config.batch.batch_size,
                          (1 << 23) // max(S * occ_cap, 1)))
        for off in range(0, len(idxs), step):
            part = idxs[off:off + step]
            fwd = [encode(seqs[i]) for i in part]
            for i, f in zip(part, fwd):
                enc_fwd[i] = f
            rc = [revcomp(f) for f in fwd]
            both = fwd + rc
            # fixed batch shape (2*step rows) so seeding compiles once
            arr = np.full((2 * step, L), 4, dtype=np.uint8)
            lens = np.zeros(2 * step, dtype=np.int32)
            for r, c in enumerate(both):
                row = r if r < len(fwd) else step + (r - len(fwd))
                arr[row, :len(c)] = c[:L]
                lens[row] = min(len(c), L)
            res = dispatch.dp_call(
                _seed_kernel, (jnp.asarray(arr), jnp.asarray(lens)),
                (counts_j, pos_j),
                statics=(k, acfg.seed_stride, 1000, acfg.band_width // 2,
                         acfg.max_candidates, S, occ_cap))
            # pack to ONE device array -> one host fetch per batch
            packed = jnp.stack([res[kk].astype(jnp.int32) for kk in _KEYS])
            seed_pending.append((part, step, len(part), packed))

    # ONE device->host transfer for all seed batches (the TPU tunnel has
    # ~1 s/fetch latency; per-batch fetches dominated the align stage)
    flats = np.asarray(jnp.concatenate(
        [p.reshape(-1) for (_, _, _, p) in seed_pending])) \
        if seed_pending else np.zeros(0, np.int32)
    fo = 0
    for part, step, nb, packed in seed_pending:
        size = int(np.prod(packed.shape))
        p = flats[fo:fo + size].reshape(packed.shape)
        fo += size
        valid_a, count_a, diag_a, qmin_a, qmax_a = p
        # vectorized candidate filter; np.nonzero's row-major order equals
        # the reference iteration (fwd rows of this part, then rc rows)
        ridx_row = np.full(2 * step, -1, np.int64)
        ridx_row[:nb] = part
        ridx_row[step:step + nb] = part
        srev_row = np.zeros(2 * step, bool)
        srev_row[step:] = True
        ok = ((valid_a != 0) & (count_a >= acfg.min_chain_seeds)
              & (qmax_a - qmin_a >= acfg.min_band_span)
              & (ridx_row[:, None] >= 0))
        rr, cc = np.nonzero(ok)
        cand_rows.extend(zip(
            ridx_row[rr].tolist(), srev_row[rr].tolist(),
            diag_a[rr, cc].tolist(), count_a[rr, cc].tolist(),
            qmin_a[rr, cc].tolist(), qmax_a[rr, cc].tolist()))
    return cand_rows, enc_fwd


def _extend_rows(cand_rows: list, seqs: list[str], enc_fwd: dict,
                 ref: Reference, sidx: SeedIndex, config: PipelineConfig,
                 backend: str | None = None) -> list[dict]:
    acfg = config.align
    genome_j, _, _ = _device_arrays(ref, sidx)
    contig_starts = ref.offsets[:-1]
    contig_ends = ref.offsets[1:]
    if not cand_rows:
        return []

    # ---- extension: ONE traceback-kernel pass per candidate -----------
    # Each candidate extends only the seed-supported query slice
    # [qmin - margin, qmax + margin) (split segments don't pay for the
    # whole read), and begins + CIGARs come from the traceback walk — no
    # reverse pass, no separate CIGAR pass.
    from fslr_tpu.ops import traceback as tbmod

    margin = acfg.extension_margin
    all_aln = []      # dicts per candidate alignment
    by_bucket: dict[int, list[int]] = {}
    slices = []       # (qlo, qhi) per candidate
    for ci, (ridx, srev, dga, cnt, qmn, qmx) in enumerate(cand_rows):
        Lq = len(seqs[ridx])
        qlo = max(0, qmn - margin)
        qhi = min(Lq, qmx + margin)
        slices.append((qlo, qhi))
        SL = bucket_length(max(qhi - qlo, 1), _SLICE_BUCKETS)
        by_bucket.setdefault(SL, []).append(ci)

    # Phase A: dispatch every chunk (windows gathered on device from the
    # device-resident genome; results stay on device).  Phase B: fetch ALL
    # chunks' results in TWO transfers (one int32 concat, one uint8
    # concat) — per-chunk fetches cost ~1 s each over the TPU tunnel and
    # dominated this stage.
    pending = []      # (chunk, ws, SL, device packed, device emits)
    for SL, cidxs in sorted(by_bucket.items()):
        # chunk rows so device-resident traceback bits stay bounded
        # (~SL*16 int32 per row; bits never leave the device)
        rows_per = max(128, min(8192, (1 << 28) // max(SL * 64, 1)))
        for off in range(0, len(cidxs), rows_per):
            chunk = cidxs[off:off + rows_per]
            N = len(chunk)
            q = np.full((N, SL), 4, dtype=np.uint8)
            qlens = np.zeros(N, dtype=np.int32)
            ws = np.zeros(N, dtype=np.int64)
            cmin = np.zeros(N, dtype=np.int64)
            cmax = np.zeros(N, dtype=np.int64)
            for r, ci in enumerate(chunk):
                ridx, srev, dga, cnt, qmn, qmx = cand_rows[ci]
                qlo, qhi = slices[ci]
                f = enc_fwd[ridx]
                codes = (revcomp(f) if srev else f)[qlo:qhi]
                q[r, :len(codes)] = codes
                qlens[r] = len(codes)
                ws[r] = dga + qlo - banded.BW // 2
                ci_ref = np.searchsorted(ref.offsets,
                                         dga + (qlo + qhi) // 2,
                                         side='right') - 1
                ci_ref = min(max(ci_ref, 0), len(ref.names) - 1)
                cmin[r] = contig_starts[ci_ref]
                cmax[r] = contig_ends[ci_ref]
            packed_t, emits = dispatch.dp_call(
                _extend_kernel, (q, qlens, ws, cmin, cmax), (genome_j,),
                statics=(acfg.scoring, backend))
            instrument.add_cells(int(qlens.sum(dtype=np.int64))
                                 * banded.BW, 'extend')
            pending.append((chunk, ws, packed_t.T, emits))

    # Fetch ONLY the packed score columns here (6 int32/row); emit streams
    # stay device-resident — selection drops most candidates, so the
    # selected rows are device-gathered and fetched afterwards in one
    # transfer (_fetch_selected_emits).
    if pending:
        import jax.numpy as jnp
        all_p = np.asarray(jnp.concatenate(
            [p.reshape(-1) for (_, _, p, _) in pending]))
    po = 0
    for chunk, ws, packed, emits in pending:
        psz = int(np.prod(packed.shape))
        p_np = all_p[po:po + psz].reshape(packed.shape)
        po += psz
        score, qend, lane, qstart_c, l_fin = tbmod.finalize_scores(p_np)
        for r, ci in enumerate(chunk):
            ridx, srev, dga, cnt, qmn, qmx = cand_rows[ci]
            if score[r] <= 0:
                continue
            qlo, qhi = slices[ci]
            Lq = len(seqs[ridx])
            qbegin_s = int(qstart_c[r])
            rbegin = int(ws[r]) + qbegin_s + int(l_fin[r])
            rend = int(ws[r]) + int(qend[r]) + int(lane[r])
            cidx_ref = int(np.searchsorted(ref.offsets, rbegin,
                                           side='right') - 1)
            cidx_ref = min(max(cidx_ref, 0), len(ref.names) - 1)
            lo = int(ref.offsets[cidx_ref])
            all_aln.append(dict(
                read_idx=ridx, strand_rev=srev,
                chrom_idx=cidx_ref,
                rstart=rbegin - lo,
                rend=rend - lo,
                qstart_o=qlo + qbegin_s,
                qend_o=qlo + int(qend[r]) + 1,
                qlen=Lq,
                score=int(score[r]),
                emit_dev=emits,         # device 2-bit emit buffer
                emit_row=r))            # CIGAR decodes lazily if selected

    return all_aln


def _empty_alignments() -> Alignments:
    return Alignments(*[np.zeros(0, dt) for dt in
                        (np.int32,) * 4 + (bool,) + (np.int32,) * 4
                        + (np.int32,) + (bool, bool)])


def _select_and_finalize(all_aln: list[dict], ref: Reference,
                         config: PipelineConfig,
                         regions_path: str | None) -> Alignments:
    acfg = config.align
    regions = _build_regions(regions_path, ref.names)
    if not all_aln:
        return _empty_alignments()

    # ---- dedup identical alignments -----------------------------------
    seen = set()
    uniq = []
    for a in all_aln:
        key = (a['read_idx'], a['strand_rev'], a['chrom_idx'], a['rstart'],
               a['rend'], a['qstart_o'], a['qend_o'])
        if key in seen:
            continue
        seen.add(key)
        uniq.append(a)
    all_aln = uniq

    # ---- selection DP per read ----------------------------------------
    from collections import Counter
    per_read_counts = Counter(a['read_idx'] for a in all_aln)
    reads = sorted(per_read_counts)
    rmap = {r: i for i, r in enumerate(reads)}
    C = min(64, max(max(per_read_counts.values()), 1))
    B = len(reads)
    qs = np.zeros((B, C), np.int32)
    qe = np.zeros((B, C), np.int32)
    sc = np.zeros((B, C), np.float32)
    bias = np.ones((B, C), np.float32)
    vmask = np.zeros((B, C), bool)
    slots: dict[int, list[int]] = {r: [] for r in reads}
    slot_of = []
    for ai, a in enumerate(all_aln):
        b = rmap[a['read_idx']]
        lst = slots[a['read_idx']]
        if len(lst) >= C:
            slot_of.append(None)        # overflow: drop lowest-priority
            continue
        cslot = len(lst)
        lst.append(ai)
        slot_of.append((b, cslot))
        # query overlap coordinates on the FORWARD read
        if a['strand_rev']:
            fs = a['qlen'] - a['qend_o']
            fe = a['qlen'] - a['qstart_o']
        else:
            fs, fe = a['qstart_o'], a['qend_o']
        qs[b, cslot] = fs
        qe[b, cslot] = fe
        sc[b, cslot] = a['score']
        vmask[b, cslot] = True
        if regions:
            chrom_name = ref.names[a['chrom_idx']]
            if _overlaps_region(regions, chrom_name, a['rstart'] + 1,
                                a['rend'] + 1):
                bias[b, cslot] = acfg.bias
                a['overlaps_region'] = True

    # bias of all-ones is numerically identical to bias=None (score * 1.0
    # in float32 is exact), so the kernel signature stays fixed for the
    # sharded dispatch
    chosen = np.asarray(dispatch.dp_call(
        _select_kernel, (qs, qe, sc, vmask, bias),
        statics=(acfg.ol_cost, acfg.max_overlap,
                 acfg.min_selected_score)))

    sel = []
    for ai, a in enumerate(all_aln):
        so = slot_of[ai]
        if so is None:
            continue
        b, cslot = so
        if chosen[b, cslot]:
            sel.append(a)
    _fetch_selected_emits(sel)

    # primary = max original score per read; mapq from best overlapping
    # unselected candidate
    out = Alignments(
        read_idx=np.array([a['read_idx'] for a in sel], np.int32),
        chrom_idx=np.array([a['chrom_idx'] for a in sel], np.int32),
        rstart=np.array([a['rstart'] for a in sel], np.int32),
        rend=np.array([a['rend'] for a in sel], np.int32),
        strand_rev=np.array([a['strand_rev'] for a in sel], bool),
        qstart_o=np.array([a['qstart_o'] for a in sel], np.int32),
        qend_o=np.array([a['qend_o'] for a in sel], np.int32),
        qlen=np.array([a['qlen'] for a in sel], np.int32),
        score=np.array([a['score'] for a in sel], np.int32),
        mapq=np.zeros(len(sel), np.int32),
        is_primary=np.zeros(len(sel), bool),
        overlaps_region=np.array([a.get('overlaps_region', False)
                                  for a in sel], bool),
        cigars=[a.get('cigar') for a in sel],
    )
    # primary = first max-score alignment per read (argmax tie semantics):
    # stable grouped sort instead of a per-read boolean mask (that scan is
    # O(reads x selected) — quadratic at 10k+ reads)
    n_sel = len(out)
    if n_sel:
        ordr = np.lexsort((np.arange(n_sel), -out.score, out.read_idx))
        rid_s = out.read_idx[ordr]
        first = np.ones(n_sel, bool)
        first[1:] = rid_s[1:] != rid_s[:-1]
        out.is_primary[ordr[first]] = True
    # mapq: bwa-mem-style single-end model (see module docstring),
    # vectorized — per-selected Python scans of the read's unselected
    # candidates cost ~1 s at 10k reads
    match_a = acfg.scoring.match
    mismatch_b = abs(acfg.scoring.mismatch)   # bwa's b is a penalty (+3)
    sub_floor = acfg.seed_k * match_a
    if n_sel:
        uns = [a for ai, a in enumerate(all_aln)
               if slot_of[ai] is None
               or not chosen[slot_of[ai][0]][slot_of[ai][1]]]
        fs_sel = np.where(out.strand_rev, out.qlen - out.qend_o,
                          out.qstart_o).astype(np.int64)
        fe_sel = np.where(out.strand_rev, out.qlen - out.qstart_o,
                          out.qend_o).astype(np.int64)
        span = fe_sel - fs_sel
        s2 = np.zeros(n_sel, np.int64)
        sub_n = np.zeros(n_sel, np.int64)
        if uns:
            u_read = np.array([a['read_idx'] for a in uns], np.int64)
            u_fs = np.array([a['qlen'] - a['qend_o'] if a['strand_rev']
                             else a['qstart_o'] for a in uns], np.int64)
            u_fe = np.array([a['qlen'] - a['qstart_o'] if a['strand_rev']
                             else a['qend_o'] for a in uns], np.int64)
            u_sc = np.array([a['score'] for a in uns], np.int64)
            uo = np.argsort(u_read, kind='stable')
            u_read, u_fs, u_fe, u_sc = (u_read[uo], u_fs[uo], u_fe[uo],
                                        u_sc[uo])
            lo = np.searchsorted(u_read, out.read_idx)
            hi = np.searchsorted(u_read, out.read_idx, side='right')
            counts = hi - lo
            total = int(counts.sum())
            if total:
                sel_rep = np.repeat(np.arange(n_sel), counts)
                offs = np.concatenate([[0], np.cumsum(counts)])[:-1]
                u_idx = (np.arange(total)
                         - np.repeat(offs - lo, counts))
                ov = (np.minimum(fe_sel[sel_rep], u_fe[u_idx])
                      - np.maximum(fs_sel[sel_rep], u_fs[u_idx]))
                ok = ov > 0.5 * span[sel_rep]
                np.maximum.at(s2, sel_rep[ok], u_sc[u_idx[ok]])
                sub_n = np.bincount(sel_rep[ok], minlength=n_sel)
        s1 = out.score.astype(np.float64)
        sub = np.maximum(s2, sub_floor).astype(np.float64)
        l = np.maximum(np.maximum(
            span, (out.rend - out.rstart + 1).astype(np.int64)), 1)
        identity = 1.0 - (l * match_a - s1) / ((match_a + mismatch_b) * l)
        tmp = np.where(l < _MAPQ_COEF_LEN, 1.0,
                       _MAPQ_COEF_FAC / np.log(l))
        tmp = tmp * identity * identity
        mq = (6.02 * (s1 - sub) / match_a * tmp * tmp + 0.499)
        mq = mq.astype(np.int64)
        pen = (4.343 * np.log(sub_n + 1) + 0.499).astype(np.int64)
        mq = np.where(sub_n > 0, mq - pen, mq)
        mq = np.where((s1 <= 0) | (sub >= s1), 0, mq)
        out.mapq[:] = np.clip(mq, 0, 60)
    return out


# bwa-mem mapQ model constants (mem_approx_mapq_se defaults):
# score-gap scale 6.02/match, identity damping for alignments longer than
# 50 bp via (log 50 / log l)^?, and a 4.343*ln(n_sub+1) crowd penalty.
_MAPQ_COEF_LEN = 50
_MAPQ_COEF_FAC = float(np.log(_MAPQ_COEF_LEN))


def _bwa_style_mapq(s1: int, s2: int, qspan: int, rspan: int,
                    match_a: int, mismatch_b: int, sub_floor: int,
                    sub_n: int) -> int:
    if s1 <= 0:
        return 0
    sub = max(s2, sub_floor)
    if sub >= s1:
        return 0
    l = max(qspan, rspan, 1)
    identity = 1.0 - (l * match_a - s1) / float((match_a + mismatch_b) * l)
    tmp = 1.0 if l < _MAPQ_COEF_LEN else _MAPQ_COEF_FAC / np.log(l)
    tmp *= identity * identity
    mapq = int(6.02 * (s1 - sub) / match_a * tmp * tmp + 0.499)
    if sub_n > 0:
        mapq -= int(4.343 * np.log(sub_n + 1) + 0.499)
    return int(min(60, max(0, mapq)))


def _fetch_selected_emits(sel: list[dict]):
    """Decode CIGARs for selected alignments only: device-gather their
    rows from the (still device-resident) 2-bit emit buffers and fetch
    everything in ONE transfer — unselected candidates' emit streams never
    cross the TPU link."""
    from fslr_tpu.ops import traceback as tbmod
    need = [a for a in sel
            if 'cigar' not in a and a.get('emit_dev') is not None]
    if not need:
        return
    import jax.numpy as jnp
    groups: dict[int, tuple] = {}
    for a in need:
        groups.setdefault(id(a['emit_dev']), (a['emit_dev'], []))[1] \
            .append(a)
    flats = []
    for dev, alns in groups.values():
        rows = jnp.asarray(np.array([a['emit_row'] for a in alns],
                                    np.int32))
        flats.append(jnp.take(dev, rows, axis=0).reshape(-1))
    flat = np.asarray(jnp.concatenate(flats) if len(flats) > 1
                      else flats[0])
    off = 0
    for dev, alns in groups.values():
        t4 = int(dev.shape[1])
        block = flat[off:off + len(alns) * t4].reshape(len(alns), t4)
        off += len(alns) * t4
        for a, row in zip(alns, block):
            a['cigar'] = tbmod.decode_emit_row(row)
            a['emit_dev'] = None        # release the device buffer ref


def _fwd_span(out: Alignments, i: int):
    if out.strand_rev[i]:
        return (int(out.qlen[i] - out.qend_o[i]),
                int(out.qlen[i] - out.qstart_o[i]))
    return int(out.qstart_o[i]), int(out.qend_o[i])

