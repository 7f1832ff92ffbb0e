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
from fslr_tpu.encode import _COMP, bucket_length, encode, revcomp
from fslr_tpu.index.reference import Reference, SeedIndex
from fslr_tpu.index.reference import packed_seed_table \
    as refmod_packed_seed_table
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
    # columnar exact-CIGAR RLE (has, cnt, flat_len, flat_op), op codes
    # 0/1/2 = M/I/D — the form the vectorized BAM encoder consumes
    # (io/bam.encode_chunk_items); cigars lists are derived lazily
    cig_rle: tuple | None = None

    def __len__(self):
        return len(self.read_idx)

    def cigar_lists(self):
        """Per-alignment [(len, op_char), ...] lists (None where no emit
        stream exists), derived from cig_rle when not already present."""
        if self.cigars is not None:
            return self.cigars
        if self.cig_rle is None:
            return None
        has, cnt, flat_len, flat_op = self.cig_rle
        out = [None] * len(self)
        ends = np.cumsum(cnt)
        starts = ends - cnt
        ll = flat_len.tolist()
        oo = flat_op.tolist()
        for i in np.flatnonzero(has):
            out[i] = [(ll[t], 'MID'[oo[t]])
                      for t in range(starts[i], ends[i])]
        return out


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


@dataclasses.dataclass
class Cands:
    """Struct-of-arrays candidate bands, one row per (read, strand,
    diagonal band) — the dict/tuple-per-candidate representation cost
    seconds of pure Python per 10k reads (round-2 verdict)."""
    ridx: np.ndarray     # int64 read index
    srev: np.ndarray     # bool, reverse strand
    dga: np.ndarray      # int64 diagonal anchor (global ref coords)
    cnt: np.ndarray      # int64 seed count
    qmn: np.ndarray      # int64 min seed query pos (strand orientation)
    qmx: np.ndarray      # int64 max seed query pos

    def __len__(self):
        return len(self.ridx)

    def take(self, idx):
        return Cands(*(getattr(self, f.name)[idx]
                       for f in dataclasses.fields(self)))

    @staticmethod
    def concat(parts):
        parts = [p for p in parts if len(p)]
        if not parts:
            return _empty_cands()
        return Cands(*(np.concatenate([getattr(p, f.name) for p in parts])
                       for f in dataclasses.fields(Cands)))


def _empty_cands() -> Cands:
    return Cands(np.zeros(0, np.int64), np.zeros(0, bool),
                 np.zeros(0, np.int64), np.zeros(0, np.int64),
                 np.zeros(0, np.int64), np.zeros(0, np.int64))


@dataclasses.dataclass
class CandAln:
    """Struct-of-arrays candidate alignments (pre-selection).  CIGAR emit
    streams stay device-resident: ``emit_buf``/``emit_row`` index into
    ``emit_bufs``; only selected rows are ever fetched."""
    read_idx: np.ndarray     # int64
    strand_rev: np.ndarray   # bool
    chrom_idx: np.ndarray    # int64
    rstart: np.ndarray       # int64 contig-local 0-based inclusive
    rend: np.ndarray         # int64
    qstart_o: np.ndarray     # int64 record-orientation
    qend_o: np.ndarray       # int64 exclusive
    qlen: np.ndarray         # int64
    score: np.ndarray        # int64
    emit_buf: np.ndarray     # int32 index into emit_bufs, -1 = none
    emit_row: np.ndarray     # int32 row within the buffer
    emit_bufs: list          # device 2-bit emit buffers

    _COLS = ('read_idx', 'strand_rev', 'chrom_idx', 'rstart', 'rend',
             'qstart_o', 'qend_o', 'qlen', 'score', 'emit_buf',
             'emit_row')

    def __len__(self):
        return len(self.read_idx)

    def take(self, idx):
        return CandAln(*(getattr(self, c)[idx] for c in self._COLS),
                       self.emit_bufs)

    @staticmethod
    def concat(parts):
        parts = [p for p in parts if len(p)]
        if not parts:
            return _empty_cand_aln()
        bufs: list = []
        cols = {c: [] for c in CandAln._COLS}
        for p in parts:
            eb = p.emit_buf.copy()
            eb[eb >= 0] += len(bufs)
            bufs.extend(p.emit_bufs)
            for c in CandAln._COLS:
                cols[c].append(eb if c == 'emit_buf' else getattr(p, c))
        return CandAln(*(np.concatenate(cols[c]) for c in CandAln._COLS),
                       bufs)


def _empty_cand_aln() -> CandAln:
    dts = (np.int64, bool, np.int64, np.int64, np.int64, np.int64,
           np.int64, np.int64, np.int64, np.int32, np.int32)
    return CandAln(*(np.zeros(0, dt) for dt in dts), [])


def align_batch(seqs: list[str], ref: Reference, sidx: SeedIndex,
                config: PipelineConfig, regions_path: str | None = None,
                backend: str | None = None,
                masked: tuple[Reference, SeedIndex] | None = None,
                codes: tuple[np.ndarray, np.ndarray] | None = None
                ) -> Alignments:
    """Align a list of read sequences.  Returns selected alignments only.

    ``masked``: optional (Reference, SeedIndex) of the masked reference;
    candidates from both references are pooled before selection, exactly as
    the reference pipeline's samtools-merge + single dodi pass arbitrates
    masked-vs-whole-reference candidates (main.py:121-141).  Masked contig
    names must be a subset of the main reference's names.
    """
    if codes is not None:
        # columnar fast path: the caller already holds 0-4 codes
        # (FastxArrays.codes_slice) — skip the string decode/re-encode
        cat, off = codes
    else:
        from fslr_tpu.encode import encode_cat
        cat, off = encode_cat(seqs)
    ca = _gather_candidates(cat, off, ref, sidx, config, backend)
    if masked is not None:
        mref, msidx = masked
        name_to_idx = {n: i for i, n in enumerate(ref.names)}
        mca = _gather_candidates(cat, off, mref, msidx, config, backend)
        remap = np.array([name_to_idx.get(n, -1) for n in mref.names],
                         np.int64)
        new_ci = remap[mca.chrom_idx]
        mca = mca.take(np.flatnonzero(new_ci >= 0))
        mca.chrom_idx = new_ci[new_ci >= 0]
        ca = CandAln.concat([ca, mca])
    return _select_and_finalize(ca, ref, config, regions_path)


def _gather_candidates(cat: np.ndarray, off: np.ndarray, ref: Reference,
                       sidx: SeedIndex, config: PipelineConfig,
                       backend: str | None = None) -> CandAln:
    """Seed + extend: candidate alignments against one reference.

    Sharded indexes (genomes > index.reference.MAX_UNSHARDED_BASES, e.g.
    whole human): candidates are gathered per shard with shard-local int32
    positions and contig ids remapped onto the parent reference — the
    selection DP then arbitrates across shards exactly as it does across
    the masked/whole candidate pool."""
    if sidx.shards:
        return _gather_candidates_sharded(cat, off, sidx, config, backend)
    cands = _seed_rows(cat, off, ref, sidx, config, backend)
    cands = _chain_filter(cands, np.diff(off), config)
    return _extend_rows(cands, cat, off, ref, sidx, config, backend)


def _gather_candidates_sharded(cat: np.ndarray, off: np.ndarray,
                               sidx: SeedIndex, config: PipelineConfig,
                               backend: str | None = None) -> CandAln:
    """Seed every shard, merge candidates to the same per-(read, strand)
    budget a single index would have (top max_candidates by seed count —
    per-shard seeding would otherwise grant each shard its own budget and
    emit extra low-support alignments), then extend per shard."""
    acfg = config.align
    parts = []
    sids = []
    for si, sh in enumerate(sidx.shards):
        c = _seed_rows(cat, off, sh.ref, sh.sidx, config, backend)
        parts.append(c)
        sids.append(np.full(len(c), si, np.int32))
    cands = Cands.concat(parts)
    sid = (np.concatenate(sids) if sids else np.zeros(0, np.int32))
    n = len(cands)
    if n == 0:
        return _empty_cand_aln()
    # top max_candidates per (read, strand) by seed count (stable ties)
    ordr = np.lexsort((np.arange(n), -cands.cnt, cands.srev, cands.ridx))
    key = cands.ridx[ordr] * 2 + cands.srev[ordr]
    new_grp = np.ones(n, bool)
    new_grp[1:] = key[1:] != key[:-1]
    gstart = np.flatnonzero(new_grp)
    rank = np.arange(n) - np.repeat(gstart, np.diff(
        np.concatenate([gstart, [n]])))
    keep = np.zeros(n, bool)
    keep[ordr] = rank < acfg.max_candidates
    cands, sid = cands.take(np.flatnonzero(keep)), sid[keep]
    ck = _chain_filter_mask(cands, np.diff(off), config)
    cands, sid = cands.take(np.flatnonzero(ck)), sid[ck]
    out = []
    for si, sh in enumerate(sidx.shards):
        rows = np.flatnonzero(sid == si)
        if not len(rows):
            continue
        a = _extend_rows(cands.take(rows), cat, off, sh.ref, sh.sidx,
                         config, backend)
        a.chrom_idx = a.chrom_idx + sh.contig_base
        out.append(a)
    return CandAln.concat(out)


def _chain_filter(cands: Cands, rlens: np.ndarray,
                  config: PipelineConfig) -> Cands:
    mask = _chain_filter_mask(cands, rlens, config)
    if mask is None:
        return cands
    return cands.take(np.flatnonzero(mask))


def _chain_filter_mask(cands: Cands, rlens: np.ndarray,
                       config: PipelineConfig):
    """bwa mem chain filtering (mem_chain_flt semantics; reference invokes
    bwa with -D 0.25, /root/reference/fslr/main.py:125): candidate bands of
    a read are visited in seed-count order; a band is dropped when its
    query span overlaps a kept band by >= mask_level * its own span and its
    seed count is below drop_ratio of that kept band's.  Spurious 2-3-seed
    bands shadowed by a real segment — 2/3 of all candidates on amplicon
    data — never reach the extension kernel, exactly as bwa never extends
    chains it drops here.  Comparison is across strands in forward-read
    query coordinates, like bwa's per-read chain list.  Returns a keep
    mask over rows (None = keep everything)."""
    acfg = config.align
    mask_level = acfg.chain_mask_level
    drop_ratio = acfg.chain_drop_ratio
    n = len(cands)
    if drop_ratio <= 0 or n == 0:
        return None
    L = rlens[cands.ridx]
    lo_a = np.where(cands.srev, L - cands.qmx, cands.qmn)
    hi_a = np.where(cands.srev, L - cands.qmn, cands.qmx)
    ordr = np.lexsort((np.arange(n), -cands.cnt, cands.ridx))
    rs = cands.ridx[ordr]
    gb = np.ones(n, bool)
    gb[1:] = rs[1:] != rs[:-1]
    gstart_pos = np.flatnonzero(gb)
    sizes = np.diff(np.concatenate([gstart_pos, [n]]))
    rank = np.arange(n) - np.repeat(gstart_pos, sizes)
    cnt_s = cands.cnt[ordr]
    lo_s = lo_a[ordr]
    hi_s = hi_a[ordr]
    span_s = np.maximum(hi_s - lo_s, 1)
    # rank-iterated shadow test, vectorized across ALL reads at once:
    # candidates per read are few (<= max_candidates), so iterating rank
    # pairs costs O(maxrank^2) vector ops instead of a Python loop over
    # every read (0.65 s per 10k reads)
    maxrank = int(rank.max()) + 1 if n else 0
    keep_s = np.zeros(n, bool)
    keep_s[rank == 0] = True          # first (highest-count) always kept
    gs_rep = np.repeat(gstart_pos, sizes)   # group start per sorted row
    for r in range(1, maxrank):
        cur = np.flatnonzero(rank == r)
        if not len(cur):
            break
        shadowed = np.zeros(len(cur), bool)
        for rp in range(r):
            prev = gs_rep[cur] + rp     # same-read candidate at rank rp
            ov = (np.minimum(hi_s[cur], hi_s[prev])
                  - np.maximum(lo_s[cur], lo_s[prev]))
            shadowed |= (keep_s[prev]
                         & (ov >= mask_level * span_s[cur])
                         & (cnt_s[cur] < drop_ratio * cnt_s[prev]))
        keep_s[cur] = ~shadowed
    keep = np.zeros(n, bool)
    keep[ordr] = keep_s
    return keep



def _seed_kernel(reads, lens, counts, positions, k, stride, occ_drop,
                 band_w, max_cand, S, C):
    """Positional adapter over ops/seed.seed_candidates for dp_call."""
    return seed.seed_candidates(reads, lens, counts, positions, k=k,
                                stride=stride, occ_drop=occ_drop,
                                band_w=band_w, max_cand=max_cand, S=S, C=C)


def _seed_kernel_tab(reads, lens, table, k, stride, occ_drop,
                     band_w, max_cand, S, C):
    """Packed-seed-table variant (one row gather instead of three scalar
    gathers; index/reference.packed_seed_table)."""
    return seed.seed_candidates(reads, lens, None, None, k=k,
                                stride=stride, occ_drop=occ_drop,
                                band_w=band_w, max_cand=max_cand, S=S, C=C,
                                table=table)


# Largest occurrence cap for which the packed seed table is used: HBM is
# 4^k * (1+C) * 4 B per index (~100 MB at k=11, C=5); repetitive genomes
# (C=16, sharded human: one table per shard) stay on the legacy path.
_MAX_TABLE_C = 8


def _device_table(sidx: SeedIndex, C: int):
    mesh = dispatch.active_mesh()
    cached_mesh, cached, cached_c = getattr(sidx, '_dev_tab',
                                            (None, None, -1))
    if cached is None or cached_mesh is not mesh or cached_c != C:
        import jax
        import jax.numpy as jnp
        tab = refmod_packed_seed_table(sidx, C)
        if mesh is not None and mesh.devices.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P
            cached = jax.device_put(tab, NamedSharding(mesh, P()))
        else:
            cached = jnp.asarray(tab)
        sidx._dev_tab = (mesh, cached, C)
    return cached


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


def _seed_rows(cat: np.ndarray, off: np.ndarray, ref: Reference,
               sidx: SeedIndex, config: PipelineConfig,
               backend: str | None = None) -> Cands:
    """Device seeding of both strands -> candidate diagonal bands.

    ``cat``/``off`` are the concatenated read codes + offsets
    (encode.encode_cat); batch rows are assembled with strided gathers
    over ``cat`` — per-row Python fills cost ~1 s per 10k reads
    (round-2 verdict item 3)."""
    import jax.numpy as jnp
    acfg = config.align
    k = acfg.seed_k
    _, counts_j, pos_j = _device_arrays(ref, sidx)
    occ_cap = _occ_cap(sidx, acfg)
    use_tab = occ_cap <= _MAX_TABLE_C
    tab_j = _device_table(sidx, occ_cap) if use_tab else None

    n_reads = len(off) - 1
    rlens = np.diff(off)
    # ---- bucket reads by length ---------------------------------------
    buckets: dict[int, list[int]] = {}
    for i in range(n_reads):
        L = bucket_length(max(int(rlens[i]), k + 1),
                          config.batch.length_buckets)
        buckets.setdefault(L, []).append(i)

    col_r: list = []
    col_s: list = []
    col_d: list = []
    col_c: list = []
    col_mn: list = []
    col_mx: list = []
    _KEYS = ('valid', 'count', 'diag', 'qmin', 'qmax')
    seed_pending = []     # (part, step, nb, packed-device-array)
    ar_cache: dict[int, np.ndarray] = {}
    for L, idxs in sorted(buckets.items()):
        S = max(1, (L - k) // acfg.seed_stride + 1)
        step = max(1, min(config.batch.batch_size,
                          (1 << 23) // max(S * occ_cap, 1)))
        ar = ar_cache.setdefault(L, np.arange(L, dtype=np.int64))
        for o in range(0, len(idxs), step):
            part = np.asarray(idxs[o:o + step], np.int64)
            nb = len(part)
            lf = rlens[part]
            lw = np.minimum(lf, L)
            arr = np.full((2 * step, L), 4, dtype=np.uint8)
            lens = np.zeros(2 * step, dtype=np.int32)
            # rows are contiguous slices of cat (fwd) / reversed
            # complemented slices (rc) — per-row memcpy beats the 2-D
            # fancy gather ~10x (see filter_junk._batch_rows)
            st_l = off[part].tolist()
            lw_l = lw.tolist()
            lf_l = lf.tolist()
            for r in range(nb):
                s, w = st_l[r], lw_l[r]
                arr[r, :w] = cat[s:s + w]
            for r in range(nb):
                s, w, lfr = st_l[r], lw_l[r], lf_l[r]
                # rc[j] = comp(fwd[len-1-j]): last w bases when truncated
                arr[step + r, :w] = _COMP[cat[s + lfr - w:s + lfr]][::-1]
            lens[:nb] = lw
            lens[step:step + nb] = lw
            statics = (k, acfg.seed_stride, acfg.occ_drop,
                       acfg.band_width // 2,
                       acfg.max_candidates, S, occ_cap)
            if use_tab:
                res = dispatch.dp_call(
                    _seed_kernel_tab, (jnp.asarray(arr), jnp.asarray(lens)),
                    (tab_j,), statics=statics)
            else:
                res = dispatch.dp_call(
                    _seed_kernel, (jnp.asarray(arr), jnp.asarray(lens)),
                    (counts_j, pos_j), statics=statics)
            # pack to ONE device array -> one host fetch per batch
            packed = jnp.stack([res[kk].astype(jnp.int32) for kk in _KEYS])
            # hit construction + diagonal sort + max_cand peel rounds all
            # scale with the (2 strands x batch x S x C) hit array
            instrument.add_cells(2 * nb * S * occ_cap, 'seed')
            seed_pending.append((part, step, nb, packed))

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
        col_r.append(ridx_row[rr])
        col_s.append(srev_row[rr])
        col_d.append(diag_a[rr, cc].astype(np.int64))
        col_c.append(count_a[rr, cc].astype(np.int64))
        col_mn.append(qmin_a[rr, cc].astype(np.int64))
        col_mx.append(qmax_a[rr, cc].astype(np.int64))
    if not col_r:
        return _empty_cands()
    return Cands(np.concatenate(col_r), np.concatenate(col_s),
                 np.concatenate(col_d), np.concatenate(col_c),
                 np.concatenate(col_mn), np.concatenate(col_mx))



def _extend_rows(cands: Cands, cat: np.ndarray, off: np.ndarray,
                 ref: Reference, sidx: SeedIndex, config: PipelineConfig,
                 backend: str | None = None) -> CandAln:
    acfg = config.align
    genome_j, _, _ = _device_arrays(ref, sidx)
    contig_starts = ref.offsets[:-1]
    contig_ends = ref.offsets[1:]
    n = len(cands)
    if n == 0:
        return _empty_cand_aln()

    # ---- extension: ONE traceback-kernel pass per candidate -----------
    # Each candidate extends only the seed-supported query slice
    # [qmin - margin, qmax + margin) (split segments don't pay for the
    # whole read), and begins + CIGARs come from the traceback walk — no
    # reverse pass, no separate CIGAR pass.  All batch assembly is
    # vectorized: query windows are strided gathers over the concatenated
    # read codes (forward or reverse-complement via index direction).
    from fslr_tpu.ops import traceback as tbmod

    margin = acfg.extension_margin
    Lq = np.diff(off)[cands.ridx]
    qlo = np.maximum(0, cands.qmn - margin)
    qhi = np.minimum(Lq, cands.qmx + margin)
    sl_arr = np.asarray(_SLICE_BUCKETS, np.int64)
    sl_of = sl_arr[np.minimum(
        np.searchsorted(sl_arr, np.maximum(qhi - qlo, 1)),
        len(sl_arr) - 1)]
    ws_all = cands.dga + qlo - banded.BW // 2
    mid = cands.dga + (qlo + qhi) // 2
    ci_mid = np.clip(np.searchsorted(ref.offsets, mid, side='right') - 1,
                     0, len(ref.names) - 1)
    cmin_all = contig_starts[ci_mid]
    cmax_all = contig_ends[ci_mid]
    qlens_all = qhi - qlo

    # Phase A: dispatch every chunk (windows gathered on device from the
    # device-resident genome; results stay on device).  Phase B: fetch ALL
    # chunks' results in TWO transfers (one int32 concat, one uint8
    # concat) — per-chunk fetches cost ~1 s each over the TPU tunnel and
    # dominated this stage.
    pending = []      # (chunk idx array, device packed, chunk id)
    emit_bufs: list = []
    for SL in np.unique(sl_of):
        cidxs = np.flatnonzero(sl_of == SL)
        SL = int(SL)
        # chunk rows so device-resident traceback bits stay bounded
        # (~SL*16 int32 per row; bits never leave the device)
        rows_per = max(128, min(8192, (1 << 28) // max(SL * 64, 1)))
        for o in range(0, len(cidxs), rows_per):
            chunk = cidxs[o:o + rows_per]
            ri = cands.ridx[chunk]
            sv = cands.srev[chunk]
            ql = qlo[chunk]
            qlens = np.minimum(qlens_all[chunk], SL).astype(np.int32)
            # fwd rows read cat[off+qlo+j]; rc rows read the read's
            # reverse complement: rc[qlo+j] = comp(fwd[L-1-qlo-j]).
            # Every row is a contiguous (or reversed) slice of cat —
            # per-row memcpy, not a 2-D fancy gather.
            start_f = (off[ri] + ql).tolist()
            # rc row j spans cat[L-1-ql-(w-1) .. L-1-ql] reversed
            end_r = (off[ri] + (Lq[chunk] - ql)).tolist()
            sv_l = sv.tolist()
            w_l = qlens.tolist()
            q = np.full((len(chunk), SL), 4, dtype=np.uint8)
            for r in range(len(chunk)):
                w = w_l[r]
                if sv_l[r]:
                    e = end_r[r]
                    q[r, :w] = _COMP[cat[e - w:e]][::-1]
                else:
                    s = start_f[r]
                    q[r, :w] = cat[s:s + w]
            packed_t, emits = dispatch.dp_call(
                _extend_kernel,
                (q, qlens, ws_all[chunk], cmin_all[chunk],
                 cmax_all[chunk]),
                (genome_j,), statics=(acfg.scoring, backend))
            instrument.add_cells(int(qlens.sum(dtype=np.int64))
                                 * banded.BW, 'extend')
            pending.append((chunk, packed_t.T, len(emit_bufs)))
            emit_bufs.append(emits)

    # Fetch ONLY the packed score columns here (6 int32/row); emit streams
    # stay device-resident — selection drops most candidates, so the
    # selected rows are device-gathered and fetched afterwards in one
    # transfer (_fetch_selected_emits).
    import jax.numpy as jnp
    all_p = np.asarray(jnp.concatenate(
        [p.reshape(-1) for (_, p, _) in pending]))
    po = 0
    parts = []
    for chunk, packed, buf_id in pending:
        psz = int(np.prod(packed.shape))
        p_np = all_p[po:po + psz].reshape(packed.shape)
        po += psz
        score, qend, lane, qstart_c, l_fin = tbmod.finalize_scores(p_np)
        keep = np.flatnonzero(score > 0)
        if not len(keep):
            continue
        ck = chunk[keep]
        sc = score[keep].astype(np.int64)
        qb = qstart_c[keep].astype(np.int64)
        qe = qend[keep].astype(np.int64)
        rbegin = ws_all[ck] + qb + l_fin[keep]
        rend = ws_all[ck] + qe + lane[keep]
        ci_ref = np.clip(
            np.searchsorted(ref.offsets, rbegin, side='right') - 1,
            0, len(ref.names) - 1)
        lo_c = ref.offsets[ci_ref]
        parts.append(CandAln(
            read_idx=cands.ridx[ck],
            strand_rev=cands.srev[ck],
            chrom_idx=ci_ref.astype(np.int64),
            rstart=rbegin - lo_c,
            rend=rend - lo_c,
            qstart_o=qlo[ck] + qb,
            qend_o=qlo[ck] + qe + 1,
            qlen=Lq[ck],
            score=sc,
            emit_buf=np.full(len(ck), buf_id, np.int32),
            emit_row=keep.astype(np.int32),
            emit_bufs=[]))
    if not parts:
        return _empty_cand_aln()
    out_cols = {c: np.concatenate([getattr(p, c) for p in parts])
                for c in CandAln._COLS}
    return CandAln(*(out_cols[c] for c in CandAln._COLS), emit_bufs)



def _empty_alignments() -> Alignments:
    return Alignments(*[np.zeros(0, dt) for dt in
                        (np.int32,) * 4 + (bool,) + (np.int32,) * 4
                        + (np.int32,) + (bool, bool)])


def _select_and_finalize(ca: CandAln, ref: Reference,
                         config: PipelineConfig,
                         regions_path: str | None) -> Alignments:
    acfg = config.align
    regions = _build_regions(regions_path, ref.names)
    if len(ca) == 0:
        return _empty_alignments()

    # ---- dedup identical alignments (keep first occurrence, in order) --
    packed = np.empty((len(ca), 7), np.int64)
    for c, col in enumerate(('read_idx', 'strand_rev', 'chrom_idx',
                             'rstart', 'rend', 'qstart_o', 'qend_o')):
        packed[:, c] = getattr(ca, col)
    _, first = np.unique(packed, axis=0, return_index=True)
    ca = ca.take(np.sort(first))
    n = len(ca)

    # ---- selection DP per read ----------------------------------------
    reads = np.unique(ca.read_idx)
    b = np.searchsorted(reads, ca.read_idx)
    B = len(reads)
    cnts = np.bincount(b, minlength=B)
    C = min(64, max(int(cnts.max()), 1))
    # candidate slot = rank within read in encounter order; ranks >= C
    # overflow and are dropped from selection (but still count as
    # sub-optimal hits for MAPQ, like before)
    ordb = np.argsort(b, kind='stable')
    gstart = np.zeros(B + 1, np.int64)
    np.cumsum(cnts, out=gstart[1:])
    within = np.arange(n) - np.repeat(gstart[:-1], cnts)
    cslot = np.empty(n, np.int64)
    cslot[ordb] = within
    val = cslot < C

    # query overlap coordinates on the FORWARD read
    fs = np.where(ca.strand_rev, ca.qlen - ca.qend_o, ca.qstart_o)
    fe = np.where(ca.strand_rev, ca.qlen - ca.qstart_o, ca.qend_o)

    # region overlap (closed intervals, pd.Interval semantics)
    ov_any = np.zeros(n, bool)
    if regions:
        name_idx = {nm: i for i, nm in enumerate(ref.names)}
        for cname, iv in regions.items():
            ci = name_idx[cname]
            m = np.flatnonzero(ca.chrom_idx == ci)
            if not len(m):
                continue
            s_ = ca.rstart[m] + 1
            e_ = ca.rend[m] + 1
            acc = np.zeros(len(m), bool)
            for a0, b0 in iv:
                acc |= (a0 < e_) & (s_ < b0)
            ov_any[m] = acc

    qs = np.zeros((B, C), np.int32)
    qe = np.zeros((B, C), np.int32)
    sc = np.zeros((B, C), np.float32)
    bias = np.ones((B, C), np.float32)
    vmask = np.zeros((B, C), bool)
    bb, cc = b[val], cslot[val]
    qs[bb, cc] = fs[val]
    qe[bb, cc] = fe[val]
    sc[bb, cc] = ca.score[val]
    vmask[bb, cc] = True
    if regions:
        bias[bb, cc] = np.where(ov_any[val], np.float32(acfg.bias),
                                np.float32(1.0))

    # bias of all-ones is numerically identical to bias=None (score * 1.0
    # in float32 is exact), so the kernel signature stays fixed for the
    # sharded dispatch
    chosen = np.asarray(dispatch.dp_call(
        _select_kernel, (qs, qe, sc, vmask, bias),
        statics=(acfg.ol_cost, acfg.max_overlap,
                 acfg.min_selected_score)))
    sel_mask = np.zeros(n, bool)
    sel_mask[val] = chosen[bb, cc]
    sel_idx = np.flatnonzero(sel_mask)
    n_sel = len(sel_idx)
    cig_rle = _fetch_selected_emits(ca, sel_idx)

    out = Alignments(
        read_idx=ca.read_idx[sel_idx].astype(np.int32),
        chrom_idx=ca.chrom_idx[sel_idx].astype(np.int32),
        rstart=ca.rstart[sel_idx].astype(np.int32),
        rend=ca.rend[sel_idx].astype(np.int32),
        strand_rev=ca.strand_rev[sel_idx],
        qstart_o=ca.qstart_o[sel_idx].astype(np.int32),
        qend_o=ca.qend_o[sel_idx].astype(np.int32),
        qlen=ca.qlen[sel_idx].astype(np.int32),
        score=ca.score[sel_idx].astype(np.int32),
        mapq=np.zeros(n_sel, np.int32),
        is_primary=np.zeros(n_sel, bool),
        overlaps_region=ov_any[sel_idx],
        cig_rle=cig_rle,
    )
    # primary = first max-score alignment per read (argmax tie semantics):
    # stable grouped sort instead of a per-read boolean mask (that scan is
    # O(reads x selected) — quadratic at 10k+ reads)
    if n_sel:
        ordr = np.lexsort((np.arange(n_sel), -out.score, out.read_idx))
        rid_s = out.read_idx[ordr]
        first_m = np.ones(n_sel, bool)
        first_m[1:] = rid_s[1:] != rid_s[:-1]
        out.is_primary[ordr[first_m]] = True
    # mapq: bwa-mem-style single-end model (see module docstring),
    # vectorized — per-selected Python scans of the read's unselected
    # candidates cost ~1 s at 10k reads
    match_a = acfg.scoring.match
    mismatch_b = abs(acfg.scoring.mismatch)   # bwa's b is a penalty (+3)
    sub_floor = acfg.seed_k * match_a
    if n_sel:
        fs_sel = fs[sel_idx].astype(np.int64)
        fe_sel = fe[sel_idx].astype(np.int64)
        span = fe_sel - fs_sel
        s2 = np.zeros(n_sel, np.int64)
        sub_n = np.zeros(n_sel, np.int64)
        uns = np.flatnonzero(~sel_mask)
        if len(uns):
            u_read = ca.read_idx[uns]
            u_fs = fs[uns]
            u_fe = fe[uns]
            u_sc = ca.score[uns]
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
        # max(l, 2): np.where evaluates both branches, and log(1) = 0
        # raised a divide-by-zero warning for 1-base spans (discarded by
        # the where, but noisy at every chunk)
        tmp = np.where(l < _MAPQ_COEF_LEN, 1.0,
                       _MAPQ_COEF_FAC / np.log(np.maximum(l, 2)))
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


def _fetch_selected_emits(ca: CandAln, sel_idx: np.ndarray):
    """Decode CIGARs for selected alignments only: device-gather their
    rows from the (still device-resident) 2-bit emit buffers and fetch
    everything in ONE transfer — unselected candidates' emit streams never
    cross the TPU link.  Returns the COLUMNAR RLE form
    (has, cnt, flat_len, flat_op) in selected order — op codes 0/1/2 =
    M/I/D, has=False where no emit stream exists (fallback rows).  The
    per-record Python op lists this used to build were ~25 s of the
    1M-read run; list consumers derive them via Alignments.cigar_lists."""
    from fslr_tpu.ops import traceback as tbmod
    n = len(sel_idx)
    has = np.zeros(n, bool)
    cnt = np.zeros(n, np.int64)
    empty = (has, cnt, np.zeros(0, np.int64), np.zeros(0, np.int64))
    if not n or not ca.emit_bufs:
        return empty
    bufs = ca.emit_buf[sel_idx]
    rows = ca.emit_row[sel_idx]
    need = np.flatnonzero(bufs >= 0)
    if not len(need):
        return empty
    import jax.numpy as jnp
    flats = []
    groups = []          # (positions into the selected order, row width)
    for bid in np.unique(bufs[need]):
        g = need[bufs[need] == bid]
        dev = ca.emit_bufs[bid]
        flats.append(jnp.take(dev, jnp.asarray(rows[g]), axis=0)
                     .reshape(-1))
        groups.append((g, int(dev.shape[1])))
    flat = np.asarray(jnp.concatenate(flats) if len(flats) > 1
                      else flats[0])
    o = 0
    seg_rows_l, seg_len_l, seg_op_l = [], [], []
    for g, t4 in groups:
        block = flat[o:o + len(g) * t4].reshape(len(g), t4)
        o += len(g) * t4
        sr, sl, so = tbmod.decode_emit_rle(block)
        seg_rows_l.append(g[sr])             # -> selected order
        seg_len_l.append(sl)
        seg_op_l.append(so)
        has[g] = True
    seg_rows = np.concatenate(seg_rows_l)
    seg_len = np.concatenate(seg_len_l).astype(np.int64)
    seg_op = np.concatenate(seg_op_l)
    # group-concat leaves rows unordered ACROSS groups; a stable sort by
    # row restores selected order while keeping within-row op order
    ordr = np.argsort(seg_rows, kind='stable')
    seg_rows = seg_rows[ordr]
    np.add.at(cnt, seg_rows, 1)
    return has, cnt, seg_len[ordr], seg_op[ordr]



def _fwd_span(out: Alignments, i: int):
    if out.strand_rev[i]:
        return (int(out.qlen[i] - out.qend_o[i]),
                int(out.qlen[i] - out.qstart_o[i]))
    return int(out.qstart_o[i]), int(out.qend_o[i])

