"""Tandem-repeat masking: a tantan-equivalent HMM, batched in JAX.

The reference shells out to the ``tantan`` C++ binary to lowercase-mask
tandem repeats before junk filtering (/root/reference/fslr/filter_junk_from_fq.py:219-221).
This module implements the same probabilistic model class (Frith 2011,
"A new repeat-masking method enables specific detection of homologous
sequences") as a batched forward-backward scan over fixed-shape read arrays:

  states:       background b, repeat states r_d for periods d = 1..P
  transitions:  b->r_d proportional to decay^d summing to repeat_start;
                r_d->b = repeat_end; r_d->r_d = 1 - repeat_end
  emissions:    background uniform over ACGT; r_d emits base matching
                seq[i-d] with prob match_prob, else (1-match_prob)/3; any
                comparison involving N has likelihood ratio 1.

Positions with posterior P(repeat) >= posterior_threshold are masked.  The
scan state is (B, P+1) per position; the forward pass stores per-position
normalized state vectors in HBM (they are consumed by the backward pass),
so peak memory is O(B * L * P) — callers bucket batch sizes accordingly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fslr_tpu.config import JunkFilterConfig


@functools.partial(jax.jit, static_argnames=('P',))
def _mask_impl(seq, lens, P, start_total, end_p, decay, match_p, thresh):
    B, L = seq.shape
    seq = seq.astype(jnp.int32)

    d_idx = jnp.arange(1, P + 1, dtype=jnp.float32)
    start_d = decay ** d_idx
    start_d = start_d / jnp.sum(start_d) * start_total   # (P,)
    stay_b = 1.0 - start_total
    stay_r = 1.0 - end_p

    match_ratio = match_p / 0.25
    mismatch_ratio = (1.0 - match_p) / 3.0 / 0.25

    # window[b, d-1] = seq[b, i-d]; 5 = "no base yet" sentinel (ratio 0:
    # a repeat with period d cannot start before position d).
    init_win = jnp.full((B, P), 5, jnp.int32)

    def emission(win, x):
        xb = x[:, None]
        has_n = (xb == 4) | (win == 4)
        invalid = win == 5
        m = xb == win
        er = jnp.where(m, match_ratio, mismatch_ratio)
        er = jnp.where(has_n, 1.0, er)
        return jnp.where(invalid, 0.0, er)      # (B, P)

    def fwd_step(carry, x):
        fb, fr, win = carry
        er = emission(win, x)
        fr_new = (fr * stay_r + fb[:, None] * start_d[None, :]) * er
        fb_new = fb * stay_b + jnp.sum(fr, axis=1) * end_p
        z = fb_new + jnp.sum(fr_new, axis=1)
        z = jnp.maximum(z, 1e-30)
        fb_new = fb_new / z
        fr_new = fr_new / z[:, None]
        win = jnp.roll(win, 1, axis=1).at[:, 0].set(x)
        return (fb_new, fr_new, win), (fb_new, fr_new)

    xT = seq.T  # (L, B)
    (_, _, win_final), (fb_all, fr_all) = jax.lax.scan(
        fwd_step, (jnp.ones((B,)), jnp.zeros((B, P)), init_win), xT, unroll=8)

    # Backward pass: beta_i(s) = sum_s' T(s,s') e_{s'}(i+1) beta_{i+1}(s'),
    # with beta_{L-1} = 1.  Scanning k = 0..L-1 (p = L-1-k), each step first
    # EMITS the incoming carry (beta_p), then computes beta_{p-1} using the
    # emission at position p, which compares seq[p] with window(p) =
    # [seq[p-1] ... seq[p-P]].  window(p) is obtained from window(p+1) by
    # dropping seq[p] at the front and appending seq[p-P] at the back
    # (supplied as a precomputed shifted column; sentinel 5 when p < P).
    pad = jnp.full((B, P), 5, jnp.int32)
    seq_ext = jnp.concatenate([pad, seq], axis=1)   # seq_ext[:, r] = seq[:, r-P]
    back_cols = seq_ext[:, :L].T                    # back_cols[p] = seq[p-P]

    def bwd_step(carry, inp):
        bb, br, win = carry
        x_p, x_back = inp
        emit = (bb, br)
        win = jnp.roll(win, -1, axis=1).at[:, P - 1].set(x_back)  # window(p)
        er = emission(win, x_p)                      # e_{s'}(p)
        w = er * br                                  # (B, P)
        bb_new = stay_b * bb + jnp.sum(start_d[None, :] * w, axis=1)
        br_new = stay_r * w + end_p * bb[:, None]
        z = bb_new + jnp.sum(br_new, axis=1)
        z = jnp.maximum(z, 1e-30)
        return (bb_new / z, br_new / z[:, None], win), emit

    # win_final from the forward pass is window(L) = [seq[L-1] ... seq[L-P]]
    init_b = (jnp.ones((B,)), jnp.ones((B, P)), win_final)
    (_, _, _), (bb_all, br_all) = jax.lax.scan(
        bwd_step, init_b, (xT[::-1], back_cols[::-1]), unroll=8)
    bb_all = bb_all[::-1]
    br_all = br_all[::-1]

    num = jnp.sum(fr_all * br_all, axis=2)                  # (L, B)
    den = num + fb_all * bb_all
    posterior = num / jnp.maximum(den, 1e-30)
    mask = (posterior >= thresh).T                          # (B, L)
    pos = jnp.arange(L)[None, :]
    return mask & (pos < lens[:, None]) & (seq != 4)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------
#
# The lax.scan formulation above keeps the HMM correct but leaves the chip
# idle: every position is ~15 vector ops on a (B, P) state with two HBM
# round-trips for the stacked per-position posteriors.  The kernel keeps the
# whole forward-backward in VMEM: periods live on lanes (P=100 of 128), a
# block of SUB reads lives on sublanes, and the position scan is a
# fori_loop peeling sequence columns from 128-wide VMEM blocks (the
# lane-aligned dynamic-slice pattern of ops/ssw.py).  The backward pass
# needs forward states in reverse order, so the forward pass checkpoints
# its carry every C=256 positions and the backward pass re-derives each
# chunk's per-position (fr, fb, emission) into VMEM scratch before
# consuming it in reverse — posteriors never touch HBM; only the final
# 0/1 mask is written out.

# (reads per grid block, checkpoint interval): the HMM step is a serial
# dependency chain (two cross-lane reductions per position), so wider SUB
# hides op latency across independent reads; VMEM caps SUB*CHUNK and the
# checkpoint count L/CHUNK.  All length buckets are multiples of 256
# (config.BatchConfig.length_buckets).
def _block_params(L: int) -> tuple[int, int]:
    if L <= 4096:
        return 64, 128
    if L <= 16384:
        return 32, 128
    return 16, 256


# Positions between carry rescales (f32 range guard: per-step growth is
# bounded by max emission ratio 3.6 -> 3.6^16 ~ 9e8; shrink by 0.133^16
# ~ 1e-14 — both comfortably inside f32 between rescales).
_RESCALE = 16


def _mask_kernel(seq_ref, sd_ref, out_ref, frb, erb, ckf, ckw, *,
                 L, SUB, C, P, stay_b, stay_r, end_p, match_ratio,
                 mismatch_ratio, thresh):
    nchunk = L // C
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
    dmaskf = (lane < P).astype(jnp.float32)
    start_d = jnp.broadcast_to(sd_ref[:], (SUB, 128))

    def emission(win, xcol):
        has_n = (xcol == 4) | (win == 4)
        er = jnp.where(win == xcol, match_ratio, mismatch_ratio)
        er = jnp.where(has_n, 1.0, er)
        er = jnp.where(win == 5, 0.0, er)
        return er * dmaskf            # lanes >= P are dead states

    def fwd_step(fb, fr, win, xcol):
        # _mask_impl.fwd_step WITHOUT per-step normalization: the
        # posterior is a ratio of same-step alpha*beta products, so a
        # common scale on (fb, fr) cancels exactly — normalizing every
        # position (a cross-lane reduce + two divides in the serial
        # chain) only guards the f32 range, which a rescale every
        # _RESCALE positions does just as well.
        er = emission(win, xcol)
        fr_new = (fr * stay_r + fb * start_d) * er
        fb_new = fb * stay_b + jnp.sum(fr, axis=1, keepdims=True) * end_p
        win = jnp.where(lane == 0, xcol, pltpu.roll(win, shift=1, axis=1))
        return fb_new, fr_new, win, er

    def rescale_f(fb, fr):
        z = fb + jnp.sum(fr, axis=1, keepdims=True)
        r = 1.0 / jnp.maximum(z, 1e-30)
        return fb * r, fr * r

    def rescale_b(bb, br):
        z = bb + jnp.sum(br, axis=1, keepdims=True)
        r = 1.0 / jnp.maximum(z, 1e-30)
        return bb * r, br * r

    def seq_blk(j, b):
        off = pl.multiple_of(j * C + b * 128, 128)
        return seq_ref[:, pl.ds(off, 128)]

    # fb rides in dead lane 127 (P <= 126 always leaves it free), so every
    # buffer store/load is ONE full-tile (SUB, 128) access on the leading
    # (untiled) dim — a mid-dim pl.ds store touches a single sublane of
    # every tile (read-modify-write) and was ~5x slower.
    def pack_fb(fb, fr):
        return jnp.where(lane == 127, fb, fr)

    # ---- forward: carry only, checkpoint every C positions -------------
    def fwd_chunk(j, carry):
        fb, fr, win = carry
        ckf[pl.ds(j, 1)] = pack_fb(fb, fr)[None]
        ckw[pl.ds(j, 1)] = win[None]

        def blk_loop(b, c2):
            fb, fr, win = c2

            def peel(si, c3):
                fb, fr, win, blk = c3
                fb, fr, win, _ = fwd_step(fb, fr, win, blk[:, 0:1])
                return fb, fr, win, pltpu.roll(blk, shift=127, axis=1)

            def grp(g, c3):
                fb, fr, win, blk = jax.lax.fori_loop(
                    g * _RESCALE, (g + 1) * _RESCALE, peel, c3)
                fb, fr = rescale_f(fb, fr)
                return fb, fr, win, blk

            fb, fr, win, _ = jax.lax.fori_loop(
                0, 128 // _RESCALE, grp, (fb, fr, win, seq_blk(j, b)))
            return fb, fr, win

        return jax.lax.fori_loop(0, C // 128, blk_loop, (fb, fr, win))

    init = (jnp.ones((SUB, 1), jnp.float32),
            jnp.zeros((SUB, 128), jnp.float32),
            jnp.full((SUB, 128), 5, jnp.int32))
    jax.lax.fori_loop(0, nchunk, fwd_chunk, init)

    # ---- backward: per chunk, recompute forward then walk back ---------
    def bwd_chunk(jj, carry):
        bb, br = carry
        j = nchunk - 1 - jj
        row = ckf[pl.ds(j, 1)][0]
        fb = row[:, 127:128]
        fr = row * dmaskf
        win = ckw[pl.ds(j, 1)][0]

        def re_blk(b, c2):
            fb, fr, win = c2

            def peel(si, c3):
                fb, fr, win, blk = c3
                t = b * 128 + si
                fb2, fr2, win2, er = fwd_step(fb, fr, win, blk[:, 0:1])
                erb[pl.ds(t, 1)] = er[None]
                frb[pl.ds(t, 1)] = pack_fb(fb2, fr2)[None]
                return fb2, fr2, win2, pltpu.roll(blk, shift=127, axis=1)

            def grp(g, c3):
                fb, fr, win, blk = jax.lax.fori_loop(
                    g * _RESCALE, (g + 1) * _RESCALE, peel, c3)
                fb, fr = rescale_f(fb, fr)
                return fb, fr, win, blk

            fb, fr, win, _ = jax.lax.fori_loop(
                0, 128 // _RESCALE, grp, (fb, fr, win, seq_blk(j, b)))
            return fb, fr, win

        jax.lax.fori_loop(0, C // 128, re_blk, (fb, fr, win))

        def bwd_blk(bi, c2):
            bb, br = c2
            b = C // 128 - 1 - bi

            def step(si, c3):
                bb, br, macc = c3
                s = 127 - si
                t = b * 128 + s
                fr_t = frb[pl.ds(t, 1)][0]       # fb in lane 127
                er_t = erb[pl.ds(t, 1)][0]
                fb_t = fr_t[:, 127:128]
                # emit posterior at position t from the INCOMING beta
                # (jax bwd_step emits the carry before updating); br is 0
                # on lanes >= P, so the packed fb lane never reaches num.
                # post >= thresh is evaluated divide-free as
                # num >= thresh * max(den, eps) (num, den >= 0).
                num = jnp.sum(fr_t * br, axis=1, keepdims=True)
                den = num + fb_t * bb
                bit = (num >= thresh * jnp.maximum(den, 1e-30)
                       ).astype(jnp.float32)
                macc = jnp.where(lane == s, bit, macc)
                w = er_t * br
                bb_new = (stay_b * bb
                          + jnp.sum(start_d * w, axis=1, keepdims=True))
                br_new = (stay_r * w + end_p * bb) * dmaskf
                return bb_new, br_new, macc

            def grp(g, c3):
                bb, br, macc = jax.lax.fori_loop(
                    g * _RESCALE, (g + 1) * _RESCALE, step, c3)
                bb, br = rescale_b(bb, br)
                return bb, br, macc

            bb, br, macc = jax.lax.fori_loop(
                0, 128 // _RESCALE, grp,
                (bb, br, jnp.zeros((SUB, 128), jnp.float32)))
            off = pl.multiple_of(j * C + b * 128, 128)
            out_ref[:, pl.ds(off, 128)] = macc.astype(jnp.int32)
            return bb, br

        return jax.lax.fori_loop(0, C // 128, bwd_blk, (bb, br))

    # beta init: ones over live states (jax: ones((B,)), ones((B, P)))
    jax.lax.fori_loop(0, nchunk, bwd_chunk,
                      (jnp.ones((SUB, 1), jnp.float32), dmaskf))


@functools.partial(
    jax.jit, static_argnames=('P', 'stay_b', 'stay_r', 'end_p',
                              'match_ratio', 'mismatch_ratio', 'thresh',
                              'interpret'))
def _mask_pallas(seq, lens, start_d, P, stay_b, stay_r, end_p,
                 match_ratio, mismatch_ratio, thresh, interpret=False):
    B0, L = seq.shape
    SUB, C = _block_params(L)
    B = (B0 + SUB - 1) // SUB * SUB
    seq32 = seq.astype(jnp.int32)
    if B != B0:
        seq32 = jnp.pad(seq32, ((0, B - B0), (0, 0)), constant_values=4)
    sd = jnp.zeros((1, 128), jnp.float32).at[0, :start_d.shape[0]].set(
        start_d)
    kern = functools.partial(
        _mask_kernel, L=L, SUB=SUB, C=C,
        P=P, stay_b=stay_b, stay_r=stay_r, end_p=end_p,
        match_ratio=match_ratio, mismatch_ratio=mismatch_ratio,
        thresh=thresh)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, L), jnp.int32),
        grid=(B // SUB,),
        in_specs=[
            pl.BlockSpec((SUB, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SUB, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=(
            [pltpu.VMEM((C, SUB, 128), jnp.float32)] * 2
            + [pltpu.VMEM((L // C, SUB, 128), jnp.float32),
               pltpu.VMEM((L // C, SUB, 128), jnp.int32)]),
        interpret=interpret,
    )(seq32, sd)
    mask = out[:B0] != 0
    pos = jnp.arange(L)[None, :]
    return mask & (pos < lens[:, None]) & (seq != 4)


def _start_d_vec(P, start_total, decay):
    """The b->r_d transition vector, same jnp ops as _mask_impl."""
    d_idx = jnp.arange(1, P + 1, dtype=jnp.float32)
    sd = decay ** d_idx
    return sd / jnp.sum(sd) * start_total


def repeat_mask(seq, lens, cfg: JunkFilterConfig, backend: str | None = None):
    """Boolean repeat mask (B, L) for encoded reads (uint8, 4 = N)."""
    seq = jnp.asarray(seq)
    lens = jnp.asarray(lens, jnp.int32)
    L = seq.shape[1]
    from fslr_tpu.ops.ssw import _use_pallas
    use_pallas = (backend in ('pallas', 'pallas_interpret')
                  or (_use_pallas(backend)
                      and L % 256 == 0 and cfg.mask_max_period <= 126))
    if use_pallas:
        sd = _start_d_vec(cfg.mask_max_period, cfg.mask_repeat_start,
                          cfg.mask_decay)
        kw = dict(P=cfg.mask_max_period,
                  stay_b=1.0 - cfg.mask_repeat_start,
                  stay_r=1.0 - cfg.mask_repeat_end,
                  end_p=cfg.mask_repeat_end,
                  match_ratio=cfg.mask_match_prob / 0.25,
                  mismatch_ratio=(1.0 - cfg.mask_match_prob) / 3.0 / 0.25,
                  thresh=cfg.mask_posterior_threshold)
        if backend == 'pallas_interpret':
            with pltpu.force_tpu_interpret_mode():
                return _mask_pallas(seq, lens, sd, interpret=True, **kw)
        return _mask_pallas(seq, lens, sd, **kw)
    return _mask_impl(
        seq, lens, cfg.mask_max_period,
        cfg.mask_repeat_start, cfg.mask_repeat_end, cfg.mask_decay,
        cfg.mask_match_prob, cfg.mask_posterior_threshold)
