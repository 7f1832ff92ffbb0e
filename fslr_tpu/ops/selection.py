"""Split-alignment selection DP — the dodi-equivalent (N2).

Chooses, per read, the optimal non-redundant set of candidate alignments
over query coordinates.  Semantics reverse-engineered from the reference's
dodi invocation ``--paired False -c 1 -u 21 --ol-cost 2 --max-overlap
50000`` (/root/reference/fslr/main.py:137,154,164) and downstream
expectations (/root/reference/fslr/collect_mapping_info.py:42-48,
README.rst:195-197):

  * maximize  sum(selection_score) - ol_cost * total query overlap, where
    selection_score = alignment score, multiplied by ``bias`` (1.05) for
    alignments overlapping --regions (bias affects selection only; outputs
    keep original scores);
  * pairs overlapping by more than max_overlap cannot co-exist;
  * candidates scoring below min_score (dodi -u 21) are dropped;
  * exactly one primary is designated: the selected alignment with the
    highest original score (the reference works around dodi emitting
    multiple primaries by taking max AS — same outcome).

Implementation: per read, candidates sorted by query end; dp[i] = s_i +
max(0, max_j<i dp[j] - ol_cost * overlap(j, i)); batched (B, C) vector ops
with a sequential scan over the C candidate slots; backtracking by parent
pointers, C iterations.  C <= 64 so the O(C^2) cost is trivial next to
extension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = -1e30


@functools.partial(jax.jit, static_argnames=('ol_cost', 'max_overlap'))
def _select_impl(qstart, qend, s_sel, valid, ol_cost, max_overlap):
    B, C = qstart.shape
    qs = jnp.where(valid, qstart, 2 ** 30).astype(jnp.float32)
    qe = jnp.where(valid, qend, 2 ** 30).astype(jnp.float32)
    order = jnp.argsort(qe, axis=1)
    qs = jnp.take_along_axis(qs, order, axis=1)
    qe = jnp.take_along_axis(qe, order, axis=1)
    sc = jnp.take_along_axis(jnp.where(valid, s_sel, NEG), order, axis=1)
    v = jnp.take_along_axis(valid, order, axis=1)

    dp = jnp.full((B, C), NEG)
    parent = jnp.full((B, C), -1, jnp.int32)

    def body(i, carry):
        dp, parent = carry
        # predecessors j < i (by sorted order)
        ov = jnp.maximum(qe - qs[:, i][:, None], 0.0)       # overlap(j, i)
        allowed = (jnp.arange(C) < i)[None, :] & (ov <= max_overlap)
        cand = jnp.where(allowed, dp - ol_cost * ov, NEG)
        bestj = jnp.argmax(cand, axis=1)
        bestv = jnp.take_along_axis(cand, bestj[:, None], axis=1)[:, 0]
        take_prev = bestv > 0.0
        di = sc[:, i] + jnp.maximum(bestv, 0.0)
        dp = dp.at[:, i].set(jnp.where(v[:, i], di, NEG))
        parent = parent.at[:, i].set(
            jnp.where(take_prev & v[:, i], bestj, -1))
        return dp, parent

    dp, parent = jax.lax.fori_loop(0, C, body, (dp, parent))

    end = jnp.argmax(dp, axis=1)
    chosen = jnp.zeros((B, C), jnp.bool_)
    any_valid = jnp.any(v, axis=1)

    def walk(_, carry):
        chosen, cur = carry
        ok = cur >= 0
        cur_c = jnp.maximum(cur, 0)
        chosen = jnp.where(
            ok[:, None] & (jnp.arange(C)[None, :] == cur_c[:, None]),
            True, chosen)
        nxt = jnp.take_along_axis(parent, cur_c[:, None], axis=1)[:, 0]
        cur = jnp.where(ok, nxt, -1)
        return chosen, cur

    chosen, _ = jax.lax.fori_loop(
        0, C, walk, (chosen, jnp.where(any_valid, end, -1)))
    # scatter back to original candidate order
    inv = jnp.zeros((B, C), jnp.int32)
    inv = jnp.put_along_axis(
        inv, order, jnp.broadcast_to(jnp.arange(C)[None, :], (B, C)),
        axis=1, inplace=False)
    chosen_orig = jnp.take_along_axis(chosen, inv, axis=1)
    return chosen_orig & valid


def select_alignments(qstart, qend, score, valid, *, ol_cost=2,
                      max_overlap=50_000, bias=None, min_score=21):
    """Returns (B, C) bool mask of selected candidates.

    ``bias``: optional (B, C) multiplier applied to scores for selection
    only (region bias, reference main.py:63 + README.rst:195-197).
    """
    from fslr_tpu.ops.ssw import pad_rows_pow2

    score = jnp.asarray(score, jnp.float32)
    s_sel = score if bias is None else score * jnp.asarray(bias, jnp.float32)
    valid = jnp.asarray(valid) & (score >= min_score)
    qstart = jnp.asarray(qstart)
    qend = jnp.asarray(qend)
    # shape discipline: pad rows/slots to powers of two so varying batch
    # sizes reuse compiled shapes
    B0, C0 = qstart.shape
    B = pad_rows_pow2(B0, 8)
    C = pad_rows_pow2(C0, 8)
    if (B, C) != (B0, C0):
        pads = [(0, B - B0), (0, C - C0)]
        qstart = jnp.pad(qstart, pads)
        qend = jnp.pad(qend, pads)
        s_sel = jnp.pad(s_sel, pads, constant_values=-1e30)
        valid = jnp.pad(valid, pads)
    from fslr_tpu import instrument
    instrument.add_cells(B0 * C0 * C0, 'select')
    out = _select_impl(qstart, qend, s_sel, valid, float(ol_cost),
                       float(max_overlap))
    return out[:B0, :C0]
