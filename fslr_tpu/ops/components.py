"""Connected components via label propagation + pointer jumping (device).

Replaces networkx.connected_components (/root/reference/fslr/cluster.py:230-234)
with an iterative min-label propagation over the edge list plus pointer
jumping, all under jit — the same edge arrays can be all-gathered across
hosts so multi-host cluster graphs merge with collectives (SURVEY.md
section 5.8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=('n_nodes',))
def connected_components(edges, n_nodes: int):
    """edges: (E, 2) int32 node ids (may be empty).  Returns (n_nodes,)
    int32 labels where label = smallest node id in the component.

    Callers should prefer :func:`connected_components_padded`, which pads
    node/edge counts to powers of two for shape reuse."""
    labels = jnp.arange(n_nodes, dtype=jnp.int32)
    if edges.shape[0] == 0:
        return labels
    e0 = edges[:, 0]
    e1 = edges[:, 1]

    def cond(state):
        labels, changed = state
        return changed

    def body(state):
        labels, _ = state
        lu = labels[e0]
        lv = labels[e1]
        m = jnp.minimum(lu, lv)
        new = labels.at[e0].min(m).at[e1].min(m)
        new = new[new]          # pointer jump
        new = new[new]
        changed = jnp.any(new != labels)
        return new, changed

    labels, _ = jax.lax.while_loop(cond, body,
                                   (labels, jnp.asarray(True)))
    return labels


def connected_components_padded(edges, n_nodes: int):
    """Pow2-padded wrapper: extra nodes are isolated, extra edges are
    self-loops on node 0 (no effect on labels)."""
    import numpy as np

    from fslr_tpu.ops.ssw import pad_rows_pow2

    npad = pad_rows_pow2(max(n_nodes, 1), 8)
    e = np.asarray(edges, dtype=np.int32).reshape(-1, 2)
    epad = pad_rows_pow2(max(len(e), 1), 8)
    if epad != len(e):
        e = np.concatenate([e, np.zeros((epad - len(e), 2), np.int32)])
    return connected_components(jnp.asarray(e), npad)[:n_nodes]
