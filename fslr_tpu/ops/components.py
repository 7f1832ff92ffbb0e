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
    int32 labels where label = smallest node id in the component."""
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
