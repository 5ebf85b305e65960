"""Data-parallel union/find primitives (pointer jumping, hooking).

The reference's sequential union-find with path compression
(segmentation_graph.h:651-701) is replaced by batched parallel operations:
regions hook onto merge partners, and pointer jumping (path doubling)
resolves all chains to roots in O(log depth) gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pointer_jump(parent: jnp.ndarray, max_iters: int = 64) -> jnp.ndarray:
    """Resolve parent pointers to roots via path doubling.

    parent: (N,) int32 where parent[i] is i's parent (roots: parent[i]==i).
    Returns root[i] for every i.  Converges in ceil(log2(max chain)) steps;
    the loop exits early once stable.
    """

    def cond(state):
        it, p, changed = state
        return jnp.logical_and(changed, it < max_iters)

    def body(state):
        it, p, _ = state
        p2 = p[p]
        return it + 1, p2, jnp.any(p2 != p)

    _, resolved, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), parent, jnp.bool_(True)))
    return resolved


def break_two_cycles(parent: jnp.ndarray) -> jnp.ndarray:
    """Resolve mutual hooks a<->b by making the smaller index the root.

    After Boruvka-style hooking with globally consistent tie-breaking, the
    only cycles are mutual pairs; longer cycles cannot form.
    """
    idx = jnp.arange(parent.shape[0], dtype=parent.dtype)
    mutual = parent[parent] == idx
    return jnp.where(mutual & (parent > idx), idx, parent)


def hook_and_resolve(parent: jnp.ndarray) -> jnp.ndarray:
    """break_two_cycles + pointer_jump in one call."""
    return pointer_jump(break_two_cycles(parent))
