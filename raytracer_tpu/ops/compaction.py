"""Stable boolean stream compaction in O(N).

The wavefront machinery repeatedly needs "indices of the flagged lanes, in
order, padded to a fixed capacity" — for the traversal straggler ladder
(ops/traversal_wide._run_rounds) and the bounce-queue compaction
(render/renderer._compact).  A full ``argsort`` of the flags is O(N log N) in
sort passes on TPU; a prefix-sum + scatter produces the same stable selection
in two linear passes.

Unfilled slots (capacity > number of flagged lanes) all point at ONE unflagged
lane (``argmin(flags)`` = the first False, a cheap reduce).  Callers treat
selected-but-unflagged lanes as inert, so a repeated inert index is as good as
distinct ones.  CAVEAT: when every lane is flagged AND capacity > n, no inert
lane exists and the fallback (argmin of an all-True array = lane 0) DUPLICATES
an active lane; callers that sum over selected lanes must additionally mask
slots >= popcount(flags) inert (render/renderer._compact does).  For
capacity <= n with all lanes flagged, the prefix sum fills every slot and the
fallback is never used.
"""

from __future__ import annotations

import jax.numpy as jnp


def compact_indices(flags: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Return int32 [capacity] lane indices: flagged lanes first, stable order.

    Equivalent to ``jnp.argsort(~flags)[:capacity]`` (the stable two-key sort)
    wherever the caller only distinguishes flagged from unflagged selections.
    """
    n = flags.shape[0]
    pos = jnp.cumsum(flags.astype(jnp.int32)) - 1  # dest slot per flagged lane
    dest = jnp.where(flags, pos, capacity)  # out-of-range -> dropped
    fallback = jnp.argmin(flags).astype(jnp.int32)  # first unflagged lane
    buf = jnp.full((capacity,), fallback, jnp.int32)
    return buf.at[dest].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
