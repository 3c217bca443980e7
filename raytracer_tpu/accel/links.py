"""Threaded-BVH link computation: per-octant near/skip links for stackless traversal.

The reference traverses with an explicit per-ray stack (BottomLevelBVH.cpp:348-396).
On TPU, per-ray stacks make the wavefront state huge and every iteration scatter into
it; worse, a data-dependent `while` costs a host round-trip per iteration on the
tunneled runtime.  The TPU-native alternative is a *threaded* BVH: for each of the 8
ray-direction octants, precompute for every node

  - near[n]: the child visited first (ordered descent by split axis and direction
    sign — the per-ray generalization of BVHNode::should_visit_left_first,
    BVHNode.h:30-40)
  - skip[n]: the node to jump to when n's box is missed or its subtree is finished

so traversal needs NO stack: state per ray is a single node pointer.  skip(near(n)) is
the far child, skip(far(n)) = skip(n), skip(root) = a sentinel.

Links are computed once per BLAS (host, cached) and per frame for the tiny TLAS.
"""

from __future__ import annotations

import numpy as np

# sentinel skip targets
DONE = -1  # traversal finished (TLAS root exit)
BLAS_EXIT = -2  # finished a BLAS subtree: resume the saved TLAS continuation


def compute_links(
    node_left: np.ndarray,
    node_count: np.ndarray,
    node_axis: np.ndarray,
    exit_sentinel: int = DONE,
) -> np.ndarray:
    """Compute [8, M, 2] int32 (near, skip) link tables for one BVH.

    Octant o encodes direction signs: bit a set <=> direction[a] > 0.
    """
    m = node_left.shape[0]
    internal = node_count == 0
    internal[1] = False  # padding node
    left = node_left.astype(np.int64)
    right = left + 1
    axis = node_axis.astype(np.int64)

    links = np.zeros((8, m, 2), np.int32)
    int_idx = np.arange(m)[internal]
    for o in range(8):
        positive = np.array([bool((o >> a) & 1) for a in range(3)])
        go_left_first = positive[axis]  # per node
        near = np.where(go_left_first, left, right)
        far = np.where(go_left_first, right, left)

        # skip[near(n)] = far(n) is direct; skip[far(n)] = skip(n) chains up
        # through consecutive far-children — resolve by pointer doubling.
        ptr = np.arange(m)  # resolved nodes point at themselves
        value = np.full(m, exit_sentinel, np.int64)  # value at resolved nodes
        value[near[int_idx]] = far[int_idx]
        ptr[far[int_idx]] = int_idx  # far children defer to their parent
        # near children and the root are resolved; far-of-far chains have length
        # <= tree depth, so log2(depth) doubling steps suffice
        for _ in range(int(np.ceil(np.log2(max(m, 2)))) + 1):
            nxt = ptr[ptr]
            if np.array_equal(nxt, ptr):
                break
            ptr = nxt
        skip = value[ptr]

        links[o, :, 0] = np.where(internal, near, 0)
        links[o, :, 1] = skip
    return links
