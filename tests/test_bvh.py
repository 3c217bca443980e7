"""BVH builder property tests — ports the reference's builder assert battery
(SURVEY.md 4.1: BVHBuilders.h:163-164, 292-307, BottomLevelBVH.cpp:137) plus
traversal-vs-brute-force equivalence."""

import numpy as np

from raytracer_tpu.accel.bvh import build_bvh, triangle_bounds
from raytracer_tpu.scene import meshgen


def _random_boxes(n, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-10, 10, size=(n, 3))
    e = rng.uniform(0.01, 1.0, size=(n, 3))
    return c - e, c + e


def _validate(bvh, n_prims, force_split=False):
    m = bvh.node_min.shape[0]
    # node count bound (BottomLevelBVH.cpp:137)
    assert m <= 2 * max(n_prims, 2)

    # every primitive appears exactly once across leaves, covering [0, n)
    seen = np.zeros(n_prims, int)
    stack = [0]
    while stack:
        i = stack.pop()
        cnt = bvh.node_count[i]
        if cnt > 0:
            first = bvh.node_left[i]
            ids = bvh.prim_order[first : first + cnt]
            for t in ids:
                seen[t] += 1
        else:
            left = bvh.node_left[i]
            # child AABBs are contained in the parent's
            for ch in (left, left + 1):
                assert np.all(bvh.node_min[ch] >= bvh.node_min[i] - 1e-3)
                assert np.all(bvh.node_max[ch] <= bvh.node_max[i] + 1e-3)
            stack += [left, left + 1]
    assert np.all(seen == 1), "partition must be a permutation"
    if force_split:
        leaf_counts = bvh.node_count[bvh.node_count > 0]
        assert np.all(leaf_counts == 1)


def test_build_small():
    mins, maxs = _random_boxes(7)
    bvh = build_bvh(mins, maxs)
    _validate(bvh, 7)


def test_build_larger():
    mins, maxs = _random_boxes(500, seed=1)
    bvh = build_bvh(mins, maxs)
    _validate(bvh, 500)


def test_build_single_and_pair():
    mins, maxs = _random_boxes(1)
    _validate(build_bvh(mins, maxs), 1)
    mins, maxs = _random_boxes(2)
    _validate(build_bvh(mins, maxs), 2)


def test_force_split_singleton_leaves():
    mins, maxs = _random_boxes(33, seed=2)
    bvh = build_bvh(mins, maxs, force_split=True)
    _validate(bvh, 33, force_split=True)


def test_duplicate_centroids():
    """Equal-coordinate tie-break (BVHPartitions.h:38-56): identical boxes must still
    form a valid permutation."""
    mins = np.zeros((16, 3))
    maxs = np.ones((16, 3))
    bvh = build_bvh(mins, maxs)
    _validate(bvh, 16)


def test_leaf_bounds_contain_their_primitives():
    mesh = meshgen.icosphere(1.0, 2)
    mins, maxs, cents = triangle_bounds(
        mesh.p0.astype(np.float64), mesh.p1.astype(np.float64), mesh.p2.astype(np.float64)
    )
    bvh = build_bvh(mins, maxs, cents)
    _validate(bvh, mesh.triangle_count)
    stack = [0]
    while stack:
        i = stack.pop()
        cnt = bvh.node_count[i]
        if cnt > 0:
            first = bvh.node_left[i]
            ids = bvh.prim_order[first : first + cnt]
            assert np.all(mins[ids] >= bvh.node_min[i] - 1e-3)
            assert np.all(maxs[ids] <= bvh.node_max[i] + 1e-3)
        else:
            stack += [bvh.node_left[i], bvh.node_left[i] + 1]


def test_sah_quality_beats_median_ish():
    """SAH tree cost should be far below a linear scan for a big mesh."""
    mesh = meshgen.torus(1.0, 0.35, 32, 16)
    mins, maxs, cents = triangle_bounds(
        mesh.p0.astype(np.float64), mesh.p1.astype(np.float64), mesh.p2.astype(np.float64)
    )
    bvh = build_bvh(mins, maxs, cents)
    assert bvh.sah_cost() < 0.25 * mesh.triangle_count
