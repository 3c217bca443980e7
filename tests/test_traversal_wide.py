"""Wide (8-ary) BVH traversal correctness: collapse invariants, equivalence with
brute force over every (instance, triangle) pair, and agreement with the binary
threaded kernel (the same regression role the reference's heatmap plays,
SURVEY.md 4.3)."""

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.accel import wide as wide_mod
from raytracer_tpu.accel.blas import build_blas
from raytracer_tpu.config import MeshAccelerator, RenderConfig
from raytracer_tpu.ops import traversal, traversal_wide
from raytracer_tpu.scene import meshgen
from raytracer_tpu.scene.description import SceneDescription
from raytracer_tpu.scene.device import pack_scene

from test_traversal import _brute_force, _random_rays, _scene_with


def _trace_wide(scene, o, d, cfg=None):
    cfg = cfg or RenderConfig()
    bvh = traversal_wide.build_scene_bvh(scene)
    n = o.shape[0]
    return traversal_wide.trace_closest(
        bvh,
        jnp.asarray(o, jnp.float32),
        jnp.asarray(d, jnp.float32),
        jnp.full((n,), jnp.inf, jnp.float32),
        jnp.ones((n,), bool),
        cfg,
    )


# ---------------------------------------------------------------------------
# Collapse invariants
# ---------------------------------------------------------------------------


def test_collapse_covers_all_leaves_once():
    """Every 8-aligned leaf record of the padded binary BVH appears exactly once
    among the wide leaf children, and child boxes equal the binary nodes'."""
    mesh = meshgen.icosphere(1.0, 3)
    b = build_blas(mesh, MeshAccelerator.BVH, cache_dir=None)
    w = b.wide
    leaf_mask = w.child_kind == wide_mod.KIND_LEAF
    leaf_payloads = np.sort(w.child_payload[leaf_mask])
    # the binary leaves after 8-padding partition [0, T) into 8-sized records
    bin_leaves = b.node_count > 0
    expected = np.sort(b.node_left[bin_leaves] // 8)
    np.testing.assert_array_equal(leaf_payloads, expected)
    # internal children reference each wide node exactly once (a tree)
    int_mask = w.child_kind == wide_mod.KIND_INTERNAL
    refs = np.sort(w.child_payload[int_mask])
    np.testing.assert_array_equal(refs, np.arange(1, w.n_nodes))
    # empty slots carry the always-miss point box
    empty = w.child_kind == wide_mod.KIND_EMPTY
    assert np.all(w.child_min[empty] == 1.0e30)


def test_octant_orders_are_permutations():
    mesh = meshgen.torus(1.0, 0.4, 12, 8)
    b = build_blas(mesh, MeshAccelerator.BVH, cache_dir=None)
    w = b.wide
    for o in range(8):
        sorted_slots = np.sort(w.order[o], axis=1)
        np.testing.assert_array_equal(
            sorted_slots, np.broadcast_to(np.arange(8, dtype=np.int8), (w.n_nodes, 8))
        )


def test_octant_order_sorts_along_diagonal():
    """Children must be visited ascending along the octant diagonal."""
    mesh = meshgen.icosphere(1.0, 2)
    b = build_blas(mesh, MeshAccelerator.BVH, cache_dir=None)
    w = b.wide
    centroid = 0.5 * (w.child_min + w.child_max)
    for o in (0, 5, 7):
        sign = np.array([1.0 if (o >> a) & 1 else -1.0 for a in range(3)])
        key = (centroid * sign).sum(-1)
        # finite sentinel: inf - inf = nan would poison the monotonicity check
        key = np.where(w.child_kind == wide_mod.KIND_EMPTY, 1.0e30, key)
        rows = np.arange(w.n_nodes)[:, None]
        picked = key[rows, w.order[o].astype(np.int64)]
        assert np.all(np.diff(picked, axis=1) >= -1e-6)


# ---------------------------------------------------------------------------
# Traversal equivalence
# ---------------------------------------------------------------------------


def test_wide_single_instance_matches_brute_force():
    scene = _scene_with([(meshgen.icosphere(1.0, 2), (0.0, 0.0, 0.0))])
    o, d = _random_rays(256, 3)
    res = _trace_wide(scene, o, d)
    hit_bf, t_bf = _brute_force(scene, o, d)
    hit = np.asarray(res.tri) >= 0
    assert hit_bf.sum() > 0.1 * len(o)
    assert int(res.incomplete) == 0
    np.testing.assert_array_equal(hit, hit_bf)
    np.testing.assert_allclose(np.asarray(res.t)[hit], t_bf[hit], rtol=1e-4)


def test_wide_multi_instance_shared_blas_matches_brute_force():
    torus = meshgen.torus(1.0, 0.3, 16, 8)
    box = meshgen.box((1.0, 2.0, 1.0))
    desc = SceneDescription()
    desc.register_blas("torus", build_blas(torus, MeshAccelerator.BVH, cache_dir=None))
    desc.register_blas("box", build_blas(box, MeshAccelerator.BVH, cache_dir=None))
    desc.add_instance("torus", (-2.0, 0.0, 0.0))
    i2 = desc.add_instance("torus", (2.0, 0.5, 0.0))
    from raytracer_tpu.core import quaternion as quat

    i2.transform.rotation = quat.axis_angle([0.0, 0.0, 1.0], 0.7)
    desc.add_instance("box", (0.0, -1.5, 0.0))
    scene = pack_scene(desc, 8, 8)

    o, d = _random_rays(512, 4, origin_box=6.0, target_box=3.0)
    res = _trace_wide(scene, o, d)
    hit_bf, t_bf = _brute_force(scene, o, d)
    hit = np.asarray(res.tri) >= 0
    assert hit_bf.sum() > 0.1 * len(o)
    np.testing.assert_array_equal(hit, hit_bf)
    np.testing.assert_allclose(np.asarray(res.t)[hit], t_bf[hit], rtol=1e-4)


def test_wide_many_instances_tlas_collapse():
    """> 8 instances forces a real (binary -> wide) TLAS collapse."""
    rng = np.random.default_rng(7)
    mesh = meshgen.icosphere(0.5, 1)
    desc = SceneDescription()
    desc.register_blas("s", build_blas(mesh, MeshAccelerator.BVH, cache_dir=None))
    for i in range(13):
        desc.add_instance("s", tuple(rng.uniform(-4, 4, 3)))
    scene = pack_scene(desc, 8, 8)
    o, d = _random_rays(512, 11, origin_box=8.0, target_box=4.0)
    res = _trace_wide(scene, o, d)
    hit_bf, t_bf = _brute_force(scene, o, d)
    hit = np.asarray(res.tri) >= 0
    assert hit_bf.sum() > 0.05 * len(o)
    np.testing.assert_array_equal(hit, hit_bf)
    np.testing.assert_allclose(np.asarray(res.t)[hit], t_bf[hit], rtol=1e-4)


def test_wide_agrees_with_binary_kernel_per_ray():
    scene = _scene_with(
        [
            (meshgen.torus(1.2, 0.35, 14, 10), (0.0, 0.0, 0.0)),
            (meshgen.box((0.8, 0.8, 0.8)), (1.5, 0.3, -0.5)),
        ]
    )
    o, d = _random_rays(1024, 9)
    cfg = RenderConfig()
    res_w = _trace_wide(scene, o, d, cfg)
    bvh_b = traversal.build_scene_bvh(scene)
    n = o.shape[0]
    res_b = traversal.trace_closest(
        bvh_b,
        jnp.asarray(o, jnp.float32),
        jnp.asarray(d, jnp.float32),
        jnp.full((n,), jnp.inf, jnp.float32),
        jnp.ones((n,), bool),
        cfg,
    )
    np.testing.assert_array_equal(
        np.asarray(res_w.tri) >= 0, np.asarray(res_b.tri) >= 0
    )
    hit = np.asarray(res_w.tri) >= 0
    np.testing.assert_allclose(
        np.asarray(res_w.t)[hit], np.asarray(res_b.t)[hit], rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(res_w.inst), np.asarray(res_b.inst))


def test_wide_any_hit_matches_closest_hit_mask():
    scene = _scene_with([(meshgen.icosphere(1.0, 2), (0.0, 0.0, 0.0))])
    o, d = _random_rays(256, 5)
    cfg = RenderConfig()
    bvh = traversal_wide.build_scene_bvh(scene)
    n = o.shape[0]
    t_max = jnp.full((n,), jnp.inf, jnp.float32)
    active = jnp.ones((n,), bool)
    res = traversal_wide.trace_closest(
        bvh, jnp.asarray(o), jnp.asarray(d), t_max, active, cfg
    )
    blocked, inc = traversal_wide.trace_any(
        bvh, jnp.asarray(o), jnp.asarray(d), t_max, active, cfg
    )
    assert int(inc) == 0
    np.testing.assert_array_equal(np.asarray(blocked), np.asarray(res.tri) >= 0)


def test_wide_inactive_rays_report_miss():
    scene = _scene_with([(meshgen.icosphere(1.0, 1), (0.0, 0.0, 0.0))])
    o = np.tile(np.array([[0.11, 0.07, -5.0]], np.float32), (4, 1))
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (4, 1))
    bvh = traversal_wide.build_scene_bvh(scene)
    cfg = RenderConfig()
    active = jnp.asarray([True, False, True, False])
    res = traversal_wide.trace_closest(
        bvh, jnp.asarray(o), jnp.asarray(d), jnp.full((4,), jnp.inf), active, cfg
    )
    tri = np.asarray(res.tri)
    assert tri[0] >= 0 and tri[2] >= 0
    assert tri[1] == -1 and tri[3] == -1


def test_wide_shallow_stack_reports_incomplete_not_wrong():
    """With a pathologically small stack the kernel must flag truncation."""
    scene = _scene_with([(meshgen.icosphere(1.0, 3), (0.0, 0.0, 0.0))])
    o, d = _random_rays(512, 13)
    cfg = RenderConfig(wide_stack_size=1)
    res = _trace_wide(scene, o, d, cfg)
    assert int(res.incomplete) > 0


def test_wide_any_hit_starvation_is_counted():
    """A compacted ladder whose round-0 capacity is below the active fraction
    must REPORT the starved lanes as incomplete, not silently leak light
    (PERF.md round-2 guard)."""
    scene = _scene_with([(meshgen.icosphere(1.0, 2), (0.0, 0.0, 0.0))])
    o, d = _random_rays(512, 7)
    bvh = traversal_wide.build_scene_bvh(scene)
    n = o.shape[0]
    t_max = jnp.full((n,), jnp.inf, jnp.float32)
    active = jnp.ones((n,), bool)
    # capacity 1/4 of the wavefront, 1 iteration: most lanes can't finish
    cfg = RenderConfig(wide_rounds_any=((0.25, 1),))
    _, inc = traversal_wide.trace_any(
        bvh, jnp.asarray(o), jnp.asarray(d), t_max, active, cfg
    )
    assert int(inc) > 0
    # generous ladder on the same wavefront finishes everything
    cfg_ok = RenderConfig(wide_rounds_any=((1.0, 256),))
    _, inc_ok = traversal_wide.trace_any(
        bvh, jnp.asarray(o), jnp.asarray(d), t_max, active, cfg_ok
    )
    assert int(inc_ok) == 0


def test_compact_indices_matches_argsort():
    """O(N) cumsum-scatter compaction == stable argsort selection on the flagged
    prefix; overflow slots point at an unflagged lane (inert by contract)."""
    import numpy as np
    from raytracer_tpu.ops import compaction

    rng = np.random.default_rng(7)
    for n, cap in [(257, 64), (1024, 1024), (100, 200), (512, 91)]:
        flags = jnp.asarray(rng.uniform(size=n) < 0.3)
        got = np.asarray(compaction.compact_indices(flags, cap))
        ref = np.argsort(~np.asarray(flags), kind="stable")[:cap]
        k = min(int(np.asarray(flags).sum()), cap)
        np.testing.assert_array_equal(got[:k], ref[:k])  # flagged prefix, stable
        assert not np.asarray(flags)[got[k:]].any()  # overflow slots unflagged
    # all-flagged: every slot filled, no fallback used
    flags = jnp.ones((128,), bool)
    np.testing.assert_array_equal(
        np.asarray(compaction.compact_indices(flags, 64)), np.arange(64)
    )
    # all-flagged with capacity > n: no inert lane exists, so overflow slots
    # DUPLICATE lane 0 (documented caveat); _compact masks them by slot index
    got = np.asarray(compaction.compact_indices(flags, 200))
    np.testing.assert_array_equal(got[:128], np.arange(128))
    np.testing.assert_array_equal(got[128:], np.zeros(72, np.int32))


def test_compact_all_active_overflow_never_double_counts():
    """renderer._compact with every candidate active and capacity > candidate
    count: the duplicated fallback lanes must come back inactive (ADVICE.md
    round 2 — a duplicated ray would double-count radiance/gradients)."""
    import numpy as np
    from raytracer_tpu.render.renderer import _compact

    n = 48
    cand = dict(
        active=jnp.ones((n,), bool),
        weight=jnp.arange(n, dtype=jnp.float32)[:, None] * jnp.ones((1, 3)),
        pixel=jnp.arange(n, dtype=jnp.int32),
    )
    out, dropped = _compact(cand, 64)
    assert int(dropped) == 0
    active = np.asarray(out["active"])
    assert active[:n].all() and not active[n:].any()
    # weighted radiance over active lanes matches the un-compacted sum exactly
    w = np.asarray(out["weight"])[active].sum()
    assert w == np.asarray(cand["weight"]).sum()
