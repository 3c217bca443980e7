"""Native C++ (S)BVH builder tests: structural invariants + traversal equivalence.

Ports the reference's SBVH assert battery (BVHBuilders.h:163-170, 292-307;
SURVEY.md 4.1) and validates end-to-end against brute force — spatial splits
duplicate straddling triangles, so the partition is a covering, not a permutation.
"""

import numpy as np
import pytest

from raytracer_tpu.accel import native
from raytracer_tpu.accel.sbvh import build_sbvh
from raytracer_tpu.scene import meshgen

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native builder unavailable"
)


def _walk(bvh):
    stack = [0]
    leaves = []
    while stack:
        i = stack.pop()
        if bvh.node_count[i] > 0:
            leaves.append(i)
        else:
            left = bvh.node_left[i]
            for ch in (left, left + 1):
                assert np.all(bvh.node_min[ch] >= bvh.node_min[i] - 1e-2)
                assert np.all(bvh.node_max[ch] <= bvh.node_max[i] + 1e-2)
            stack += [left, left + 1]
    return leaves


def _validate_cover(bvh, n_tris):
    leaves = _walk(bvh)
    seen = np.zeros(n_tris, int)
    total_refs = 0
    for i in leaves:
        first = bvh.node_left[i]
        cnt = bvh.node_count[i]
        ids = bvh.prim_order[first : first + cnt]
        total_refs += cnt
        for t in ids:
            seen[t] += 1
    assert total_refs == len(bvh.prim_order)
    assert np.all(seen >= 1), "every triangle must be referenced at least once"
    # node-count bound: node_count <= 2 * reference count (BottomLevelBVH.cpp:137)
    assert bvh.node_min.shape[0] <= 2 * max(len(bvh.prim_order), 2)


def test_native_sah_matches_numpy_semantics():
    mesh = meshgen.torus(1.0, 0.35, 24, 12)
    out = native.build_native(mesh.p0, mesh.p1, mesh.p2, spatial=False)
    assert out is not None
    _validate_cover(out, mesh.triangle_count)
    assert len(out.prim_order) == mesh.triangle_count
    assert np.all(np.sort(out.prim_order) == np.arange(mesh.triangle_count))


def test_native_sbvh_valid_cover():
    mesh = meshgen.sponza_like(8_000)
    bvh = build_sbvh(
        mesh.p0.astype(np.float64), mesh.p1.astype(np.float64),
        mesh.p2.astype(np.float64),
    )
    _validate_cover(bvh, mesh.triangle_count)


def test_sbvh_traversal_matches_brute_force():
    import jax.numpy as jnp

    from raytracer_tpu.accel.blas import build_blas
    from raytracer_tpu.config import MeshAccelerator, RenderConfig
    from raytracer_tpu.ops import traversal
    from raytracer_tpu.scene.description import SceneDescription
    from raytracer_tpu.scene.device import pack_scene

    mesh = meshgen.torus(1.0, 0.4, 20, 10)
    desc = SceneDescription()
    desc.register_blas("m", build_blas(mesh, MeshAccelerator.SBVH, cache_dir=None))
    desc.add_instance("m", (0.0, 0.0, 0.0))
    scene = pack_scene(desc, 8, 8)

    rng = np.random.default_rng(9)
    n = 512
    o = rng.uniform(-4, 4, size=(n, 3)).astype(np.float32)
    tgt = rng.uniform(-1.5, 1.5, size=(n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    cfg = RenderConfig(traversal_chunk=1 << 12)
    bvh = traversal.build_scene_bvh(scene)
    res = traversal.trace_closest(
        bvh, jnp.asarray(o), jnp.asarray(d),
        jnp.full((n,), jnp.inf, jnp.float32), jnp.ones((n,), bool), cfg,
    )

    # brute force against the ORIGINAL triangle soup
    best_t = np.full(n, np.inf)
    hit = np.zeros(n, bool)
    for k in range(mesh.triangle_count):
        e1 = mesh.p1[k] - mesh.p0[k]
        e2 = mesh.p2[k] - mesh.p0[k]
        h = np.cross(d, e2)
        a = np.sum(e1 * h, axis=-1)
        with np.errstate(divide="ignore", invalid="ignore"):
            f = 1.0 / a
            s = o - mesh.p0[k]
            u = f * np.sum(s * h, axis=-1)
            q = np.cross(s, e1)
            v = f * np.sum(d * q, axis=-1)
            t = f * np.sum(e2[None] * q, axis=-1)
            m = (u > 0) & (u < 1) & (v > 0) & (u + v < 1) & (t > 0.005) & (t < best_t)
        best_t = np.where(m, t, best_t)
        hit |= m

    got_hit = np.asarray(res.tri) >= 0
    assert hit.sum() > 0.2 * n
    np.testing.assert_array_equal(got_hit, hit)
    np.testing.assert_allclose(np.asarray(res.t)[hit], best_t[hit], rtol=1e-3)


def test_sbvh_quality_on_thin_diagonal_geometry():
    """Spatial splits should beat plain SAH on geometry with large straddling
    triangles (the scenario SBVH exists for)."""
    rng = np.random.default_rng(3)
    n = 2000
    # long thin diagonal triangles
    base = rng.uniform(-10, 10, size=(n, 3))
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    p0 = base
    p1 = base + dirs * 6.0
    p2 = base + dirs * 6.0 + rng.normal(scale=0.05, size=(n, 3))
    sbvh = native.build_native(p0, p1, p2, spatial=True)
    plain = native.build_native(p0, p1, p2, spatial=False)
    assert sbvh is not None and plain is not None
    assert len(sbvh.prim_order) > n, "spatial splits should duplicate straddlers"
    assert sbvh.sah_cost() < plain.sah_cost()
