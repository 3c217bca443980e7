"""Primitive intersection op tests (Sphere.cpp, Plane.cpp, Moller-Trumbore,
AABB slab)."""

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.ops import intersect


def _rays(o, d):
    o = jnp.asarray(np.atleast_2d(o), jnp.float32)
    d = jnp.asarray(np.atleast_2d(d), jnp.float32)
    return intersect.make_rays(o, d)


def test_sphere_hit_distance_and_normal():
    rays = _rays([0, 0, 0], [0, 0, 1])
    hits = intersect.make_miss_hits(1)
    hits = intersect.sphere_trace(rays, hits, [0, 0, 5], 1.0, 7)
    assert bool(hits.hit[0])
    np.testing.assert_allclose(float(hits.t[0]), 4.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hits.normal[0]), [0, 0, -1], atol=1e-5)
    assert int(hits.material_id[0]) == 7


def test_sphere_t0_behind_uses_t1():
    """Ray origin inside the sphere -> exit hit (Sphere.cpp:36)."""
    rays = _rays([0, 0, 5], [0, 0, 1])
    hits = intersect.make_miss_hits(1)
    hits = intersect.sphere_trace(rays, hits, [0, 0, 5], 1.0, 1)
    assert bool(hits.hit[0])
    np.testing.assert_allclose(float(hits.t[0]), 1.0, atol=1e-5)


def test_sphere_miss():
    rays = _rays([0, 0, 0], [0, 1, 0])
    hits = intersect.make_miss_hits(1)
    hits = intersect.sphere_trace(rays, hits, [0, 0, 5], 1.0, 1)
    assert not bool(hits.hit[0])
    assert np.isinf(float(hits.t[0]))


def test_sphere_closer_hit_wins():
    rays = _rays([0, 0, 0], [0, 0, 1])
    hits = intersect.make_miss_hits(1)
    hits = intersect.sphere_trace(rays, hits, [0, 0, 10], 1.0, 1)
    hits = intersect.sphere_trace(rays, hits, [0, 0, 5], 1.0, 2)
    assert int(hits.material_id[0]) == 2
    # farther sphere must not overwrite
    hits = intersect.sphere_trace(rays, hits, [0, 0, 20], 1.0, 3)
    assert int(hits.material_id[0]) == 2


def test_sphere_uv_spherical():
    """uv from spherical coords (Sphere.cpp:60-61)."""
    rays = _rays([0, 5, 5], [0, -1, 0])  # hits the north pole
    hits = intersect.make_miss_hits(1)
    hits = intersect.sphere_trace(rays, hits, [0, 0, 5], 1.0, 1)
    np.testing.assert_allclose(float(hits.v[0]), 0.5, atol=1e-3)  # acos(1)/pi + .5


def test_sphere_any_hit():
    rays = _rays([0, 0, 0], [0, 0, 1])
    assert bool(intersect.sphere_intersect(rays, jnp.inf, [0, 0, 5], 1.0)[0])
    assert not bool(intersect.sphere_intersect(rays, 3.0, [0, 0, 5], 1.0)[0])
    assert not bool(intersect.sphere_intersect(rays, jnp.inf, [0, 5, 5], 1.0)[0])


def test_plane_hit():
    rays = _rays([0, 1, 0], [0, -1, 0.0])
    hits = intersect.make_miss_hits(1)
    hits = intersect.plane_trace(rays, hits, [0, 1, 0], 0.0, [1, 0, 0], [0, 0, 1], 4)
    assert bool(hits.hit[0])
    np.testing.assert_allclose(float(hits.t[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hits.point[0]), [0, 0, 0], atol=1e-6)


def test_plane_uv_projection():
    rays = _rays([2, 1, 3], [0, -1, 0.0])
    hits = intersect.make_miss_hits(1)
    hits = intersect.plane_trace(rays, hits, [0, 1, 0], 0.0, [1, 0, 0], [0, 0, 1], 4)
    np.testing.assert_allclose(float(hits.u[0]), 2.0, atol=1e-5)
    np.testing.assert_allclose(float(hits.v[0]), 3.0, atol=1e-5)


def test_triangle_hit_and_barycentrics():
    o = jnp.asarray([[0.25, 0.25, -1.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    p0 = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    e1 = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    e2 = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    mask, t, u, v = intersect.triangle_hit(o, d, p0, e1, e2, jnp.asarray([jnp.inf]))
    assert bool(mask[0])
    np.testing.assert_allclose(float(t[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(u[0]), 0.25, atol=1e-6)
    np.testing.assert_allclose(float(v[0]), 0.25, atol=1e-6)
    # outside the triangle
    o2 = jnp.asarray([[0.9, 0.9, -1.0]], jnp.float32)
    mask, *_ = intersect.triangle_hit(o2, d, p0, e1, e2, jnp.asarray([jnp.inf]))
    assert not bool(mask[0])


def test_aabb_slab():
    o = jnp.asarray([[0.0, 0.0, -5.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    inv = 1.0 / d
    bmin = jnp.asarray([[-1.0, -1.0, 0.0]], jnp.float32)
    bmax = jnp.asarray([[1.0, 1.0, 2.0]], jnp.float32)
    assert bool(intersect.aabb_hit(o, inv, bmin, bmax, jnp.asarray([jnp.inf]))[0])
    # behind the max distance
    assert not bool(intersect.aabb_hit(o, inv, bmin, bmax, jnp.asarray([4.0]))[0])
    # axis-parallel ray outside the slab (division by zero -> inf handling)
    o2 = jnp.asarray([[5.0, 0.0, -5.0]], jnp.float32)
    assert not bool(intersect.aabb_hit(o2, inv, bmin, bmax, jnp.asarray([jnp.inf]))[0])
