"""Core math layer tests: vector ops, quaternions, matrices, spline, AABB.

Ports the reference's implicit invariants (Math.h, Quaternion.h, Matrix4.h, Spline.h,
AABB.h) as explicit property tests — the reference has no test suite (SURVEY.md 4).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.core import aabb, matrix, quaternion as quat, spline, vecmath as vm


def test_reflect_preserves_length_and_angle():
    rng = np.random.default_rng(0)
    v = vm.normalize(jnp.asarray(rng.normal(size=(64, 3)), jnp.float32))
    n = vm.normalize(jnp.asarray(rng.normal(size=(64, 3)), jnp.float32))
    r = vm.reflect(v, n)
    np.testing.assert_allclose(vm.length(r), 1.0, atol=1e-5)
    # angle of incidence == angle of reflection
    np.testing.assert_allclose(vm.dot(v, n), -vm.dot(r, n), atol=1e-5)


def test_refract_obeys_snells_law():
    """Debug::test_refraction (Debug.h:32-54): n1 sin(theta1) == n2 sin(theta2)."""
    rng = np.random.default_rng(1)
    d = vm.normalize(jnp.asarray(rng.normal(size=(128, 3)), jnp.float32))
    n = vm.normalize(jnp.asarray(rng.normal(size=(128, 3)), jnp.float32))
    # orient n against d (smallest angle), as Math.h:33 requires
    n = jnp.where(vm.dot(d, n)[:, None] > 0, -n, n)
    n1 = jnp.full((128,), 1.0, jnp.float32)
    n2 = jnp.full((128,), 1.5, jnp.float32)
    cos_theta = -vm.dot(d, n)
    eta = n1 / n2
    k = 1.0 - eta * eta * (1.0 - cos_theta * cos_theta)
    r = vm.refract(d, n, eta, cos_theta, k)
    valid = np.asarray(k >= 0.0)
    sin1 = np.sqrt(np.maximum(1.0 - np.asarray(cos_theta) ** 2, 0.0))
    cos2 = -np.asarray(vm.dot(r, n))
    sin2 = np.sqrt(np.maximum(1.0 - cos2**2, 0.0))
    np.testing.assert_allclose(
        (np.asarray(n1) * sin1)[valid], (np.asarray(n2) * sin2)[valid], atol=1e-4
    )
    # refracted vector stays normalized
    np.testing.assert_allclose(np.asarray(vm.length(r))[valid], 1.0, atol=1e-4)


def test_gamma_roundtrip():
    x = jnp.linspace(0.0, 1.0, 101)
    np.testing.assert_allclose(
        np.asarray(vm.gamma_to_linear(vm.linear_to_gamma(x))), np.asarray(x), atol=1e-5
    )


def test_pow2_128():
    x = jnp.asarray([0.8, 0.9, 1.0, 1.1])
    np.testing.assert_allclose(
        np.asarray(vm.pow2_128(x)), np.asarray(x, np.float64) ** 128, rtol=1e-3
    )


def test_quaternion_rotation_matches_matrix():
    rng = np.random.default_rng(2)
    for _ in range(10):
        q = quat.normalize(rng.normal(size=4))
        v = rng.normal(size=3)
        np.testing.assert_allclose(quat.rotate(q, v), quat.to_matrix3(q) @ v, atol=1e-12)


def test_quaternion_axis_angle_composition():
    a = quat.axis_angle([0, 1, 0], 0.3)
    b = quat.axis_angle([0, 1, 0], 0.5)
    ab = quat.multiply(a, b)
    c = quat.axis_angle([0, 1, 0], 0.8)
    np.testing.assert_allclose(ab, c, atol=1e-12)


def test_look_rotation_points_forward():
    rng = np.random.default_rng(3)
    for _ in range(20):
        fwd = rng.normal(size=3)
        fwd /= np.linalg.norm(fwd)
        q = quat.look_rotation(fwd, [0, 1, 0])
        np.testing.assert_allclose(quat.rotate(q, [0, 0, 1]), fwd, atol=1e-10)


def test_matrix_compose_invert_roundtrip():
    rng = np.random.default_rng(4)
    q = quat.normalize(rng.normal(size=4))
    m = matrix.compose([1.0, -2.0, 3.0], q)
    inv = matrix.invert(m)
    p = rng.normal(size=(5, 3))
    np.testing.assert_allclose(
        matrix.transform_position(inv, matrix.transform_position(m, p)), p, atol=1e-10
    )


def test_jnp_transform_matches_numpy():
    rng = np.random.default_rng(5)
    q = quat.normalize(rng.normal(size=4))
    m = matrix.compose([0.4, 1.2, -0.7], q)
    m34 = jnp.asarray(matrix.to_rows34(m))[None]
    p = rng.normal(size=(1, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(matrix.jnp_transform_position(m34, jnp.asarray(p)))[0],
        matrix.transform_position(m, p[0]),
        atol=1e-5,
    )


def test_spline_interpolates_keyframes():
    times = [0.0, 1.0, 2.0, 3.0, 4.0]
    values = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], [0, 0, 0]], float)
    s = spline.CatmullRomSpline(times, values)
    # sampling exactly at a keyframe time returns (approximately) its value
    p = s.get_point(1.0)
    np.testing.assert_allclose(p, values[1], atol=1e-9)


def test_aabb_transform_contains_transformed_points():
    rng = np.random.default_rng(6)
    box = np.array([[-1.0, -2.0, -0.5], [1.0, 0.5, 2.0]])
    q = quat.normalize(rng.normal(size=4))
    m = matrix.compose([3.0, 1.0, -2.0], q)
    tbox = aabb.transform(box, m)
    pts = rng.uniform(box[0], box[1], size=(200, 3))
    tp = matrix.transform_position(m, pts)
    assert np.all(tp >= tbox[0] - 1e-9) and np.all(tp <= tbox[1] + 1e-9)


def test_aabb_surface_area_and_overlap():
    b1 = np.array([[0.0, 0.0, 0.0], [2.0, 1.0, 1.0]])
    assert aabb.surface_area(b1) == pytest.approx(2 * (2 + 1 + 2))
    b2 = np.array([[1.0, 0.5, 0.25], [3.0, 2.0, 2.0]])
    ov = aabb.overlap(b1, b2)
    np.testing.assert_allclose(ov, [[1.0, 0.5, 0.25], [2.0, 1.0, 1.0]])
    disjoint = aabb.overlap(b1, np.array([[5.0, 5.0, 5.0], [6.0, 6.0, 6.0]]))
    assert aabb.is_empty(disjoint)
