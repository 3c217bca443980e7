"""Differentiability tests: autodiff pixel gradients vs central finite differences
(the north-star check — BASELINE.json: 'pixel-grad allclose vs reference' realized as
finite differences of our own forward, which the forward-parity tests tie to the
reference's math)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.config import RenderConfig, TextureSampleMode
from raytracer_tpu.diff.train import apply_params
from raytracer_tpu.render import renderer
from raytracer_tpu.scene.description import PointLight, SceneDescription
from raytracer_tpu.scene.device import pack_scene

CFG = RenderConfig(width=24, height=24, num_bounces=1, queue_factor=2.0,
                   texture_sample_mode=TextureSampleMode.BILINEAR,
                   traversal_chunk=1 << 10)


def _scene():
    desc = SceneDescription(camera_fov_deg=90.0)
    desc.set_sky(np.full((16, 3), 0.5, np.float32), 4)
    s = desc.add_sphere((0.0, 0.5, 5.0), 1.0)
    desc.material(s).diffuse = np.array([0.6, 0.3, 0.2])
    desc.material(s).reflection = np.array([0.2, 0.2, 0.2])
    p = desc.add_plane((0.0, -1.0, 0.0))
    desc.material(p).diffuse = np.array([0.5, 0.5, 0.5])
    desc.point_lights.append(
        PointLight(np.array([20.0, 18.0, 15.0]), np.array([2.0, 5.0, 2.0]))
    )
    desc.camera.position = np.array([0.0, 0.5, 0.0])
    return pack_scene(desc, CFG.width, CFG.height)


def _loss(scene, field, value):
    scene = apply_params(scene, {field: value})
    img, _ = renderer.render_with_stats(scene, CFG)
    # weighted sum = a generic scalar functional of the image
    w = jnp.sin(jnp.arange(img.size, dtype=jnp.float32)).reshape(img.shape)
    return jnp.sum(img * w)


def _check_grad(field, rtol=0.08, eps=3e-3, support_only=False):
    scene = _scene()
    base = getattr(scene, field).astype(jnp.float32)
    grad = jax.grad(lambda v: _loss(scene, field, v))(base)
    grad = np.asarray(grad, np.float64)

    rng = np.random.default_rng(0)
    # probe along 3 random directions with central differences
    for k in range(3):
        direction = rng.normal(size=base.shape)
        if support_only:
            # masked wavefronts only spawn children where the coefficient is nonzero
            # (Raytracer.cpp:246-249); perturbing a zero row one-sidedly activates it,
            # so probe only within the existing support
            direction = direction * (np.abs(np.asarray(base)) > 0)
        direction /= np.linalg.norm(direction)
        d = jnp.asarray(direction, jnp.float32)
        lp = float(_loss(scene, field, base + eps * d))
        lm = float(_loss(scene, field, base - eps * d))
        fd = (lp - lm) / (2 * eps)
        ad = float(np.sum(grad * direction))
        assert np.isfinite(fd) and np.isfinite(ad)
        np.testing.assert_allclose(
            ad, fd, rtol=rtol, atol=2e-2 * max(1.0, abs(fd)),
            err_msg=f"grad mismatch for {field} dir {k}",
        )


def test_grad_material_diffuse():
    _check_grad("mat_diffuse")


def test_grad_material_reflection():
    _check_grad("mat_reflection", support_only=True)


def test_grad_light_colour():
    _check_grad("pl_colour")


def test_grad_light_position():
    _check_grad("pl_pos", rtol=0.15)


def test_grad_camera_position():
    """Camera-pose gradients on a silhouette-free scene (an infinite plane fills
    every pixel): hard-edge rendering is non-differentiable exactly AT silhouettes
    (as is the reference), so the smooth-scene check isolates the true camera
    gradient path (ray gen -> transfer -> shading)."""
    from raytracer_tpu.core import quaternion as quat

    desc = SceneDescription(camera_fov_deg=70.0)
    desc.set_sky(np.full((16, 3), 0.5, np.float32), 4)
    p = desc.add_plane((0.0, 0.0, 0.0))
    desc.material(p).diffuse = np.array([0.6, 0.5, 0.4])
    desc.point_lights.append(
        PointLight(np.array([25.0, 22.0, 20.0]), np.array([1.0, 6.0, 2.0]))
    )
    desc.camera.position = np.array([0.0, 4.0, 0.0])
    desc.camera.rotation = quat.axis_angle([1.0, 0.0, 0.0], np.pi / 2)
    scene = pack_scene(desc, CFG.width, CFG.height)

    def loss(v):
        img, _ = renderer.render_with_stats(scene._replace(cam_pos=v), CFG)
        w = jnp.cos(jnp.arange(img.size, dtype=jnp.float32)).reshape(img.shape)
        return jnp.sum(img * w)

    base = scene.cam_pos
    grad = np.asarray(jax.grad(loss)(base), np.float64)
    rng = np.random.default_rng(0)
    eps = 2e-3
    for k in range(3):
        d = rng.normal(size=(3,))
        d /= np.linalg.norm(d)
        fd = (
            float(loss(base + eps * jnp.asarray(d, jnp.float32)))
            - float(loss(base - eps * jnp.asarray(d, jnp.float32)))
        ) / (2 * eps)
        ad = float(np.sum(grad * d))
        np.testing.assert_allclose(ad, fd, rtol=0.1, atol=0.05 * max(1.0, abs(fd)))


def test_grad_ambient():
    scene = _scene()
    g = float(
        jax.grad(lambda v: _loss(scene, "ambient", v))(jnp.float32(0.2))
    )
    eps = 1e-3
    lp = float(_loss(scene, "ambient", jnp.float32(0.2 + eps)))
    lm = float(_loss(scene, "ambient", jnp.float32(0.2 - eps)))
    np.testing.assert_allclose(g, (lp - lm) / (2 * eps), rtol=0.05)


def test_grad_mesh_vertices():
    """Gradients flow through the detached traversal into the differentiable hit
    reconstruction (renderer._mesh_hits_into)."""
    from raytracer_tpu.accel.blas import build_blas
    from raytracer_tpu.config import MeshAccelerator
    from raytracer_tpu.scene import meshgen

    desc = SceneDescription(camera_fov_deg=90.0)
    desc.set_sky(np.full((16, 3), 0.4, np.float32), 4)
    desc.register_blas(
        "ico", build_blas(meshgen.icosphere(1.0, 1), MeshAccelerator.BVH, cache_dir=None)
    )
    desc.add_instance("ico", (0.15, 0.1, 4.0))
    desc.point_lights.append(
        PointLight(np.array([15.0, 15.0, 15.0]), np.array([2.0, 5.0, 0.0]))
    )
    desc.camera.position = np.zeros(3)
    scene = pack_scene(desc, CFG.width, CFG.height)

    # restrict the loss to pixels strictly INSIDE the silhouette: radiance is C0
    # across shared triangle edges, but silhouette-boundary pixels jump when a
    # perturbation moves the edge across the pixel
    from raytracer_tpu.ops import traversal as trav

    rays = renderer.generate_primary_rays(scene, CFG)
    bvh = trav.build_scene_bvh(scene)
    res = trav.trace_closest(
        bvh, rays.origin, rays.direction,
        jnp.full((CFG.num_pixels,), jnp.inf), jnp.ones((CFG.num_pixels,), bool), CFG,
    )
    hitmask = (np.asarray(res.tri) >= 0).reshape(CFG.height, CFG.width)
    interior = hitmask.copy()
    for shift in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        interior &= np.roll(hitmask, shift, axis=(0, 1))
    w = np.zeros((CFG.height, CFG.width, 3), np.float32)
    w[interior] = np.sin(np.arange(3))[None, :] + 1.0
    w = jnp.asarray(w)

    def loss(v):
        img, _ = renderer.render_with_stats(
            scene._replace(tr_p0=v), CFG
        )
        return jnp.sum(img * w)

    base = scene.tr_p0
    grad = np.asarray(jax.grad(loss)(base), np.float64)
    assert np.isfinite(grad).all()
    assert np.abs(grad).max() > 0.0, "vertex gradients must be nonzero"

    # NB: tr_p0 rows include the pair-padding duplicates (accel/blas.py), so a
    # global perturbation makes duplicated copies diverge and closest-hit winners
    # flip near ties — FD picks up those jumps, AD cannot; tolerance is loose.
    eps = 5e-4
    rng = np.random.default_rng(1)
    direction = rng.normal(size=base.shape)
    direction /= np.linalg.norm(direction)
    d = jnp.asarray(direction, jnp.float32)
    fd = (float(loss(base + eps * d)) - float(loss(base - eps * d))) / (2 * eps)
    ad = float(np.sum(grad * direction))
    np.testing.assert_allclose(ad, fd, rtol=0.4, atol=0.1 * max(1.0, abs(fd)))
