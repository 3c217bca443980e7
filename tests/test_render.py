"""Renderer behavior tests: analytic single-ray expectations + scene properties.

The reference has no test suite; these encode its shading semantics
(Raytracer.cpp:87-400, Light.h) as closed-form expectations on single pixels.
"""

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.config import AMBIENT_LIGHTING, RenderConfig, TextureSampleMode
from raytracer_tpu.render import renderer
from raytracer_tpu.scene import scenes
from raytracer_tpu.scene.description import (
    DirectionalLight,
    PointLight,
    SceneDescription,
)
from raytracer_tpu.scene.device import pack_scene

CFG64 = RenderConfig(width=64, height=64, num_bounces=0, queue_factor=1.0,
                     texture_sample_mode=TextureSampleMode.NEAREST)


def _center_ray_scene(desc, cfg):
    scene = pack_scene(desc, cfg.width, cfg.height)
    center = (cfg.height // 2) * cfg.width + cfg.width // 2
    rgb, _ = renderer.render_wavefront(
        scene, cfg, jnp.asarray([center], jnp.int32)
    )
    return np.asarray(rgb)[0]


def test_plane_directional_light_analytic():
    """Center pixel of a camera looking straight down the plane normal.

    Expected: albedo * (ambient + N.L + (N.H)^128) * colour  (Light.h:12-26,
    Raytracer.cpp:146-201 with no shadow blockers).
    """
    desc = SceneDescription(camera_fov_deg=90.0)
    desc.set_sky(np.zeros((4, 3), np.float32), 2)
    p = desc.add_plane((0.0, -2.0, 0.0))
    albedo = np.array([0.5, 0.6, 0.7])
    desc.material(p).diffuse = albedo
    light_dir = np.array([0.0, -1.0, 0.0])
    colour = np.array([0.8, 0.8, 0.8])
    desc.directional_lights.append(DirectionalLight(colour, light_dir))
    # camera above the plane looking down: rotate -90 deg about x so +z -> -y
    from raytracer_tpu.core import quaternion as quat

    desc.camera.position = np.array([0.0, 3.0, 0.0])
    desc.camera.rotation = quat.axis_angle([1.0, 0.0, 0.0], np.pi / 2)

    got = _center_ray_scene(desc, CFG64)

    n = np.array([0.0, 1.0, 0.0])
    to_l = -light_dir
    to_cam = np.array([0.0, 1.0, 0.0])
    half = (to_l + to_cam) / np.linalg.norm(to_l + to_cam)
    intensity = np.dot(n, to_l) + np.dot(n, half) ** 128
    expected = albedo * (AMBIENT_LIGHTING + intensity * colour)
    np.testing.assert_allclose(got, expected, rtol=2e-2)


def test_point_light_inverse_square():
    """PointLight 1/d^2 falloff (PointLight.h:9-11)."""
    def render_with_light_at(y):
        desc = SceneDescription(camera_fov_deg=90.0)
        desc.set_sky(np.zeros((4, 3), np.float32), 2)
        p = desc.add_plane((0.0, 0.0, 0.0))
        desc.material(p).diffuse = np.array([1.0, 1.0, 1.0])
        desc.point_lights.append(
            PointLight(np.array([10.0, 10.0, 10.0]), np.array([0.0, y, 0.0]))
        )
        from raytracer_tpu.core import quaternion as quat

        desc.camera.position = np.array([0.0, 5.0, 0.0])
        desc.camera.rotation = quat.axis_angle([1.0, 0.0, 0.0], np.pi / 2)
        return render_with_light_at_inner(desc)

    def render_with_light_at_inner(desc):
        return _center_ray_scene(desc, CFG64)

    c2 = render_with_light_at(2.0) - AMBIENT_LIGHTING
    c4 = render_with_light_at(4.0) - AMBIENT_LIGHTING
    # doubling distance quarters the (diffuse+spec) light term
    np.testing.assert_allclose(c2 / c4, 4.0 * np.ones(3), rtol=5e-2)


def test_shadowing_blocks_point_light():
    """A sphere between the surface and the light leaves only ambient
    (Raytracer.cpp:165-168)."""
    desc = SceneDescription(camera_fov_deg=90.0)
    desc.set_sky(np.zeros((4, 3), np.float32), 2)
    p = desc.add_plane((0.0, 0.0, 0.0))
    desc.material(p).diffuse = np.array([1.0, 1.0, 1.0])
    desc.point_lights.append(
        PointLight(np.array([10.0, 10.0, 10.0]), np.array([4.0, 4.0, 0.0]))
    )
    # blocker on the surface->light segment, off the camera axis
    s = desc.add_sphere((2.0, 2.0, 0.0), 0.5)
    desc.material(s).diffuse = np.array([0.0, 0.0, 0.0])  # black, does not shade
    from raytracer_tpu.core import quaternion as quat

    desc.camera.rotation = quat.axis_angle([1.0, 0.0, 0.0], np.pi / 2)
    desc.camera.position = np.array([0.0, 5.0, 0.0])  # center ray at origin: shadowed
    shadowed = _center_ray_scene(desc, CFG64)
    np.testing.assert_allclose(shadowed, AMBIENT_LIGHTING, atol=1e-3)

    desc.spheres.clear()  # remove the blocker -> lit
    lit = _center_ray_scene(desc, CFG64)
    assert np.all(lit > AMBIENT_LIGHTING + 0.05)


def test_mirror_reflection_sees_sky():
    """Pure mirror sphere reflects the sky colour scaled by its reflection RGB
    (Raytracer.cpp:249-271)."""
    desc = SceneDescription(camera_fov_deg=90.0)
    sky_col = np.array([0.2, 0.4, 0.8], np.float32)
    desc.set_sky(np.tile(sky_col, (16, 1)) * np.pi, 4)  # sample scales by 1/pi
    s = desc.add_sphere((0.0, 0.0, 5.0), 1.0)
    desc.material(s).diffuse = np.zeros(3)
    desc.material(s).reflection = np.array([1.0, 0.5, 0.25])
    desc.camera.position = np.zeros(3)
    cfg = CFG64.replace(num_bounces=1)
    got = _center_ray_scene(desc, cfg)
    np.testing.assert_allclose(got, sky_col * [1.0, 0.5, 0.25], rtol=1e-2, atol=1e-3)


def test_sky_only():
    desc = SceneDescription(camera_fov_deg=90.0)
    sky_col = np.array([0.3, 0.5, 0.7], np.float32)
    desc.set_sky(np.tile(sky_col, (16, 1)) * np.pi, 4)
    desc.camera.position = np.zeros(3)
    got = _center_ray_scene(desc, CFG64)
    np.testing.assert_allclose(got, sky_col, rtol=1e-3)


def test_config0_scene_renders():
    desc, cfg = scenes.config0_sphere_plane()
    cfg = cfg.replace(width=32, height=32)
    scene = pack_scene(desc, cfg.width, cfg.height)
    img, stats = renderer.render_with_stats(scene, cfg)
    img = np.asarray(img)
    assert img.shape == (32, 32, 3)
    assert np.all(np.isfinite(img))
    assert img.max() > 0.05
    assert int(stats.num_primary) == 32 * 32


def test_dielectric_energy_finite():
    desc, cfg = scenes.config2_dielectric()
    cfg = cfg.replace(width=24, height=24, num_bounces=4, traversal_chunk=1 << 10)
    scene = pack_scene(desc, cfg.width, cfg.height)
    img, stats = renderer.render_with_stats(scene, cfg)
    img = np.asarray(img)
    assert np.all(np.isfinite(img))
    assert int(stats.num_refraction) > 0
    assert int(stats.num_reflection) > 0


def test_chunked_matches_whole_frame():
    """render_pixels chunking (the 32x32-tile analog, WorkerThread.cpp:53-69) is
    image- and stats-identical to the single-wavefront path, including the padded
    final chunk (1536 pixels, chunk=250 -> 7 chunks with 214 padding lanes)."""
    desc, cfg = scenes.config0_sphere_plane()
    cfg = cfg.replace(width=48, height=32)
    scene = pack_scene(desc, cfg.width, cfg.height)
    img_w, st_w = renderer.render_with_stats(
        scene, cfg.replace(traversal_chunk=1 << 20)
    )
    img_c, st_c = renderer.render_with_stats(
        scene, cfg.replace(traversal_chunk=250)
    )
    np.testing.assert_allclose(np.asarray(img_c), np.asarray(img_w), atol=1e-5)
    for a, b in zip(st_w, st_c):
        assert int(a) == int(b)


def test_scan_bounces_matches_unrolled():
    """The lax.scan secondary-bounce path (one traced bounce body, shared
    capacity) matches the per-bounce unrolled loop on a reflective+refractive
    scene: every ray counter is IDENTICAL at full depth 8 (the last scan
    iteration masks spawning instead of skipping it), and the image agrees to
    fp-reassociation level at the flagship depth (XLA fuses the unrolled
    bounces differently, so bit-equality is not expected; measured divergence
    is ~2e-6 at depth 3, compounding only through deep near-TIR dielectric
    chains)."""
    desc, cfg = scenes.make_scene("config2")
    cfg = cfg.replace(width=48, height=32)
    scene = pack_scene(desc, cfg.width, cfg.height)
    img_s, st_s = renderer.render_with_stats(scene, cfg.replace(scan_bounces=True))
    img_u, st_u = renderer.render_with_stats(scene, cfg.replace(scan_bounces=False))
    for a, b in zip(st_s, st_u):
        assert int(a) == int(b)
    assert int(st_s.num_reflection) > 0 and int(st_s.num_refraction) > 0

    cfg3 = cfg.replace(num_bounces=3)
    img_s3, _ = renderer.render_with_stats(scene, cfg3.replace(scan_bounces=True))
    img_u3, _ = renderer.render_with_stats(scene, cfg3.replace(scan_bounces=False))
    np.testing.assert_allclose(
        np.asarray(img_s3), np.asarray(img_u3), atol=1e-5, rtol=0
    )


def test_fxaa_shape_and_range():
    from raytracer_tpu.ops import fxaa

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, size=(32, 32, 3)), jnp.float32)
    out = np.asarray(fxaa.fxaa(img))
    assert out.shape == (32, 32, 3)
    assert np.all((out >= 0) & (out <= 1))


def test_heatmap_mode():
    desc, cfg = scenes.config1_monkey()
    cfg = cfg.replace(width=16, height=16, visualize_heatmap=True,
                      traversal_chunk=1 << 8)
    scene = pack_scene(desc, cfg.width, cfg.height)
    img, _ = renderer.render_with_stats(scene, cfg)
    img = np.asarray(img)
    assert np.all(img >= 0) and img.max() > 0  # some rays took traversal steps


def test_render_frames_matches_per_frame():
    """renderer.render_frames (N frames per dispatch, lax.map over the frame
    axis — app --batch-frames) is image- and stats-identical to rendering the
    same packed frames one dispatch at a time."""
    import jax
    import jax.numpy as jnp

    from raytracer_tpu.scene.device import ScenePacker

    desc, cfg = scenes.make_scene("config4")
    cfg = cfg.replace(width=48, height=32, traversal_chunk=1 << 9)
    packer = ScenePacker(desc, cfg.width, cfg.height)
    frames = []
    for _ in range(3):
        desc.update(1.0 / 30.0)
        frames.append(packer.frame())

    imgs_b, stats_b = renderer.render_frames(
        jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *frames), cfg
    )
    for k, scene in enumerate(frames):
        img, stats = renderer.render_with_stats(scene, cfg)
        np.testing.assert_array_equal(np.asarray(imgs_b[k]), np.asarray(img))
        for a, b in zip(stats, jax.tree_util.tree_map(lambda x: x[k], stats_b)):
            assert int(a) == int(b)
