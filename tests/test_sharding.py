"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates SURVEY.md 2.3's TPU mapping: pixels sharded over the mesh (strided for load
balance), scene replicated, per-shard rendering bit-identical to single-device, and
parameter gradients psum'd across chips.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.config import RenderConfig, TextureSampleMode
from raytracer_tpu.diff.train import (
    extract_params,
    make_sharded_train_step,
    render_loss,
)
from raytracer_tpu.parallel.mesh import make_mesh, strided_pixel_permutation
from raytracer_tpu.parallel.shard import make_sharded_renderer
from raytracer_tpu.render import renderer
from raytracer_tpu.scene.description import PointLight, SceneDescription
from raytracer_tpu.scene.device import pack_scene

CFG = RenderConfig(width=40, height=24, num_bounces=1, queue_factor=1.0,
                   texture_sample_mode=TextureSampleMode.BILINEAR,
                   traversal_chunk=1 << 9)


def _scene():
    desc = SceneDescription(camera_fov_deg=90.0)
    desc.set_sky(np.full((16, 3), 0.4, np.float32), 4)
    s = desc.add_sphere((0.0, 0.5, 5.0), 1.0)
    desc.material(s).diffuse = np.array([0.6, 0.3, 0.2])
    desc.material(s).reflection = np.array([0.3, 0.3, 0.3])
    p = desc.add_plane((0.0, -1.0, 0.0))
    desc.material(p).diffuse = np.array([0.5, 0.5, 0.5])
    desc.point_lights.append(
        PointLight(np.array([20.0, 18.0, 15.0]), np.array([2.0, 5.0, 2.0]))
    )
    desc.camera.position = np.array([0.0, 0.5, 0.0])
    return pack_scene(desc, CFG.width, CFG.height)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh((4, 2), ("dp", "sp"))


def test_strided_permutation_covers_all_pixels():
    perm = strided_pixel_permutation(103, 8)
    assert perm.shape[0] % 8 == 0
    assert set(perm.tolist()) == set(range(103))


def test_sharded_render_matches_single_device(mesh8):
    scene = _scene()
    ref, ref_stats = renderer.render_with_stats(scene, CFG)
    run = make_sharded_renderer(CFG, mesh8)
    img, stats = run(scene)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=1e-4)
    # counters all-reduce to the same totals
    assert int(stats.num_primary) == CFG.num_pixels
    assert int(stats.num_shadow) == int(ref_stats.num_shadow)


def test_sharded_train_step_matches_single_device_grads(mesh8):
    scene = _scene()
    target = jnp.full((CFG.height, CFG.width, 3), 0.25, jnp.float32)
    init, step = make_sharded_train_step(CFG, mesh8)
    params, opt_state = init(scene)

    # single-device reference loss/grads
    ref_loss, ref_grads = jax.value_and_grad(render_loss)(
        params, scene, target, CFG
    )
    new_params, _, loss = step(params, opt_state, scene, target)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    # params actually moved (skip empty leaves, e.g. absent light types)
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))) if a.size else 0.0,
        params, new_params,
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0


def test_uneven_pixel_count_sharding(mesh8):
    cfg = CFG.replace(width=37, height=23)  # 851 pixels, not divisible by 8
    scene = _scene()
    ref, _ = renderer.render_with_stats(scene, cfg)
    run = make_sharded_renderer(cfg, mesh8)
    img, _ = run(scene)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=1e-4)
