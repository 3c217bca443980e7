"""Tensor-parallel scene sharding (parallel/scene_shard.py) on the virtual
8-device mesh: triangle geometry split over `sp`, pixels over `dp`; the combined
render must match the replicated-scene single-device render.

This is SURVEY.md 2.3's "tensor/model parallel (scene sharded)" row — absent in
the reference (its scene is shared memory, BottomLevelBVH.cpp:16-22)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raytracer_tpu.accel.blas import build_blas
from raytracer_tpu.config import RenderConfig, TextureSampleMode
from raytracer_tpu.parallel.mesh import make_mesh
from raytracer_tpu.parallel.scene_shard import (
    ShardedScenePacker,
    make_primitive_sharded_renderer,
    split_mesh,
)
from raytracer_tpu.render import renderer
from raytracer_tpu.scene import meshgen
from raytracer_tpu.scene.description import PointLight, SceneDescription
from raytracer_tpu.scene.device import ScenePacker

CFG = RenderConfig(width=48, height=32, num_bounces=1, queue_factor=1.0,
                   texture_sample_mode=TextureSampleMode.BILINEAR,
                   traversal_chunk=1 << 9)


def _mesh_scene():
    desc = SceneDescription(camera_fov_deg=90.0)
    desc.set_sky(np.full((16, 3), 0.35, np.float32), 4)
    p = desc.add_plane((0.0, -1.2, 0.0))
    desc.material(p).diffuse = np.array([0.5, 0.5, 0.5])
    ico = meshgen.icosphere(1.0, 2)
    ico.materials[0].diffuse = np.array([0.7, 0.4, 0.2])
    desc.register_blas("ico", build_blas(ico))
    desc.mesh_sources["ico"] = ico
    torus = meshgen.torus(1.0, 0.35, 24, 12)
    torus.materials[0].diffuse = np.array([0.2, 0.5, 0.7])
    torus.materials[0].reflection = np.array([0.25, 0.25, 0.25])
    desc.register_blas("torus", build_blas(torus))
    desc.mesh_sources["torus"] = torus
    desc.add_instance("ico", (-1.4, 0.3, 5.0))
    desc.add_instance("torus", (1.5, 0.2, 5.5))
    desc.point_lights.append(
        PointLight(np.array([30.0, 28.0, 25.0]), np.array([2.0, 6.0, 1.0]))
    )
    desc.camera.position = np.array([0.0, 0.8, 0.0])
    return desc


def test_split_mesh_partitions():
    ico = meshgen.icosphere(1.0, 2)
    parts = split_mesh(ico, 4)
    assert sum(p.triangle_count for p in parts) == ico.triangle_count
    sizes = [p.triangle_count for p in parts]
    assert max(sizes) - min(sizes) <= 1
    # every part is a spatially compact subset: total sub-AABB volume well below
    # 4x the full AABB volume (the chunks barely overlap)
    def vol(m):
        pts = np.concatenate([m.p0, m.p1, m.p2])
        d = pts.max(0) - pts.min(0)
        return float(np.prod(np.maximum(d, 1e-6)))
    assert sum(vol(p) for p in parts) < 2.5 * vol(ico)


@pytest.mark.parametrize("dp,sp", [(2, 4), (4, 2)])
def test_primitive_sharded_matches_single_device(dp, sp):
    if len(jax.devices()) < dp * sp:
        pytest.skip("needs 8 virtual devices")
    desc = _mesh_scene()
    scene = ScenePacker(desc, CFG.width, CFG.height).frame()
    ref_img, ref_stats = jax.jit(
        lambda s: renderer.render_with_stats(s, CFG)
    )(scene)

    mesh = make_mesh((dp, sp), ("dp", "sp"))
    packer = ShardedScenePacker(desc, CFG, sp)
    stack = packer.frame()
    run = make_primitive_sharded_renderer(CFG, mesh)
    img, stats = run(stack)

    ref_img = np.asarray(ref_img)
    img = np.asarray(img)
    # hits are min-t combined from identical triangle tests; any difference is
    # f32 marginality on shared-edge rays — require near-exact agreement
    mism = np.abs(img - ref_img) > 1e-5
    assert mism.mean() < 1e-3, f"mismatch fraction {mism.mean()}"
    assert int(stats.num_incomplete) == 0
    assert int(stats.num_primary) == int(ref_stats.num_primary)
    assert int(stats.num_shadow) == int(ref_stats.num_shadow)


def test_tensor_parallel_grads_match_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from raytracer_tpu.diff.train import (
        extract_params,
        make_tensor_parallel_train_step,
        render_loss,
    )
    from raytracer_tpu.parallel.scene_shard import ShardedScenePacker

    desc = _mesh_scene()
    scene = ScenePacker(desc, CFG.width, CFG.height).frame()
    params = extract_params(scene)
    key = jax.random.PRNGKey(0)
    target = jax.random.uniform(key, (CFG.height, CFG.width, 3), jnp.float32)

    ref_loss, ref_grads = jax.jit(
        jax.value_and_grad(render_loss), static_argnames=("cfg",)
    )(params, scene, target, cfg=CFG)

    mesh = make_mesh((4, 2), ("dp", "sp"))
    stack = ShardedScenePacker(desc, CFG, 2).frame()
    init, step = make_tensor_parallel_train_step(CFG, mesh)
    p0, opt_state = init(stack)
    # one step returns the pre-update loss; compare loss and the grads via a
    # direct shard_fn call is internal, so check loss parity + a param delta
    # direction instead: re-derive grads by finite param response
    _, _, loss = step(p0, opt_state, stack, target)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)

    # grads parity: call the internal shard fn through value_and_grad shapes by
    # re-running step with a zero-lr optimizer and inspecting update direction
    import optax

    init2, step2 = make_tensor_parallel_train_step(
        CFG, mesh, optimizer=optax.sgd(1.0)
    )
    p1, s1 = init2(stack)
    p2, _, _ = step2(p1, s1, stack, target)
    for f in ref_grads:
        got = np.asarray(p1[f]) - np.asarray(p2[f])  # = lr * grad = grad
        want = np.asarray(ref_grads[f])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-6,
                                   err_msg=f"grad mismatch for {f}")
