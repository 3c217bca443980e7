"""End-to-end differentiable-rendering training tests: optimize scene parameters to
match a target image (the capability the reference lacks; BASELINE north star)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.config import RenderConfig, TextureSampleMode
from raytracer_tpu.diff import train
from raytracer_tpu.render import renderer
from raytracer_tpu.scene.description import PointLight, SceneDescription
from raytracer_tpu.scene.device import pack_scene

CFG = RenderConfig(width=24, height=24, num_bounces=0, queue_factor=1.0,
                   texture_sample_mode=TextureSampleMode.BILINEAR)


def _scene(diffuse):
    desc = SceneDescription(camera_fov_deg=90.0)
    desc.set_sky(np.full((16, 3), 0.3, np.float32), 4)
    s = desc.add_sphere((0.0, 0.0, 5.0), 1.5)
    desc.material(s).diffuse = np.asarray(diffuse, np.float64)
    desc.point_lights.append(
        PointLight(np.array([20.0, 20.0, 20.0]), np.array([2.0, 4.0, 1.0]))
    )
    desc.camera.position = np.zeros(3)
    return pack_scene(desc, CFG.width, CFG.height)


def test_training_recovers_material_colour():
    """Gradient descent on mat_diffuse recovers the target sphere colour."""
    target_scene = _scene([0.7, 0.2, 0.5])
    target, _ = renderer.render_with_stats(target_scene, CFG)

    scene = _scene([0.3, 0.6, 0.3])
    init, step = train.make_train_step(CFG, fields=("mat_diffuse",))
    params, opt_state = init(scene)

    loss0 = None
    for i in range(60):
        params, opt_state, loss = step(params, opt_state, scene, target)
        if loss0 is None:
            loss0 = float(loss)
    assert float(loss) < 0.05 * loss0, f"loss {loss0} -> {float(loss)}"

    got = np.asarray(params["mat_diffuse"])[1]  # sphere material slot
    np.testing.assert_allclose(got, [0.7, 0.2, 0.5], atol=0.08)


def test_checkpoint_roundtrip_with_train_state(tmp_path):
    import os

    from raytracer_tpu.utils import checkpoint

    scene = _scene([0.4, 0.4, 0.4])
    init, step = train.make_train_step(CFG, fields=("mat_diffuse", "ambient"))
    params, opt_state = init(scene)
    target = jnp.zeros((CFG.height, CFG.width, 3))
    params, opt_state, _ = step(params, opt_state, scene, target)

    path = os.path.join(tmp_path, "state.npz")
    checkpoint.save(path, {k: np.asarray(v) for k, v in params.items()},
                    opt_state, step=1)
    p2, s2, st = checkpoint.restore(path, opt_state)
    assert st == 1
    np.testing.assert_allclose(p2["mat_diffuse"], np.asarray(params["mat_diffuse"]))
    # optimizer state restored leaf-for-leaf
    for a, b in zip(jax.tree_util.tree_leaves(opt_state),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_accum_grads_match_injit_chunked():
    """make_accum_grad_fn (host-driven microbatches, no jax.checkpoint) and the
    in-jit chunked loss (lax.map + save-named-traversal checkpoint policy,
    renderer.render_pixels) produce the same loss and gradients on a mesh scene —
    cross-validates the checkpoint policy against an independent bwd path."""
    from raytracer_tpu.scene import scenes

    desc, cfg = scenes.config1_monkey()
    cfg = cfg.replace(width=24, height=16, num_bounces=1, queue_factor=1.0,
                      texture_sample_mode=TextureSampleMode.BILINEAR,
                      traversal_chunk=128)  # 384 px -> 3 chunks
    scene = pack_scene(desc, cfg.width, cfg.height)
    fields = ("mat_diffuse", "pl_colour", "cam_pos", "ambient")
    params = train.extract_params(scene, fields)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    def loss_fn(p):
        img, _ = renderer.render_with_stats(train.apply_params(scene, p), cfg)
        return train.image_loss(img, target)

    loss_j, grads_j = jax.value_and_grad(loss_fn)(params)

    accum = train.make_accum_grad_fn(cfg)
    loss_a, grads_a, stats = accum(params, scene, target)

    np.testing.assert_allclose(float(loss_a), float(loss_j), rtol=1e-5)
    for f in fields:
        np.testing.assert_allclose(
            np.asarray(grads_a[f]), np.asarray(grads_j[f]), rtol=2e-4, atol=1e-6,
            err_msg=f,
        )
    assert int(stats.num_incomplete) == 0
