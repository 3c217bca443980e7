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
