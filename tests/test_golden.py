"""Golden-image regression tests.

The reference has no golden tests (SURVEY.md 4); these pin down the full pipeline
per BASELINE config at small resolution.  Regenerate after intentional changes with
``UPDATE_GOLDEN=1 python -m pytest tests/test_golden.py``.
"""

import os

import numpy as np
import pytest

from raytracer_tpu.render import renderer
from raytracer_tpu.scene import scenes
from raytracer_tpu.scene.device import pack_scene
from raytracer_tpu.utils import image as image_util

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

CASES = {
    "config0": dict(width=96, height=96),
    "config1": dict(width=96, height=96, traversal_chunk=1 << 10),
    "config2": dict(width=64, height=64, num_bounces=4, traversal_chunk=1 << 10),
    # the flagship config, pinned at reduced res with its production
    # queue_factor — and num_dropped == 0 asserted (VERDICT r1 weak #3/#4)
    "config3": dict(width=128, height=72, traversal_chunk=1 << 11),
    "config4": dict(width=96, height=64, traversal_chunk=1 << 10),
}

SCENE_KWARGS = {"config3": dict(target_triangles=40_000)}


def _render(name, extra_cfg=None):
    desc, cfg = scenes.SCENES[name](**SCENE_KWARGS.get(name, {}))
    cfg = cfg.replace(**CASES[name])
    if extra_cfg:
        cfg = cfg.replace(**extra_cfg)
    scene = pack_scene(desc, cfg.width, cfg.height)
    img, stats = renderer.render_with_stats(scene, cfg)
    assert int(stats.num_incomplete) == 0, "traversal budget truncated rays"
    assert int(stats.num_dropped) == 0, "queue capacity dropped rays"
    return np.asarray(img)


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    img = _render(name)
    assert np.all(np.isfinite(img))
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if os.environ.get("UPDATE_GOLDEN") or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, img=img.astype(np.float16))
        image_util.save_png(os.path.join(GOLDEN_DIR, f"{name}.png"), img)
        pytest.skip(f"golden for {name} (re)generated")
    ref = np.load(path)["img"].astype(np.float32)
    # float16 storage + cross-platform transcendental drift tolerance
    diff = np.abs(img - ref)
    assert diff.mean() < 2e-3, f"mean diff {diff.mean()}"
    assert (diff > 0.05).mean() < 0.005, "too many outlier pixels"


def test_golden_fxaa_presented():
    """Presented-image golden through the FXAA + gamma post pass
    (fragment_fxaa.glsl semantics incl. clamp-to-edge border taps)."""
    import jax.numpy as jnp

    img = _render("config1", extra_cfg=dict(enable_fxaa=True))
    desc, cfg = scenes.make_scene("config1")
    cfg = cfg.replace(**CASES["config1"], enable_fxaa=True)
    out = np.asarray(renderer.present(jnp.asarray(img), cfg))
    assert np.all(np.isfinite(out)) and out.min() >= 0.0 and out.max() <= 1.0
    path = os.path.join(GOLDEN_DIR, "config1_fxaa.npz")
    if os.environ.get("UPDATE_GOLDEN") or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, img=out.astype(np.float16))
        image_util.save_png(os.path.join(GOLDEN_DIR, "config1_fxaa.png"), out)
        pytest.skip("fxaa golden (re)generated")
    ref = np.load(path)["img"].astype(np.float32)
    diff = np.abs(out - ref)
    assert diff.mean() < 2e-3, f"mean diff {diff.mean()}"


def test_config3_queue_factor_energy_loss_bounded():
    """The flagship config's secondary-queue caps (0.25, 0.1, 0.05) trade a
    BOUNDED amount of energy for compute: quantified against the lossless
    queue_factor=2.0 render (the reference recurses losslessly,
    Raytracer.cpp:249-316)."""
    desc, _ = scenes.SCENES["config3"](**SCENE_KWARGS["config3"])
    base = scenes.SCENES["config3"]()[1].replace(**CASES["config3"])
    scene = pack_scene(desc, base.width, base.height)
    img_capped, st_capped = renderer.render_with_stats(scene, base)
    img_lossless, st_lossless = renderer.render_with_stats(
        scene, base.replace(queue_factor=2.0)
    )
    assert int(st_lossless.num_dropped) == 0
    diff = np.abs(np.asarray(img_capped) - np.asarray(img_lossless))
    # documented bound: the caps cost < 1e-3 mean pixel error on the flagship
    # camera (VERDICT r1 #4)
    assert diff.mean() < 1e-3, f"queue caps cost {diff.mean()} mean error"
