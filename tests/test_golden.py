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
    "config4": dict(width=96, height=64, traversal_chunk=1 << 10),
}


def _render(name):
    desc, cfg = scenes.make_scene(name)
    cfg = cfg.replace(**CASES[name])
    scene = pack_scene(desc, cfg.width, cfg.height)
    img, stats = renderer.render_with_stats(scene, cfg)
    assert int(stats.num_incomplete) == 0, "traversal budget truncated rays"
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
