"""Measure what fraction of submitted shadow lanes survives the contribution
cull (front-facing + spot-cone + nonzero albedo) on config3 — data for setting
wide_rounds_any round-0 compaction fraction.

Usage: python scratch/shadow_fraction.py [width height]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp

from raytracer_tpu.render import renderer
from raytracer_tpu.scene import scenes
from raytracer_tpu.scene.device import ScenePacker


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 360
    t0 = time.time()
    desc, cfg = scenes.config3_sponza(w, h)
    scene = ScenePacker(desc, cfg.width, cfg.height).frame()
    print(f"scene ready in {time.time()-t0:.0f}s", flush=True)

    fwd = jax.jit(lambda s: renderer.render_with_stats(s, cfg))
    img, stats = fwd(scene)
    stats = jax.tree_util.tree_map(int, jax.device_get(stats))
    n_lights = 3
    # submitted lanes per generation ~= n_lights * generation size; num_shadow
    # counts only post-cull lanes.  num_primary+num_reflection+num_refraction is
    # the total closest-hit lane count across generations (= shadow parents).
    parents = stats.num_primary + stats.num_reflection + stats.num_refraction
    submitted = n_lights * parents
    print(f"primary={stats.num_primary} refl={stats.num_reflection} "
          f"refr={stats.num_refraction} shadow_active={stats.num_shadow}")
    print(f"submitted={submitted} active_fraction={stats.num_shadow/submitted:.3f}")
    # gen-0 only: trace primaries, compute the per-light contribution masks the
    # renderer uses, report each light's active fraction.
    pix = jnp.arange(cfg.num_pixels, dtype=jnp.int32)
    rays = jax.jit(lambda s: renderer.primary_rays_for(s, cfg, pix))(scene)
    mod = renderer._traversal_module(cfg)
    bvh = jax.jit(mod.build_scene_bvh)(scene)
    active = jnp.ones((cfg.num_pixels,), bool)

    @jax.jit
    def gen0_masks(scene, bvh, rays):
        from raytracer_tpu.core import vecmath as vm
        from raytracer_tpu.render import shading
        hits, _ = renderer.trace_scene(scene, bvh, rays, active, cfg)
        hit = hits.hit
        mid = jnp.where(hit, hits.material_id, 0)
        diffuse_c = jnp.take(scene.mat_diffuse, mid, axis=0)
        to_camera = vm.normalize(scene.cam_pos[None, :] - hits.point, eps=1e-20)
        out = {}
        # point
        to_l = scene.pl_pos[0][None, :] - hits.point
        d2 = vm.length_squared(to_l)
        dist = jnp.sqrt(d2)
        c = shading.point_light(hits.normal, to_l / dist[:, None], to_camera,
                                scene.pl_colour[0][None, :], d2)
        out["point"] = hit & (vm.length_squared(c) > 0)
        # spot
        to_l = scene.sl_pos[0][None, :] - hits.point
        d2 = vm.length_squared(to_l)
        dist = jnp.sqrt(d2)
        c = shading.spot_light(hits.normal, to_l / dist[:, None], to_camera,
                               scene.sl_colour[0][None, :], d2,
                               scene.sl_neg_dir[0][None, :], scene.sl_inner[0],
                               scene.sl_outer[0])
        out["spot"] = hit & (vm.length_squared(c) > 0)
        # directional
        c = shading.directional_light(hits.normal, to_camera,
                                      scene.dl_colour[0][None, :],
                                      scene.dl_neg_dir[0])
        out["dir"] = hit & (vm.length_squared(c) > 0)
        out["hit"] = hit
        out["diffuse"] = hit & (vm.length_squared(
            jnp.where(hit[:, None], diffuse_c, 0.0)) > 0)
        return out

    masks = gen0_masks(scene, bvh, rays)
    n = cfg.num_pixels
    for k, v in masks.items():
        print(f"gen0 {k:8s}: {int(v.sum())/n:.3f}")


if __name__ == "__main__":
    main()
