"""Stage-by-stage frame profile on the real TPU: where does the 1080p Sponza
frame time go?  Each stage is timed as its own jit with scalar-readback forcing
(PERF.md: plain block_until_ready under-reports on this runtime).

Usage: python scratch/profile_frame.py [width height [stage ...]]
Stages: primary trace recon tex shadow compact frame
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.ops import sky_sample, texture_sample
from raytracer_tpu.render import renderer
from raytracer_tpu.scene import scenes
from raytracer_tpu.scene.device import ScenePacker

def _ta(*a, **k):
    """trace_any returning just the mask (API now returns (found, incomplete))."""
    import raytracer_tpu.ops.traversal_wide as _twm
    return _twm.trace_any(*a, **k)[0]



def bench(name, fn, *args, reps=3):
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
    print(f"{name:24s}: compile+run {time.perf_counter()-t0:6.1f} s", flush=True)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        s = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
        best = min(best, time.perf_counter() - t0)
    print(f"{name:24s}: {best*1e3:8.1f} ms   (force {s:.3f})", flush=True)
    return best


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    stages = set(sys.argv[3:]) or {
        "primary", "trace", "recon", "tex", "shadow", "compact", "frame",
    }
    t0 = time.time()
    desc, cfg = scenes.config3_sponza(w, h)
    packer = ScenePacker(desc, cfg.width, cfg.height)
    scene = packer.frame()
    print(f"scene ready in {time.time()-t0:.0f}s: {desc.triangle_count} tris, {w}x{h}")

    n = cfg.num_pixels
    pix = jnp.arange(n, dtype=jnp.int32)
    active = jnp.ones((n,), bool)
    mod = renderer._traversal_module(cfg)

    rays = jax.jit(lambda s: renderer.primary_rays_for(s, cfg, pix))(scene)
    bvh = jax.jit(mod.build_scene_bvh)(scene)
    jax.block_until_ready((rays, bvh))

    if "primary" in stages:
        bench("primary raygen", jax.jit(lambda s: renderer.primary_rays_for(s, cfg, pix).direction), scene)

    if "trace" in stages:
        def tr(bvh, rays):
            r = mod.trace_closest(bvh, rays.origin, rays.direction,
                                  jnp.full((n,), jnp.inf, jnp.float32), active, cfg)
            return r.t
        bench("trace_closest (primary)", jax.jit(tr), bvh, rays)

    # a real hit set for downstream stages
    res = jax.jit(lambda bvh, rays: mod.trace_closest(
        bvh, rays.origin, rays.direction, jnp.full((n,), jnp.inf, jnp.float32),
        active, cfg))(bvh, rays)
    jax.block_until_ready(res)
    frac = float((res.tri >= 0).mean())
    print(f"hit fraction: {frac:.3f}")

    if "recon" in stages:
        def recon(scene, rays, res):
            import raytracer_tpu.ops.intersect as intersect
            hits = intersect.make_miss_hits(n)
            return renderer._mesh_hits_into(scene, rays, res, hits).point
        bench("hit reconstruction", jax.jit(recon), scene, rays, res)

    hits = jax.jit(lambda scene, rays, res: renderer._mesh_hits_into(
        scene, rays, res, __import__("raytracer_tpu.ops.intersect", fromlist=["x"]).make_miss_hits(n)))(scene, rays, res)
    jax.block_until_ready(hits)

    if "tex" in stages:
        m = n // 4
        def tex(scene, hits):
            mid = jnp.where(hits.hit, hits.material_id, 0)[:m]
            tex_id = jnp.take(scene.mat_texture, mid, axis=0)
            t = (scene.tex_data, scene.tex_width, scene.tex_height,
                 scene.tex_levels, scene.tex_offsets, scene.tex_quad)
            return texture_sample.sample(t, tex_id, hits.u[:m], hits.v[:m],
                                         hits.ds_dx[:m], hits.ds_dy[:m],
                                         hits.dt_dx[:m], hits.dt_dy[:m], cfg)
        t_tex = bench("texture sample (N/4)", jax.jit(tex), scene, hits)
        print(f"  -> scaled to N: {t_tex*4e3:.1f} ms")
        bench("sky sample", jax.jit(lambda s, d: sky_sample.sample_sky(s.sky_data, s.sky_size, d)), scene, rays.direction)

    if "shadow" in stages:
        def shadow(bvh, hits):
            neg = jnp.broadcast_to(jnp.asarray(scene.dl_neg_dir)[0], (n, 3))
            return _ta(bvh, hits.point, neg,
                                 jnp.full((n,), jnp.inf, jnp.float32), hits.hit, cfg)
        bench("trace_any (1 light, N)", jax.jit(shadow), bvh, hits)

        def shadow3(bvh, hits):
            # the renderer's batched 3-light shadow wavefront (3N lanes) WITH the
            # contribution cull the renderer applies (front-facing/cone) — the
            # scene-tuned compacted ladder (config3) assumes the culled wavefront
            from raytracer_tpu.core import vecmath as vm
            from raytracer_tpu.render import shading
            to_cam = vm.normalize(
                jnp.asarray(scene.cam_pos)[None, :] - hits.point, eps=1e-20)
            neg = jnp.broadcast_to(jnp.asarray(scene.dl_neg_dir)[0], (n, 3))
            to_pl = jnp.asarray(scene.pl_pos)[0][None, :] - hits.point
            dpl = jnp.linalg.norm(to_pl, axis=1, keepdims=True)
            to_sl = jnp.asarray(scene.sl_pos)[0][None, :] - hits.point
            dsl = jnp.linalg.norm(to_sl, axis=1, keepdims=True)
            c_dir = shading.directional_light(
                hits.normal, to_cam, jnp.asarray(scene.dl_colour)[0][None, :],
                jnp.asarray(scene.dl_neg_dir)[0])
            c_pl = shading.point_light(
                hits.normal, to_pl / dpl, to_cam,
                jnp.asarray(scene.pl_colour)[0][None, :], dpl[:, 0] ** 2)
            c_sl = shading.spot_light(
                hits.normal, to_sl / dsl, to_cam,
                jnp.asarray(scene.sl_colour)[0][None, :], dsl[:, 0] ** 2,
                jnp.asarray(scene.sl_neg_dir)[0][None, :],
                jnp.asarray(scene.sl_inner)[0], jnp.asarray(scene.sl_outer)[0])
            contrib = jnp.concatenate(
                [vm.length_squared(c) > 0 for c in (c_dir, c_pl, c_sl)])
            o3 = jnp.tile(hits.point, (3, 1))
            d3 = jnp.concatenate([neg, to_pl / dpl, to_sl / dsl], axis=0)
            tm = jnp.concatenate([jnp.full((n,), jnp.inf), dpl[:, 0], dsl[:, 0]])
            return _ta(bvh, o3, d3, tm, jnp.tile(hits.hit, 3) & contrib, cfg)
        bench("trace_any (3 lights, 3N, culled)", jax.jit(shadow3), bvh, hits)

    if "compact" in stages:
        flags = res.tri >= 0
        # gen-0 candidate pytree: 2N rows, 10 fields (6x [2N,3] + [2N,3]x2 + ...)
        z3 = jnp.zeros((2 * n, 3), jnp.float32)
        cand = dict(active=jnp.concatenate([flags, flags]),
                    origin=z3, direction=z3, dO_dx=z3, dO_dy=z3, dD_dx=z3,
                    dD_dy=z3, weight=z3, sigma=z3,
                    pixel=jnp.tile(pix, 2))
        cap = max(int(round(n * 0.25)), 64)
        bench("compact argsort (2N)", jax.jit(
            lambda c: renderer._compact(c, cap)[0]["origin"]), cand)
        bench("ladder argsort (N)", jax.jit(
            lambda f: jnp.argsort(jnp.logical_not(f))[: n // 8]), flags)

    if "frame" in stages:
        bench("FULL fwd frame", jax.jit(lambda s: renderer.render_with_stats(s, cfg)[0]), scene, reps=2)


if __name__ == "__main__":
    main()
