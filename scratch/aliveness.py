"""Measure per-iteration aliveness curves of the wide traversal (closest + any-hit
shadow rays) on the Sponza-class scene — data for tuning the straggler ladders.

Usage: python scratch/aliveness.py [width height iters]
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

from raytracer_tpu.ops import traversal_wide as tw
from raytracer_tpu.render import renderer
from raytracer_tpu.scene import scenes
from raytracer_tpu.scene.device import ScenePacker


def curve(bvh, o, d, t_max, active, cfg, any_hit, iters):
    o, d, t_max, active, n = tw._pad_inputs(o, d, t_max, active)
    state = tw._init_state(t_max, active, bvh.root, any_hit, track_steps=False)
    stack = jnp.zeros((o.shape[0], cfg.wide_stack_size), jnp.int32)
    rays_t = (tw._t(o), tw._t(d))
    tf = t_max if any_hit else None

    def step(carry, _):
        st, sk = carry
        st, sk = tw._step(bvh, st, sk, rays_t, tf, any_hit)
        return (st, sk), jnp.sum(tw._alive(st, any_hit).astype(jnp.int32))

    (_, _), counts = jax.lax.scan(step, (state, stack), None, length=iters)
    return counts


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 960
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 540
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 96
    desc, cfg = scenes.config3_sponza(w, h)
    scene = ScenePacker(desc, cfg.width, cfg.height).frame()
    n = cfg.num_pixels
    pix = jnp.arange(n, dtype=jnp.int32)
    rays = jax.jit(lambda s: renderer.primary_rays_for(s, cfg, pix))(scene)
    bvh = jax.jit(tw.build_scene_bvh)(scene)
    inf = jnp.full((n,), jnp.inf, jnp.float32)
    act = jnp.ones((n,), bool)

    t0 = time.time()
    c = jax.jit(lambda b, r: curve(b, r.origin, r.direction, inf, act, cfg, False, iters))(bvh, rays)
    c = np.asarray(c)
    print(f"primary closest ({time.time()-t0:.0f}s): n={n}")
    for k in (4, 8, 12, 16, 20, 24, 32, 48, 64, iters - 1):
        print(f"  alive@{k:3d}: {c[k]/n:8.4%}")

    # real first-hit points -> 3-light shadow wavefront (renderer order)
    res = jax.jit(lambda b, r: tw.trace_closest(b, r.origin, r.direction, inf, act, cfg))(bvh, rays)
    import raytracer_tpu.ops.intersect as intersect
    hits = jax.jit(lambda s, r, x: renderer._mesh_hits_into(s, r, x, intersect.make_miss_hits(n)))(scene, rays, res)
    neg = jnp.broadcast_to(jnp.asarray(scene.dl_neg_dir)[0], (n, 3))
    to_pl = jnp.asarray(scene.pl_pos)[0][None, :] - hits.point
    dpl = jnp.linalg.norm(to_pl, axis=1, keepdims=True)
    to_sl = jnp.asarray(scene.sl_pos)[0][None, :] - hits.point
    dsl = jnp.linalg.norm(to_sl, axis=1, keepdims=True)
    o3 = jnp.tile(hits.point, (3, 1))
    d3 = jnp.concatenate([neg, to_pl / dpl, to_sl / dsl], axis=0)
    tm = jnp.concatenate([inf, dpl[:, 0], dsl[:, 0]])
    # apply the renderer's contribution cull (renderer.py: front-facing +
    # spot cone -> zero Blinn-Phong makes the shadow result irrelevant)
    from raytracer_tpu.core import vecmath as vm
    from raytracer_tpu.render import shading
    to_cam = vm.normalize(jnp.asarray(scene.cam_pos)[None, :] - hits.point, eps=1e-20)
    c_dir = shading.directional_light(
        hits.normal, to_cam, jnp.asarray(scene.dl_colour)[0][None, :],
        jnp.asarray(scene.dl_neg_dir)[0])
    c_pl = shading.point_light(
        hits.normal, to_pl / dpl, to_cam, jnp.asarray(scene.pl_colour)[0][None, :],
        (dpl[:, 0]) ** 2)
    c_sl = shading.spot_light(
        hits.normal, to_sl / dsl, to_cam, jnp.asarray(scene.sl_colour)[0][None, :],
        (dsl[:, 0]) ** 2, jnp.asarray(scene.sl_neg_dir)[0][None, :],
        jnp.asarray(scene.sl_inner)[0], jnp.asarray(scene.sl_outer)[0])
    contrib = jnp.concatenate(
        [vm.length_squared(c) > 0 for c in (c_dir, c_pl, c_sl)])
    a3 = jnp.tile(hits.hit, 3) & contrib
    t0 = time.time()
    c = np.asarray(jax.jit(lambda b: curve(b, o3, d3, tm, a3, cfg, True, iters))(bvh))
    print(f"shadow any-hit ({time.time()-t0:.0f}s): n={3*n} active0={float(a3.mean()):.3f}")
    for k in (2, 4, 6, 8, 12, 16, 20, 24, 32, 48, 64, iters - 1):
        print(f"  alive@{k:3d}: {c[k]/(3*n):8.4%}")


if __name__ == "__main__":
    main()
