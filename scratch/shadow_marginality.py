"""Quantify shadow-ray marginality (VERDICT #9) with the established
padded-vs-unpadded methodology (scratch/check_anyhit3.py): the SAME culled
shadow wavefront traced by two differently-shaped compiled programs (+128 dummy
rays changes XLA's fusion/contraction choices); per-lane evolution is identical
in exact arithmetic, so any decision flips are f32 marginality of on-surface
origins.  Measures:

  1. flip rate with on-surface origins (reference semantics, Ray.h:5);
  2. flip rate with normal-offset origins (cfg.shadow_normal_offset);
  3. the radiance-weighted image impact of the flips: what fraction of the
     direct-lighting energy sits on flipped lanes (the upper bound of the
     cross-program image error these flips can cause, e.g. CPU vs TPU parity);
  4. the image bias the offset itself introduces under ONE program shape.

Note (measured earlier, kept for the record): ladder-vs-exhaustive comparisons
show ZERO flips — per-lane traversal is compaction/round-structure-invariant, so
the straggler ladder is not a source of nondeterminism.

Usage: python scratch/shadow_marginality.py [width height]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.config import RAY_EPSILON
from raytracer_tpu.core import vecmath as vm
from raytracer_tpu.ops import traversal_wide as tw
from raytracer_tpu.render import renderer, shading
from raytracer_tpu.scene import scenes
from raytracer_tpu.scene.device import ScenePacker
import raytracer_tpu.ops.intersect as intersect


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 360
    desc, cfg = scenes.config3_sponza(w, h)
    scene = ScenePacker(desc, cfg.width, cfg.height).frame()
    n = cfg.num_pixels
    cfg_exh = cfg.replace(wide_rounds_any=((1.0, 256),))

    pix = jnp.arange(n, dtype=jnp.int32)
    rays = jax.jit(lambda s: renderer.primary_rays_for(s, cfg, pix))(scene)
    bvh = jax.jit(tw.build_scene_bvh)(scene)
    inf = jnp.full((n,), jnp.inf, jnp.float32)
    act = jnp.ones((n,), bool)
    res = jax.jit(lambda b, r: tw.trace_closest(
        b, r.origin, r.direction, inf, act, cfg))(bvh, rays)
    hits = jax.jit(lambda s, r, x: renderer._mesh_hits_into(
        s, r, x, intersect.make_miss_hits(n)))(scene, rays, res)

    # the renderer's real culled gen-0 shadow wavefront, all 3 lights
    to_cam = vm.normalize(jnp.asarray(scene.cam_pos)[None, :] - hits.point,
                          eps=1e-20)
    neg = jnp.broadcast_to(jnp.asarray(scene.dl_neg_dir)[0], (n, 3))
    to_pl = jnp.asarray(scene.pl_pos)[0][None, :] - hits.point
    dpl = jnp.linalg.norm(to_pl, axis=1, keepdims=True)
    to_sl = jnp.asarray(scene.sl_pos)[0][None, :] - hits.point
    dsl = jnp.linalg.norm(to_sl, axis=1, keepdims=True)
    c_dir = shading.directional_light(
        hits.normal, to_cam, jnp.asarray(scene.dl_colour)[0][None, :],
        jnp.asarray(scene.dl_neg_dir)[0])
    c_pl = shading.point_light(hits.normal, to_pl / dpl, to_cam,
                               jnp.asarray(scene.pl_colour)[0][None, :],
                               dpl[:, 0] ** 2)
    c_sl = shading.spot_light(hits.normal, to_sl / dsl, to_cam,
                              jnp.asarray(scene.sl_colour)[0][None, :],
                              dsl[:, 0] ** 2,
                              jnp.asarray(scene.sl_neg_dir)[0][None, :],
                              jnp.asarray(scene.sl_inner)[0],
                              jnp.asarray(scene.sl_outer)[0])
    contrib = jnp.concatenate([c_dir, c_pl, c_sl], axis=0)  # [3N,3]
    cmask = vm.length_squared(contrib) > 0
    d3 = np.asarray(jnp.concatenate([neg, to_pl / dpl, to_sl / dsl], axis=0))
    tm = np.asarray(jnp.concatenate([inf, dpl[:, 0], dsl[:, 0]]))
    a3 = np.asarray(jnp.tile(hits.hit, 3) & cmask)
    contrib = np.asarray(contrib)
    nrm3 = np.asarray(jnp.tile(hits.normal, (3, 1)))
    pt3 = np.asarray(jnp.tile(hits.point, (3, 1)))
    na = int(a3.sum())

    def flips(o):
        f = jax.jit(lambda b, o_, d_, t_, a_: tw.trace_any(
            b, o_, d_, t_, a_, cfg_exh))
        m1 = np.asarray(f(bvh, jnp.asarray(o), jnp.asarray(d3),
                          jnp.asarray(tm), jnp.asarray(a3))[0])
        pad = 128
        op = np.concatenate([o, np.zeros((pad, 3), np.float32)])
        dp_ = np.concatenate([d3, np.ones((pad, 3), np.float32)])
        tp = np.concatenate([tm, np.zeros((pad,), np.float32)])
        ap = np.concatenate([a3, np.zeros((pad,), bool)])
        m2 = np.asarray(f(bvh, jnp.asarray(op), jnp.asarray(dp_),
                          jnp.asarray(tp), jnp.asarray(ap))[0])[:len(a3)]
        fl = (m1 != m2) & a3
        # radiance-weighted: energy of flipped lanes vs all potentially-lit lanes
        e_fl = float(np.abs(contrib[fl]).sum())
        e_all = float(np.abs(contrib[a3]).sum())
        return int(fl.sum()), e_fl / e_all

    k0, e0 = flips(pt3.astype(np.float32))
    print(f"on-surface: flips {k0}/{na} = {k0/na:.4%}, "
          f"radiance-weighted impact {e0:.4%}", flush=True)
    ko, eo = flips((pt3 + RAY_EPSILON * nrm3).astype(np.float32))
    print(f"offset {RAY_EPSILON}: flips {ko}/{na} = {ko/na:.4%}, "
          f"radiance-weighted impact {eo:.4%}", flush=True)

    # bias the offset itself introduces (one program shape, full render)
    img_0 = np.asarray(jax.jit(
        lambda s: renderer.render_with_stats(s, cfg))(scene)[0])
    img_o = np.asarray(jax.jit(lambda s: renderer.render_with_stats(
        s, cfg.replace(shadow_normal_offset=RAY_EPSILON)))(scene)[0])
    d = np.abs(img_0 - img_o)
    print(f"offset bias vs on-surface (same program): mean {d.mean():.3e} "
          f"max {d.max():.3e} frac>1e-3 {(d > 1e-3).mean():.4%}")


if __name__ == "__main__":
    main()
