"""Quantify shadow-ray marginality (VERDICT #9): how much do the ~9% any-hit
decision flips between differently-shaped compiled programs move final pixel
values, and does a normal-offset shadow origin (config.shadow_normal_offset)
de-marginalize them?

Two program shapes: the scene-tuned compacted ladder vs one exhaustive
(1.0, 64) round — internally each is deterministic; differences are pure
f32-marginality (PERF.md 'Shadow-ray determinism note').

Usage: python scratch/shadow_marginality.py [width height]
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

from raytracer_tpu.config import RAY_EPSILON
from raytracer_tpu.ops import traversal_wide as tw
from raytracer_tpu.render import renderer
from raytracer_tpu.scene import scenes
from raytracer_tpu.scene.device import ScenePacker


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 360
    desc, cfg = scenes.config3_sponza(w, h)
    scene = ScenePacker(desc, cfg.width, cfg.height).frame()
    n = cfg.num_pixels
    cfg_exh = cfg.replace(wide_rounds_any=((1.0, 64),))

    # ---- mask-level flip rate on the real gen-0 shadow wavefront ----
    pix = jnp.arange(n, dtype=jnp.int32)
    rays = jax.jit(lambda s: renderer.primary_rays_for(s, cfg, pix))(scene)
    bvh = jax.jit(tw.build_scene_bvh)(scene)
    inf = jnp.full((n,), jnp.inf, jnp.float32)
    act = jnp.ones((n,), bool)
    res = jax.jit(lambda b, r: tw.trace_closest(b, r.origin, r.direction, inf, act, cfg))(bvh, rays)
    import raytracer_tpu.ops.intersect as intersect
    hits = jax.jit(lambda s, r, x: renderer._mesh_hits_into(
        s, r, x, intersect.make_miss_hits(n)))(scene, rays, res)

    neg = jnp.broadcast_to(jnp.asarray(scene.dl_neg_dir)[0], (n, 3))
    to_pl = jnp.asarray(scene.pl_pos)[0][None, :] - hits.point
    dpl = jnp.linalg.norm(to_pl, axis=1, keepdims=True)
    d3 = jnp.concatenate([neg, to_pl / dpl], axis=0)
    tm = jnp.concatenate([inf, dpl[:, 0]])
    a2 = jnp.tile(hits.hit, 2)

    for off, tag in ((0.0, "on-surface origins"),
                     (RAY_EPSILON, f"normal-offset {RAY_EPSILON}")):
        o3 = jnp.tile(hits.point + off * hits.normal, (2, 1))
        f_lad = jax.jit(lambda b, o, d, t, a: tw.trace_any(b, o, d, t, a, cfg))
        f_exh = jax.jit(lambda b, o, d, t, a: tw.trace_any(b, o, d, t, a, cfg_exh))
        m1 = np.asarray(f_lad(bvh, o3, d3, tm, a2))
        m2 = np.asarray(f_exh(bvh, o3, d3, tm, a2))
        na = int(np.asarray(a2).sum())
        flips = int((m1 != m2)[np.asarray(a2)].sum())
        print(f"{tag}: flip rate {flips}/{na} = {flips/na:.4%}", flush=True)

    # ---- image-level impact ----
    for off, tag in ((0.0, "on-surface"), (RAY_EPSILON, "offset")):
        ca, cb = (c.replace(shadow_normal_offset=off) for c in (cfg, cfg_exh))
        img_a = np.asarray(jax.jit(lambda s: renderer.render_with_stats(s, ca))(scene)[0])
        img_b = np.asarray(jax.jit(lambda s: renderer.render_with_stats(s, cb))(scene)[0])
        d = np.abs(img_a - img_b)
        print(f"{tag}: image |delta| mean {d.mean():.3e} max {d.max():.3e} "
              f"frac>1e-3 {(d > 1e-3).mean():.4%}", flush=True)
    # cross-check: offset-vs-onsurface bias under ONE program shape
    img_0 = np.asarray(jax.jit(
        lambda s: renderer.render_with_stats(s, cfg))(scene)[0])
    img_o = np.asarray(jax.jit(lambda s: renderer.render_with_stats(
        s, cfg.replace(shadow_normal_offset=RAY_EPSILON)))(scene)[0])
    d = np.abs(img_0 - img_o)
    print(f"offset bias vs on-surface (same program): mean {d.mean():.3e} "
          f"max {d.max():.3e}")


if __name__ == "__main__":
    main()
