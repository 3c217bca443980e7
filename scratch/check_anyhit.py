"""Validate the any-hit ladder against an exhaustive 256-iteration reference:
count found-mask disagreements (truncation = shadow light leaks)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".cache/jax")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.ops import traversal_wide as tw
from raytracer_tpu.render import renderer
from raytracer_tpu.scene import scenes
from raytracer_tpu.scene.device import ScenePacker
import raytracer_tpu.ops.intersect as intersect

w, h = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (960, 540)
desc, cfg = scenes.config3_sponza(w, h)
scene = ScenePacker(desc, w, h).frame()
n = cfg.num_pixels
pix = jnp.arange(n, dtype=jnp.int32)
rays = jax.jit(lambda s: renderer.primary_rays_for(s, cfg, pix))(scene)
bvh = jax.jit(tw.build_scene_bvh)(scene)
inf = jnp.full((n,), jnp.inf, jnp.float32)
act = jnp.ones((n,), bool)
res = jax.jit(lambda b, r: tw.trace_closest(b, r.origin, r.direction, inf, act, cfg))(bvh, rays)
hits = jax.jit(lambda s, r, x: renderer._mesh_hits_into(s, r, x, intersect.make_miss_hits(n)))(scene, rays, res)

neg = jnp.broadcast_to(jnp.asarray(scene.dl_neg_dir)[0], (n, 3))
to_pl = jnp.asarray(scene.pl_pos)[0][None, :] - hits.point
dpl = jnp.linalg.norm(to_pl, axis=1, keepdims=True)
to_sl = jnp.asarray(scene.sl_pos)[0][None, :] - hits.point
dsl = jnp.linalg.norm(to_sl, axis=1, keepdims=True)
o3 = jnp.tile(hits.point, (3, 1))
d3 = jnp.concatenate([neg, to_pl / dpl, to_sl / dsl], axis=0)
tm = jnp.concatenate([inf, dpl[:, 0], dsl[:, 0]])
a3 = jnp.tile(hits.hit, 3)

ladders = {
    "new": cfg.wide_rounds_any,
    "old": cfg.wide_rounds,
    "exhaustive": ((1.0, 256),),
}
found = {}
for name, rounds in ladders.items():
    c = dataclasses.replace(cfg, wide_rounds_any=rounds)
    f = jax.jit(lambda b, cc=c: tw.trace_any(b, o3, d3, tm, a3, cc)[0])(bvh)
    found[name] = np.asarray(f)
    print(f"{name:11s}: found={int(found[name].sum())}")
for name in ("new", "old"):
    diff = int((found[name] != found["exhaustive"]).sum())
    print(f"{name} vs exhaustive: {diff} disagreements of {3*n}")
