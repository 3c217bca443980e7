"""Is the any-hit disagreement recompilation numerics or a state bug?

Runs the SAME shadow rays through the exhaustive ladder at two different wavefront
paddings (518400 vs +128 dummy rays).  Per-lane state evolution is identical in
exact arithmetic; any flips are shape-dependent codegen rounding on marginal rays.
Also counts global CPU-vs-TPU exhaustive flips.
"""
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

def _ta(*a, **k):
    """trace_any returning just the mask (API now returns (found, incomplete))."""
    import raytracer_tpu.ops.traversal_wide as _twm
    return _twm.trace_any(*a, **k)[0]


desc, cfg = scenes.config3_sponza(960, 540)
scene = ScenePacker(desc, 960, 540).frame()
n = cfg.num_pixels
pix = jnp.arange(n, dtype=jnp.int32)
rays = jax.jit(lambda s: renderer.primary_rays_for(s, cfg, pix))(scene)
bvh = jax.jit(tw.build_scene_bvh)(scene)
inf = jnp.full((n,), jnp.inf, jnp.float32)
act = jnp.ones((n,), bool)
res = jax.jit(lambda b, r: tw.trace_closest(b, r.origin, r.direction, inf, act, cfg))(bvh, rays)
hits = jax.jit(lambda s, r, x: renderer._mesh_hits_into(s, r, x, intersect.make_miss_hits(n)))(scene, rays, res)

neg = jnp.broadcast_to(jnp.asarray(scene.dl_neg_dir)[0], (n, 3))
o = np.asarray(hits.point)
d = np.asarray(neg)
a = np.asarray(hits.hit)
t = np.full((n,), np.inf, np.float32)

c = dataclasses.replace(cfg, wide_rounds_any=((1.0, 256),))

f1 = np.asarray(jax.jit(lambda b: _ta(
    b, jnp.asarray(o), jnp.asarray(d), jnp.asarray(t), jnp.asarray(a), c))(bvh))

pad = 128
op = np.concatenate([o, np.zeros((pad, 3), np.float32)])
dp = np.concatenate([d, np.ones((pad, 3), np.float32)])
tp = np.concatenate([t, np.zeros((pad,), np.float32)])
ap = np.concatenate([a, np.zeros((pad,), bool)])
f2 = np.asarray(jax.jit(lambda b: _ta(
    b, jnp.asarray(op), jnp.asarray(dp), jnp.asarray(tp), jnp.asarray(ap), c))(bvh))[:n]
print(f"exhaustive padded-vs-not flips: {int((f1 != f2).sum())} of {n}", flush=True)

# CPU ground truth on the full set (chunked to bound memory)
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    fc = []
    chunk = 1 << 16
    fn = jax.jit(lambda b, oo, dd, tt, aa: _ta(b, oo, dd, tt, aa, c))
    bvh_c = jax.device_put(bvh, cpu)
    for i in range(0, n, chunk):
        fc.append(np.asarray(fn(
            bvh_c,
            jax.device_put(jnp.asarray(o[i:i+chunk]), cpu),
            jax.device_put(jnp.asarray(d[i:i+chunk]), cpu),
            jax.device_put(jnp.asarray(t[i:i+chunk]), cpu),
            jax.device_put(jnp.asarray(a[i:i+chunk]), cpu),
        )))
    fc = np.concatenate(fc)
print(f"CPU found={int(fc.sum())}  TPU exh found={int(f1.sum())}")
print(f"CPU vs TPU exhaustive flips: {int((fc != f1).sum())} of {n}")
