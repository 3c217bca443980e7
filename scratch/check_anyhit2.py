"""Drill into the Sponza-scale any-hit disagreement: determinism check + CPU
ground truth on the disagreeing rays."""
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


w, h = 960, 540
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
o1 = np.asarray(hits.point)
d1 = np.asarray(neg)
a1 = np.asarray(hits.hit)
t1 = np.full((n,), np.inf, np.float32)

ladders = [
    ("new", cfg.wide_rounds_any),
    ("new2", cfg.wide_rounds_any),  # determinism probe
    ("exhaustive", ((1.0, 256),)),
]
found = {}
for name, rounds in ladders:
    c = dataclasses.replace(cfg, wide_rounds_any=rounds)
    f = jax.jit(
        lambda b, cc=c: _ta(
            b, jnp.asarray(o1), jnp.asarray(d1), jnp.asarray(t1), jnp.asarray(a1), cc
        )
    )(bvh)
    found[name] = np.asarray(f)
    print(f"{name:11s}: found={int(found[name].sum())}", flush=True)
print("new vs new2 :", int((found["new"] != found["new2"]).sum()))
dis = np.where(found["new"] != found["exhaustive"])[0]
print("new vs exh  :", len(dis))

# CPU ground truth on a subset of disagreeing rays
sub = dis[:2048] if len(dis) else np.arange(2048)
np.savez(
    "/tmp/anyhit_case.npz",
    o=o1[sub], d=d1[sub], t=t1[sub], a=a1[sub],
    f_new=found["new"][sub], f_exh=found["exhaustive"][sub],
)
print("saved", len(sub), "rays to /tmp/anyhit_case.npz")
