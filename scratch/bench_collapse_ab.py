"""Same-process A/B on chip: greedy vs SAH-DP wide collapse, full-frame fwd.

The isolated ns/ray microbench can't see ladder interactions; the full 1080p
config3 fwd frame is the deciding metric (same scene arrays except the wide
records; same ladders)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import raytracer_tpu.accel.wide as wide_mod
from raytracer_tpu.render import renderer
from raytracer_tpu.scene import scenes
from raytracer_tpu.scene.device import ScenePacker

def force(t): return float(jax.tree_util.tree_leaves(t)[0].sum())
def timeit(fn, n=3):
    force(fn()); best=1e9
    for _ in range(n):
        t0=time.time(); force(fn()); best=min(best,time.time()-t0)
    return best

orig = wide_mod.collapse8
import raytracer_tpu.accel.blas as B
orig_hash = B._mesh_hash
for strat in ("sah", "greedy"):
    wide_mod.collapse8 = lambda *a, **k: orig(*a, **{**k, "strategy": strat})
    B._mesh_hash = lambda m, a, s=strat: orig_hash(m, a) + "-" + s
    desc, cfg = scenes.config3_sponza(1920, 1080)
    B.clear_cache()
    scene = ScenePacker(desc, cfg.width, cfg.height, ).frame()
    fwd = jax.jit(lambda s, c=cfg: renderer.render_with_stats(s, c))
    img, st = fwd(scene)
    t = timeit(lambda: fwd(scene))
    print(f"{strat:6s} fwd {t*1e3:7.1f} ms  incomplete {int(st.num_incomplete)} "
          f"mean {float(img.mean()):.5f}", flush=True)
