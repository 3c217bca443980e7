"""Isolate the bwd-machinery floor: grad w.r.t. a single scalar/vector param
(no scatters, no heavy VJP chains) at 1080p config3."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from raytracer_tpu.diff.train import apply_params, extract_params, image_loss
from raytracer_tpu.render import renderer
from raytracer_tpu.scene import scenes
from raytracer_tpu.scene.device import ScenePacker

desc, cfg = scenes.config3_sponza(1920, 1080)
scene = ScenePacker(desc, cfg.width, cfg.height).frame()
target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

def force(t): return float(jax.tree_util.tree_leaves(t)[0].sum())

def timeit(fn, n=3):
    force(fn()); best = 1e9
    for _ in range(n):
        t0 = time.time(); force(fn()); best = min(best, time.time() - t0)
    return best

fwd = jax.jit(lambda s: renderer.render_with_stats(s, cfg))
print(f"fwd                      {timeit(lambda: fwd(scene))*1e3:8.1f} ms", flush=True)

for tag, fields in (("ambient only", ("ambient",)),
                    ("pl_colour only", ("pl_colour",)),
                    ("cam_pos only", ("cam_pos",)),
                    ("mat_diffuse only", ("mat_diffuse",))):
    params = extract_params(scene, fields)
    def loss_fn(p, s, tgt):
        image, _ = renderer.render_with_stats(apply_params(s, p), cfg)
        return image_loss(image, tgt)
    grad_fn = jax.jit(jax.grad(loss_fn))
    t = timeit(lambda: grad_fn(params, scene, target))
    print(f"fwd+bwd {tag:17s}{t*1e3:8.1f} ms", flush=True)
