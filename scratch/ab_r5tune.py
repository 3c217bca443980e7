"""Same-process A/B: round-4 config3 knobs vs round-5 retune candidates."""
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
params = extract_params(scene)

def force(t): return float(jax.tree_util.tree_leaves(t)[0].sum())

def timeit(fn, n=3):
    force(fn()); best = 1e9
    for _ in range(n):
        t0 = time.time(); force(fn()); best = min(best, time.time() - t0)
    return best

VARIANTS = {
    "r4 knobs (3/32, tail192x96, ckpt)": cfg.replace(
        queue_factor=(0.09375,), chunk_checkpoint=True,
        wide_rounds_any=((0.55, 8), (0.25, 8), (1.0/24, 16), (1.0/192, 96))),
    "r5 as committed (0.08, tail320x72, nockpt)": cfg,
    "r5b 128-mult queue (0.078125)": cfg.replace(queue_factor=(0.078125,)),
    "r5c queue only (3/32, tail320x72, nockpt)": cfg.replace(queue_factor=(0.09375,)),
}
for tag, c in VARIANTS.items():
    def loss_fn(p, s, tgt, c=c):
        image, stats = renderer.render_with_stats(apply_params(s, p), c)
        return image_loss(image, tgt), stats
    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    out = grad_fn(params, scene, target)
    stats = out[0][1]
    t = timeit(lambda: grad_fn(params, scene, target))
    print(f"{tag:45s} {t*1e3:8.1f} ms  dropped {int(stats.num_dropped)} "
          f"incomplete {int(stats.num_incomplete)}", flush=True)
