"""Chunk-size A/B under the round-5 unrolled pipeline (2^16 was tuned under
the scan body, round 4)."""
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

for chunk in (1 << 16, 1 << 17, 1 << 15):
    c = cfg.replace(traversal_chunk=chunk)
    def loss_fn(p, s, tgt, c=c):
        image, stats = renderer.render_with_stats(apply_params(s, p), c)
        return image_loss(image, tgt), stats
    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    out = grad_fn(params, scene, target); force(out)
    stats = out[0][1]
    t = timeit(lambda: grad_fn(params, scene, target))
    print(f"chunk 2^{chunk.bit_length()-1}: {t*1e3:8.1f} ms  dropped "
          f"{int(stats.num_dropped)} incomplete {int(stats.num_incomplete)}",
          flush=True)
