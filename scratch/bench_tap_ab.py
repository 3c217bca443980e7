"""Same-process A/B: anisotropic tap ladder vs full-width taps, 1080p config3."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from raytracer_tpu.diff.train import apply_params, extract_params, image_loss
from raytracer_tpu.render import renderer
from raytracer_tpu.scene import scenes
from raytracer_tpu.scene.device import ScenePacker

def force(t): return float(jax.tree_util.tree_leaves(t)[0].sum())
def timeit(fn, n=3):
    force(fn()); best=1e9
    for _ in range(n):
        t0=time.time(); force(fn()); best=min(best,time.time()-t0)
    return best

desc, cfg = scenes.config3_sponza(1920, 1080)
scene = ScenePacker(desc, cfg.width, cfg.height).frame()
params = extract_params(scene)
target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
for tag, c in (("ladder", cfg), ("full", cfg.replace(aniso_tap_fracs=None))):
    fwd = jax.jit(lambda s, c=c: renderer.render_with_stats(s, c))
    t = timeit(lambda: fwd(scene))
    def loss_fn(p, s, tgt, c=c):
        img, st = renderer.render_with_stats(apply_params(s, p), c)
        return image_loss(img, tgt), st
    gf = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    (l,st),g = gf(params, scene, target)
    tb = timeit(lambda: gf(params, scene, target))
    print(f"{tag:6s} fwd {t*1e3:7.1f} ms  fwd+bwd {tb*1e3:7.1f} ms  "
          f"incomplete {int(st.num_incomplete)}", flush=True)
