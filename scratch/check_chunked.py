import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.render import renderer
from raytracer_tpu.scene import scenes
from raytracer_tpu.scene.device import pack_scene
from raytracer_tpu.diff.train import extract_params, apply_params, image_loss

desc, cfg = scenes.config2_dielectric()
cfg = cfg.replace(width=96, height=64, num_bounces=3)
scene = pack_scene(desc, cfg.width, cfg.height)

cfg_whole = cfg.replace(traversal_chunk=1 << 20)   # one chunk
cfg_chunk = cfg.replace(traversal_chunk=1024)      # 6 chunks

img_w, st_w = jax.jit(lambda s: renderer.render_with_stats(s, cfg_whole))(scene)
img_c, st_c = jax.jit(lambda s: renderer.render_with_stats(s, cfg_chunk))(scene)
img_w, img_c = np.asarray(img_w), np.asarray(img_c)
print("max abs diff:", np.abs(img_w - img_c).max())
st_w = jax.tree_util.tree_map(int, st_w); st_c = jax.tree_util.tree_map(int, st_c)
print("stats whole:", st_w)
print("stats chunk:", st_c)

# grads through chunked path
params = extract_params(scene)
target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
def loss_fn(p, c):
    img, _ = renderer.render_with_stats(apply_params(scene, p), c)
    return image_loss(img, target)
g_w = jax.jit(jax.grad(lambda p: loss_fn(p, cfg_whole)))(params)
g_c = jax.jit(jax.grad(lambda p: loss_fn(p, cfg_chunk)))(params)
# Chunked grads at different chunk sizes agree to ~1e-7 (self-consistent); the
# whole-frame program compiles with different fusions and flips a few marginal
# shadow/hit decisions (PERF.md shadow-ray determinism note), so whole-vs-chunk
# carries a looser tolerance.
for k in g_w:
    a, b = np.asarray(g_w[k]), np.asarray(g_c[k])
    d = np.abs(a - b).max()
    scale = max(np.abs(a).max(), 1e-12)
    assert d <= 5e-3 * scale + 1e-7, (k, d, scale)
print("grads match (rel<=5e-3 whole-vs-chunk). OK")
