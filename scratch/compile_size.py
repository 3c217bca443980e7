"""Measure lowering/compile cost of the 1080p chunk program (CPU backend proxy).

The tunnel server's TPU compile time scales with program size; the local CPU
backend compile of the SAME stablehlo is a fast, queue-free proxy for A/Bs.

Usage: python scratch/compile_size.py [fwd|grad] [scan|noscan] [unroll]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from raytracer_tpu.diff.train import apply_params, extract_params, image_loss
from raytracer_tpu.render import renderer
from raytracer_tpu.scene import scenes
from raytracer_tpu.scene.device import ScenePacker

mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
scan = (sys.argv[2] if len(sys.argv) > 2 else "scan") == "scan"
unroll = int(sys.argv[3]) if len(sys.argv) > 3 else 2

W, H = 1920, 1080
desc, cfg = scenes.config3_sponza(W, H, target_triangles=260000)
cfg = cfg.replace(scan_bounces=scan, traversal_unroll=unroll)
packer = ScenePacker(desc, cfg.width, cfg.height)
scene = packer.frame()
print(f"# scene ready: {desc.triangle_count} tris; mode={mode} scan={scan} "
      f"unroll={unroll}", file=sys.stderr)

if mode == "fwd":
    fn = jax.jit(lambda s: renderer.render_with_stats(s, cfg))
    args = (scene,)
else:
    params = extract_params(scene)
    target = jnp.zeros((H, W, 3), jnp.float32)

    def loss_fn(p, s, tgt):
        image, stats = renderer.render_with_stats(apply_params(s, p), cfg)
        return image_loss(image, tgt), stats

    fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    args = (params, scene, target)

t0 = time.time()
low = fn.lower(*args)
t1 = time.time()
txt = low.as_text()
nops = txt.count("\n")
t2 = time.time()
comp = low.compile()
t3 = time.time()
print(f"lower {t1-t0:.1f}s  stablehlo {len(txt)/1e6:.1f} MB / {nops} lines  "
      f"cpu-compile {t3-t2:.1f}s")
