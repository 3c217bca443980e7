"""A/B the scan-bounces path vs per-bounce unrolled path at 1080p on chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytracer_tpu.render import renderer
from raytracer_tpu.scene import scenes
from raytracer_tpu.scene.device import ScenePacker

W, H = int(os.environ.get("W", "1920")), int(os.environ.get("He", "1080"))
desc, cfg0 = scenes.config3_sponza(W, H, target_triangles=260000)
packer = ScenePacker(desc, cfg0.width, cfg0.height)
scene = packer.frame()

for name, cfg in [
    ("scan", cfg0.replace(scan_bounces=True)),
    ("noscan", cfg0.replace(scan_bounces=False)),
]:
    fwd = jax.jit(lambda s, cfg=cfg: renderer.render_with_stats(s, cfg))
    t0 = time.time()
    img, st = fwd(scene)
    m = float(img.mean())
    print(f"{name}: compile+run {time.time()-t0:.1f}s mean {m:.5f}", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        img, st = fwd(scene)
        m = float(img.mean())
        best = min(best, time.time() - t0)
    st = jax.tree_util.tree_map(int, jax.device_get(st))
    print(f"{name}: fwd step {best*1e3:.1f} ms  mean {m:.5f} "
          f"incomplete {st.num_incomplete} dropped {st.num_dropped}", flush=True)
