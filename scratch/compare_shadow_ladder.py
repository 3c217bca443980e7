"""A/B the shadow any-hit ladder on config3: old (default) vs scene-tuned
round-0-compacted ladder.  Reports frame time and image delta.

Usage: python scratch/compare_shadow_ladder.py [width height]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.render import renderer
from raytracer_tpu.scene import scenes
from raytracer_tpu.scene.device import ScenePacker


def run(scene, cfg, tag):
    fwd = jax.jit(lambda s: renderer.render_with_stats(s, cfg))
    t0 = time.time()
    img, stats = fwd(scene)
    m = float(img.mean())
    print(f"{tag}: compile+run {time.time()-t0:.1f}s mean={m:.6f} "
          f"incomplete={int(stats.num_incomplete)}", flush=True)
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        img, stats = fwd(scene)
        float(img.mean())
        best = min(best, time.time() - t0)
    print(f"{tag}: frame {best*1e3:.1f} ms", flush=True)
    return np.asarray(img), best


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 360
    desc, cfg_new = scenes.config3_sponza(w, h)
    scene = ScenePacker(desc, cfg_new.width, cfg_new.height).frame()
    from raytracer_tpu.config import RenderConfig
    cfg_old = cfg_new.replace(wide_rounds_any=RenderConfig.__dataclass_fields__[
        "wide_rounds_any"].default)
    img_old, t_old = run(scene, cfg_old, "old ladder")
    img_new, t_new = run(scene, cfg_new, "new ladder")
    d = np.abs(img_old - img_new)
    print(f"image delta: mean {d.mean():.2e} max {d.max():.2e}")
    print(f"speedup: {t_old/t_new:.3f}x")


if __name__ == "__main__":
    main()
