"""A/B traversal_chunk at 1080p: per-chunk fixed costs (ladder/queue argsorts,
queue machinery) scale with chunk COUNT, so fewer/larger chunks may win as long
as the program stays under the tunnel's upload ceiling.

Usage: python scratch/bench_chunk_size.py [chunk_log2 ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import numpy as np

from raytracer_tpu.render import renderer
from raytracer_tpu.scene import scenes
from raytracer_tpu.scene.device import ScenePacker


def main():
    logs = [int(a) for a in sys.argv[1:]] or [17, 18, 19]
    desc, cfg0 = scenes.config3_sponza(1920, 1080)
    scene = ScenePacker(desc, cfg0.width, cfg0.height).frame()
    for lg in logs:
        cfg = cfg0.replace(traversal_chunk=1 << lg)
        f = jax.jit(lambda s, c=cfg: renderer.render_with_stats(s, c))
        t0 = time.time()
        img, st = f(scene)
        m = float(img.mean())
        print(f"chunk 2^{lg}: compile+run {time.time()-t0:.1f}s mean={m:.6f} "
              f"incomplete={int(st.num_incomplete)}", flush=True)
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            img, _ = f(scene)
            float(img.mean())
            best = min(best, time.time() - t0)
        print(f"chunk 2^{lg}: frame {best*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
