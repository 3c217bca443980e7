"""Time the in-jit Sponza-1080p fwd+bwd step (the bench.py headline path),
isolating the effect of the save-named-traversal checkpoint policy.

Usage: python scratch/bench_bwd.py [WIDTH HEIGHT [CHUNK_LOG2]]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp

from raytracer_tpu.diff.train import apply_params, extract_params, image_loss
from raytracer_tpu.render import renderer
from raytracer_tpu.scene import scenes
from raytracer_tpu.scene.device import ScenePacker


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    desc, cfg = scenes.config3_sponza(w, h)
    if len(sys.argv) > 3:
        cfg = cfg.replace(traversal_chunk=1 << int(sys.argv[3]))
    scene = ScenePacker(desc, cfg.width, cfg.height).frame()
    params = extract_params(scene)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    def loss_fn(p, s, tgt):
        image, stats = renderer.render_with_stats(apply_params(s, p), cfg)
        return image_loss(image, tgt), stats

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    t0 = time.time()
    (loss, stats), grads = grad_fn(params, scene, target)
    jax.block_until_ready(grads)
    print(f"bwd compile+run {time.time()-t0:.1f}s loss={float(loss):.6f} "
          f"incomplete={int(stats.num_incomplete)}", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out = grad_fn(params, scene, target)
        jax.block_until_ready(out[1])
        best = min(best, time.time() - t0)
    print(f"fwd+bwd step {best*1e3:.1f} ms (chunk=2^{cfg.traversal_chunk.bit_length()-1})",
          flush=True)


if __name__ == "__main__":
    main()
