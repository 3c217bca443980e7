"""Same-process fwd vs fwd+bwd timing at 1080p config3: itemizes the bwd
overhead the checkpoint-residual policy is meant to shrink.

Usage: python scratch/bench_fwd_bwd_split.py [WIDTH HEIGHT [ITERS]]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytracer_tpu.diff.train import apply_params, extract_params, image_loss
from raytracer_tpu.render import renderer
from raytracer_tpu.scene import scenes
from raytracer_tpu.scene.device import ScenePacker


def force(tree):
    return float(jax.tree_util.tree_leaves(tree)[0].sum())


def timeit(fn, *args, n=3):
    out = fn(*args)
    force(out)
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        force(out)
        best = min(best, time.time() - t0)
    return best


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    desc, cfg = scenes.config3_sponza(w, h)
    scene = ScenePacker(desc, cfg.width, cfg.height).frame()
    params = extract_params(scene)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    fwd = jax.jit(lambda s: renderer.render_with_stats(s, cfg))
    t_fwd = timeit(fwd, scene, n=n)
    print(f"fwd            {t_fwd*1e3:8.1f} ms", flush=True)

    def loss_fn(p, s, tgt):
        image, stats = renderer.render_with_stats(apply_params(s, p), cfg)
        return image_loss(image, tgt), stats

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    t_bwd = timeit(lambda: grad_fn(params, scene, target), n=n)
    print(f"fwd+bwd        {t_bwd*1e3:8.1f} ms  (overhead {1e3*(t_bwd-t_fwd):.1f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
