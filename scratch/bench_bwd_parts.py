"""Decompose the fwd+bwd overhead at 1080p config3: which parameter groups and
which remat policy cost what.  Same-process comparisons (PERF.md methodology).

Usage: python scratch/bench_bwd_parts.py [WIDTH HEIGHT]
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

ALL = (
    "mat_diffuse", "mat_reflection", "mat_transmittance", "mat_ior",
    "tex_data", "sky_data", "pl_pos", "pl_colour", "sl_pos", "sl_colour",
    "dl_colour", "dl_neg_dir", "cam_pos", "cam_top_left", "cam_x", "cam_y",
    "ambient",
)
NO_TEX = tuple(f for f in ALL if f not in ("tex_data", "sky_data"))
NO_CAM = tuple(f for f in ALL if not f.startswith("cam_"))
MAT_ONLY = ("mat_diffuse", "mat_reflection", "mat_transmittance")


def force(tree):
    return float(jax.tree_util.tree_leaves(tree)[0].sum())


def timeit(fn, n=3):
    out = fn()
    force(out)
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        force(fn())
        best = min(best, time.time() - t0)
    return best


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    desc, cfg = scenes.config3_sponza(w, h)
    scene = ScenePacker(desc, cfg.width, cfg.height).frame()
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    fwd = jax.jit(lambda s: renderer.render_with_stats(s, cfg))
    t = timeit(lambda: fwd(scene))
    print(f"fwd                      {t*1e3:8.1f} ms", flush=True)

    def run(tag, fields, c):
        params = extract_params(scene, fields)

        def loss_fn(p, s, tgt):
            image, _ = renderer.render_with_stats(apply_params(s, p), c)
            return image_loss(image, tgt)

        grad_fn = jax.jit(jax.grad(loss_fn))
        try:
            tb = timeit(lambda: grad_fn(params, scene, target))
            print(f"{tag:24s} {tb*1e3:8.1f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tag:24s} FAILED {type(e).__name__}: {e}", flush=True)

    run("fwd+bwd all params", ALL, cfg)
    run("fwd+bwd no checkpoint", ALL, cfg.replace(chunk_checkpoint=False))
    run("fwd+bwd no tex/sky", NO_TEX, cfg)
    run("fwd+bwd no tex", tuple(f for f in ALL if f != "tex_data"), cfg)
    run("fwd+bwd no sky", tuple(f for f in ALL if f != "sky_data"), cfg)
    run("fwd+bwd no camera", NO_CAM, cfg)
    run("fwd+bwd mat colors only", MAT_ONLY, cfg)
    run("fwd+bwd ambient only", ("ambient",), cfg)
    run("fwd+bwd pl_colour only", ("pl_colour",), cfg)


if __name__ == "__main__":
    main()
