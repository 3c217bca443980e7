"""Benchmark: Mrays/s/chip fwd+bwd on the Sponza-class workload (BASELINE.json north
star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no absolute numbers (BASELINE.md); vs_baseline is computed
against a documented estimate of the reference on its default workload: a modest
8-core AVX2 CPU running Sponza 900x600x(1+3 bounces) at ~30 fps traces roughly
40 MRays/s total (primary + shadow + secondary, Main.cpp:87-95 definitions).
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_MRAYS_ESTIMATE = 40.0

# Keep the real chip for the benchmark; never steal it for scene prep.
os.environ.setdefault("XLA_FLAGS", "")


def main():
    import jax
    import jax.numpy as jnp

    from raytracer_tpu.diff.train import (
        apply_params,
        extract_params,
        image_loss,
    )
    from raytracer_tpu.render import renderer
    from raytracer_tpu.scene import scenes
    from raytracer_tpu.scene.device import ScenePacker

    width = int(os.environ.get("BENCH_WIDTH", "1920"))
    height = int(os.environ.get("BENCH_HEIGHT", "1080"))
    tris = int(os.environ.get("BENCH_TRIS", "260000"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))

    t0 = time.time()
    desc, cfg = scenes.config3_sponza(width, height, target_triangles=tris)
    packer = ScenePacker(desc, cfg.width, cfg.height)
    scene = packer.frame()
    build_s = time.time() - t0
    print(f"# scene ready in {build_s:.1f}s: {desc.triangle_count} tris, "
          f"{cfg.width}x{cfg.height}, {cfg.num_bounces} bounces", file=sys.stderr)

    # fwd+bwd: gradient of the image loss w.r.t. scene parameters
    params = extract_params(scene)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    def loss_fn(p):
        img, _ = renderer.render_with_stats(apply_params(scene, p), cfg)
        return image_loss(img, target)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    stats_fn = jax.jit(lambda s: renderer.render_with_stats(s, cfg)[1])

    # compile + ray accounting
    t0 = time.time()
    stats = jax.tree_util.tree_map(int, jax.device_get(stats_fn(scene)))
    loss, grads = grad_fn(params)
    jax.block_until_ready(grads)
    print(f"# compile+first-run {time.time() - t0:.1f}s, loss={float(loss):.5f}",
          file=sys.stderr)

    total_rays = (
        stats.num_primary + stats.num_shadow + stats.num_reflection
        + stats.num_refraction
    )

    times = []
    for _ in range(iters):
        t0 = time.time()
        loss, grads = grad_fn(params)
        jax.block_until_ready(grads)
        times.append(time.time() - t0)
    step_s = min(times)

    mrays = total_rays / step_s / 1e6
    print(f"# fwd+bwd step {step_s*1e3:.1f} ms, {total_rays} rays "
          f"({stats.num_primary} primary / {stats.num_shadow} shadow / "
          f"{stats.num_reflection} refl / {stats.num_refraction} refr)",
          file=sys.stderr)

    print(json.dumps({
        "metric": "Mrays/s/chip fwd+bwd, Sponza-class 1080p",
        "value": round(mrays, 2),
        "unit": "MRays/s",
        "vs_baseline": round(mrays / REFERENCE_MRAYS_ESTIMATE, 3),
    }))


if __name__ == "__main__":
    main()
