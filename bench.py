"""Benchmark: Mrays/s/chip on the Sponza-class workload (BASELINE.json north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the fwd+bwd step (gradients of the image loss w.r.t. scene parameters)
when it compiles within the time budget; otherwise falls back to forward-only and
says so in the metric string.  The reference publishes no absolute numbers
(BASELINE.md); vs_baseline is computed against a documented estimate of the
reference on its default workload: a modest 8-core AVX2 CPU running Sponza
900x600x(1+3 bounces) at ~30 fps traces roughly 40 MRays/s total
(primary + shadow + secondary, Main.cpp:87-95 definitions).
"""

import json
import os
import signal
import sys
import time

# persistent XLA compile cache: tunnel compiles are minutes-long; repeat bench
# runs (the driver runs this every round) reuse them
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

REFERENCE_MRAYS_ESTIMATE = 40.0


class _Timeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Timeout()


def main():
    import jax
    import jax.numpy as jnp

    from raytracer_tpu.diff.train import (
        apply_params,
        extract_params,
        image_loss,
        make_accum_grad_fn,
    )
    from raytracer_tpu.render import renderer
    from raytracer_tpu.scene import scenes
    from raytracer_tpu.scene.device import ScenePacker

    width = int(os.environ.get("BENCH_WIDTH", "1920"))
    height = int(os.environ.get("BENCH_HEIGHT", "1080"))
    tris = int(os.environ.get("BENCH_TRIS", "260000"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    bwd_timeout = int(os.environ.get("BENCH_BWD_TIMEOUT", "900"))

    t0 = time.time()
    desc, cfg = scenes.config3_sponza(width, height, target_triangles=tris)
    packer = ScenePacker(desc, cfg.width, cfg.height)
    scene = packer.frame()
    print(
        f"# scene ready in {time.time() - t0:.1f}s: {desc.triangle_count} tris, "
        f"{cfg.width}x{cfg.height}, {cfg.num_bounces} bounces",
        file=sys.stderr,
    )

    # ---- forward: compile + ray accounting ----
    fwd = jax.jit(lambda s: renderer.render_with_stats(s, cfg))
    t0 = time.time()
    img, stats = fwd(scene)
    loss0 = float(img.mean())  # forces completion through the tunnel
    stats = jax.tree_util.tree_map(int, jax.device_get(stats))
    print(
        f"# fwd compile+run {time.time() - t0:.1f}s (mean {loss0:.5f}, "
        f"incomplete {stats.num_incomplete}, dropped {stats.num_dropped})",
        file=sys.stderr,
    )
    total_rays = (
        stats.num_primary + stats.num_shadow + stats.num_reflection
        + stats.num_refraction
    )

    def time_best(fn, sync):
        times = []
        for _ in range(iters):
            t0 = time.time()
            out = fn()
            sync(out)
            times.append(time.time() - t0)
        return min(times)

    fwd_s = time_best(lambda: fwd(scene), lambda o: float(o[0].mean()))
    print(f"# fwd step {fwd_s*1e3:.1f} ms", file=sys.stderr)

    # ---- fwd+bwd with a compile-time budget ----
    mode = "fwd+bwd"
    step_s = None
    try:
        params = extract_params(scene)
        target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

        # scene/target MUST be jit arguments: closed-over device arrays are baked
        # into the HLO as literal constants (~160 MB for the Sponza scene), which
        # the tunneled runtime rejects (HTTP 413)
        def loss_fn(p, s, tgt):
            image, _ = renderer.render_with_stats(apply_params(s, p), cfg)
            return image_loss(image, tgt)

        grad_fn = jax.jit(jax.value_and_grad(loss_fn))
        signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(bwd_timeout)
        t0 = time.time()
        loss, grads = grad_fn(params, scene, target)
        jax.block_until_ready(grads)
        signal.alarm(0)
        print(f"# bwd compile+run {time.time() - t0:.1f}s, loss={float(loss):.6f}",
              file=sys.stderr)
        step_s = time_best(
            lambda: grad_fn(params, scene, target),
            lambda o: jax.block_until_ready(o[1]),
        )
        print(f"# fwd+bwd step {step_s*1e3:.1f} ms", file=sys.stderr)
    except (_Timeout, Exception) as e:  # noqa: BLE001
        signal.alarm(0)
        why = "compile budget" if isinstance(e, _Timeout) else f"{type(e).__name__}: {e}"
        print(f"# in-jit bwd unavailable ({why}); trying grad accumulation",
              file=sys.stderr)
        # Host-driven chunked fwd+bwd: one O(chunk) compiled program, grads
        # accumulated over strided pixel chunks — same loss/grads, program size
        # independent of frame size (diff/train.py:make_accum_grad_fn).
        try:
            params = extract_params(scene)
            target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
            accum = make_accum_grad_fn(cfg)
            signal.signal(signal.SIGALRM, _alarm)
            signal.alarm(bwd_timeout)
            t0 = time.time()
            loss, grads, bstats = accum(params, scene, target)
            jax.block_until_ready(grads)
            signal.alarm(0)
            bstats = jax.tree_util.tree_map(int, jax.device_get(bstats))
            print(
                f"# accum bwd compile+run {time.time() - t0:.1f}s, "
                f"loss={float(loss):.6f}, incomplete {bstats.num_incomplete}, "
                f"dropped {bstats.num_dropped}",
                file=sys.stderr,
            )
            step_s = time_best(
                lambda: accum(params, scene, target),
                lambda o: jax.block_until_ready(o[1]),
            )
            print(f"# fwd+bwd(accum) step {step_s*1e3:.1f} ms", file=sys.stderr)
        except (_Timeout, Exception) as e2:  # noqa: BLE001
            signal.alarm(0)
            print(f"# accum bwd failed ({type(e2).__name__}: {e2}); forward-only",
                  file=sys.stderr)
            mode = "fwd"
            step_s = fwd_s

    mrays = total_rays / step_s / 1e6
    print(json.dumps({
        "metric": f"Mrays/s/chip {mode}, Sponza-class {height}p",
        "value": round(mrays, 3),
        "unit": "MRays/s",
        "vs_baseline": round(mrays / REFERENCE_MRAYS_ESTIMATE, 4),
    }))


if __name__ == "__main__":
    main()
