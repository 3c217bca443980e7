"""Benchmark: Mrays/s/chip on the Sponza-class workload (BASELINE.json north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} — ALWAYS, even
under a driver timeout: a watchdog thread hard-emits the best result known so
far when the wall-clock deadline (BENCH_DEADLINE_S, default 22 min) expires.
The tunnel's TPU compiles happen server-side at first execution and are queued
behind other tenants (measured 0.5 s .. 19 min for the SAME program — PERF.md
round 3), so no local timeout can bound them; the deadline + the build-round
prewarm of the server compile cache (tools/warm_bench.py) are the mitigation.

Measures the fwd+bwd step (gradients of the image loss w.r.t. scene parameters)
as ONE jitted value_and_grad program with the rendered image + ray stats as aux
(one server compile total).  Falls back to host-driven gradient accumulation,
then to forward-only, if the primary program fails.  The reference publishes no
absolute numbers (BASELINE.md); vs_baseline is computed against a documented
estimate of the reference on its default workload: a modest 8-core AVX2 CPU
running Sponza 900x600x(1+3 bounces) at ~30 fps traces roughly 40 MRays/s total
(primary + shadow + secondary, Main.cpp:87-95 definitions).
"""

import hashlib
import glob
import json
import os
import signal
import sys
import threading
import time

START = time.time()
DEADLINE = float(os.environ.get("BENCH_DEADLINE_S", "1320"))
REFERENCE_MRAYS_ESTIMATE = 40.0
LAST_GOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_last.json")


def _fingerprint():
    """Hash of every source file AND the resolved workload parameters that
    shape the benched programs: the cached deadline-fallback measurement is
    only valid for the exact code and workload it was measured on."""
    h = hashlib.sha256()
    root = os.path.dirname(os.path.abspath(__file__))
    files = sorted(glob.glob(os.path.join(root, "raytracer_tpu", "**", "*.py"),
                             recursive=True))
    files.append(os.path.abspath(__file__))
    for f in files:
        h.update(f.encode())
        with open(f, "rb") as fh:
            h.update(fh.read())
    for var in ("BENCH_WIDTH", "BENCH_HEIGHT", "BENCH_TRIS", "BENCH_ITERS"):
        h.update(f"{var}={os.environ.get(var, '')}".encode())
    return h.hexdigest()


FINGERPRINT = _fingerprint()


class _Timeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Timeout()

_best = {
    "metric": "Mrays/s/chip unavailable (no program completed before deadline), "
              "Sponza-class 1080p",
    "value": 0.0,
    "unit": "MRays/s",
    "vs_baseline": 0.0,
}
_emit_lock = threading.Lock()
_emitted = False


def _set_best(mode, height, mrays):
    global _best
    _best = {
        "metric": f"Mrays/s/chip {mode}, Sponza-class {height}p",
        "value": round(mrays, 3),
        "unit": "MRays/s",
        "vs_baseline": round(mrays / REFERENCE_MRAYS_ESTIMATE, 4),
    }
    try:  # remember the measurement for the deadline fallback of a later run
        with open(LAST_GOOD_PATH, "w") as f:
            json.dump({**_best, "fingerprint": FINGERPRINT}, f)
    except OSError:
        pass


def _emit(code=0):
    global _emitted
    with _emit_lock:
        if not _emitted:
            _emitted = True
            out = _best
            if out["value"] == 0.0 and os.path.exists(LAST_GOOD_PATH):
                try:
                    with open(LAST_GOOD_PATH) as f:
                        cached = json.load(f)
                    # Surface ONLY a measurement of this exact source tree +
                    # workload, and NEVER in the live value/vs_baseline fields:
                    # a machine consumer must not mistake a replay for this
                    # run's measurement (ADVICE round 3) — the cached figure
                    # goes under distinct cached_* keys, value stays 0.
                    if cached.pop("fingerprint", None) == FINGERPRINT:
                        out = dict(out)
                        out["cached_value"] = cached.get("value")
                        out["cached_vs_baseline"] = cached.get("vs_baseline")
                        out["metric"] = (
                            "Mrays/s/chip unavailable (live run exceeded the"
                            " deadline before any program completed);"
                            " cached_value is a prior build-round measurement"
                            " of this exact code+workload on this chip: "
                            + cached.get("metric", "")
                        )
                except (OSError, ValueError):
                    pass
            print(json.dumps(out), flush=True)
    os._exit(code)


def _watchdog():
    remaining = DEADLINE - (time.time() - START)
    if remaining > 0:
        time.sleep(remaining)
    print(f"# deadline {DEADLINE:.0f}s reached; emitting best-known result",
          file=sys.stderr, flush=True)
    _emit(0)


def _left():
    return DEADLINE - (time.time() - START)


def main():
    threading.Thread(target=_watchdog, daemon=True).start()

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

    t0 = time.time()
    desc, cfg = scenes.config3_sponza(width, height, target_triangles=tris)
    packer = ScenePacker(desc, cfg.width, cfg.height)
    scene = packer.frame()
    print(
        f"# scene ready in {time.time() - t0:.1f}s: {desc.triangle_count} tris, "
        f"{cfg.width}x{cfg.height}, {cfg.num_bounces} bounces",
        file=sys.stderr, flush=True,
    )

    params = extract_params(scene)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    # scene/target MUST be jit arguments: closed-over device arrays are baked
    # into the HLO as literal constants (~160 MB for the Sponza scene), which
    # the tunneled runtime rejects (HTTP 413)
    def loss_fn(p, s, tgt):
        image, stats = renderer.render_with_stats(apply_params(s, p), cfg)
        return image_loss(image, tgt), (image, stats)

    def force(tree):
        """Force completion with a SCALAR READBACK: block_until_ready can
        return without blocking on this runtime (measured 0.5 ms for a 4.6 s
        step — PERF.md), so every timing sync transfers one reduced scalar."""
        return float(jax.tree_util.tree_leaves(tree)[0].sum())

    def time_best(fn, sync, n):
        times = []
        for _ in range(n):
            t0 = time.time()
            out = fn()
            sync(out)
            times.append(time.time() - t0)
        return min(times)

    def report(stats, step_s, mode):
        stats = jax.tree_util.tree_map(int, jax.device_get(stats))
        total_rays = (
            stats.num_primary + stats.num_shadow + stats.num_reflection
            + stats.num_refraction
        )
        print(
            f"# {mode}: step {step_s * 1e3:.1f} ms, rays {total_rays}, "
            f"incomplete {stats.num_incomplete}, dropped {stats.num_dropped}",
            file=sys.stderr, flush=True,
        )
        # scene-tuned queues/ladders assume the measured camera pose; a frame
        # that drops rays or starves lanes is flagged IN the metric so a lossy
        # number can never pass silently (ADVICE round 3, scenes.py queues)
        if stats.num_dropped or stats.num_incomplete:
            mode += (
                f" [LOSSY: dropped {stats.num_dropped},"
                f" incomplete {stats.num_incomplete}]"
            )
        _set_best(mode, height, total_rays / step_s / 1e6)

    # ---- primary: ONE in-jit fwd+bwd program (value_and_grad + aux stats) ----
    # Per-phase SIGALRM bounds: a server-queued compile BLOCKS rather than
    # raising, so without an alarm a hung primary would eat the whole deadline
    # and the fallbacks below would never run.
    signal.signal(signal.SIGALRM, _alarm)
    try:
        signal.alarm(max(int(_left() - 300), 60))
        grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        t0 = time.time()
        (loss, (image, stats)), grads = grad_fn(params, scene, target)
        mean = float(image.mean())  # forces completion through the tunnel
        jax.block_until_ready(grads)
        compile_s = time.time() - t0
        print(
            f"# fwd+bwd compile+run {compile_s:.1f}s "
            f"(loss {float(loss):.6f}, img mean {mean:.5f})",
            file=sys.stderr, flush=True,
        )
        if compile_s > 60:
            print(
                "# COLD SERVER COMPILE CACHE detected (compile+run >> step):"
                " run tools/warm_bench.py after the final source change so"
                " the driver-round bench starts warm (PERF.md round 3)",
                file=sys.stderr, flush=True,
            )
        # one-step measurement first so the watchdog has a real number ASAP
        step_s = time_best(
            lambda: grad_fn(params, scene, target),
            lambda o: force(o[1]), 1,
        )
        signal.alarm(0)
        report(stats, step_s, "fwd+bwd")
        if iters > 1 and _left() > step_s * (iters - 1) + 30:
            step_s = min(step_s, time_best(
                lambda: grad_fn(params, scene, target),
                lambda o: force(o[1]), iters - 1,
            ))
            report(stats, step_s, "fwd+bwd")
        _emit(0)
    except (_Timeout, Exception) as e:  # noqa: BLE001
        signal.alarm(0)
        print(f"# in-jit fwd+bwd failed ({type(e).__name__}: {e})",
              file=sys.stderr, flush=True)

    # ---- fallback 1: host-driven chunked gradient accumulation ----
    if _left() > 120:
        try:
            signal.alarm(max(int(_left() - 120), 60))
            accum = make_accum_grad_fn(cfg)
            t0 = time.time()
            loss, grads, bstats = accum(params, scene, target)
            jax.block_until_ready(grads)
            print(f"# accum fwd+bwd compile+run {time.time() - t0:.1f}s, "
                  f"loss {float(loss):.6f}", file=sys.stderr, flush=True)
            step_s = time_best(
                lambda: accum(params, scene, target),
                lambda o: force(o[1]), 1,
            )
            signal.alarm(0)
            report(bstats, step_s, "fwd+bwd(accum)")
            _emit(0)
        except (_Timeout, Exception) as e:  # noqa: BLE001
            signal.alarm(0)
            print(f"# accum fwd+bwd failed ({type(e).__name__}: {e})",
                  file=sys.stderr, flush=True)

    # ---- fallback 2: forward-only ----
    try:
        signal.alarm(max(int(_left() - 20), 30))
        fwd = jax.jit(lambda s: renderer.render_with_stats(s, cfg))
        t0 = time.time()
        img, stats = fwd(scene)
        mean = float(img.mean())
        print(f"# fwd compile+run {time.time() - t0:.1f}s (mean {mean:.5f})",
              file=sys.stderr, flush=True)
        step_s = time_best(lambda: fwd(scene), lambda o: float(o[0].mean()), 1)
        signal.alarm(0)
        report(stats, step_s, "fwd")
        if iters > 1 and _left() > step_s * (iters - 1) + 15:
            step_s = min(step_s, time_best(
                lambda: fwd(scene), lambda o: float(o[0].mean()), iters - 1,
            ))
            report(stats, step_s, "fwd")
    except (_Timeout, Exception) as e:  # noqa: BLE001
        signal.alarm(0)
        print(f"# forward-only failed ({type(e).__name__}: {e})",
              file=sys.stderr, flush=True)
    _emit(0)


if __name__ == "__main__":
    main()
