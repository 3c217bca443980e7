"""Scaling-efficiency harness: rays/s at 1 chip vs N chips (BASELINE.md target:
>= 80% multi-host scaling efficiency).

On real hardware this measures wall time; on the virtual CPU mesh it validates the
sharded program end-to-end and reports the (meaningless for CPU, but plumbing-
correct) efficiency numbers.
"""

from __future__ import annotations

import time

import numpy as np

import jax

from ..config import RenderConfig
from ..render import renderer
from .mesh import make_mesh
from .shard import make_sharded_renderer


def measure(scene, cfg: RenderConfig, device_counts=(1, 2, 4, 8), iters: int = 3):
    """Returns {n_devices: rays_per_second} plus efficiencies vs 1 device."""
    results = {}
    n_avail = len(jax.devices())
    single = jax.jit(lambda s: renderer.render_with_stats(s, cfg))

    def timed(fn, *a):
        # force completion with a SCALAR READBACK: block_until_ready can
        # return without blocking on the tunneled TPU runtime (measured 0.5 ms
        # for a multi-second step — PERF.md round 3), which previously
        # inflated the real-chip rays/s by orders of magnitude.  The sum +
        # host transfer sits inside the timed region (it is what forces the
        # work); its cost — one device reduce + a per-dispatch RTT of ~20-40 ms
        # (PERF.md cost model) — is negligible against multi-second steps but
        # inflates sub-100 ms measurements; interpret small-frame curves
        # accordingly (ADVICE round 3).
        out = fn(*a)
        float(out[0].sum())
        best = np.inf
        for _ in range(iters):
            t0 = time.time()
            out = fn(*a)
            float(out[0].sum())
            best = min(best, time.time() - t0)
        return best, out

    for n in device_counts:
        if n > n_avail:
            continue
        if n == 1:
            dt, (img, stats) = timed(single, scene)
        else:
            # mesh over the FIRST n devices (subset scaling curve)
            from jax.sharding import Mesh

            mesh = Mesh(
                np.array(jax.devices()[:n]).reshape(n, 1), ("dp", "sp")
            )
            run = make_sharded_renderer(cfg, mesh)
            dt, (img, stats) = timed(run, scene)
        total = sum(
            int(getattr(stats, k))
            for k in ("num_primary", "num_shadow", "num_reflection", "num_refraction")
        )
        results[n] = total / dt

    base = results.get(1)
    report = {
        "rays_per_s": results,
        "efficiency": {
            n: (r / (base * n)) if base else float("nan") for n, r in results.items()
        },
    }
    return report
