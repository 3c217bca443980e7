"""Produce SCALING.json: rays/s and scaling efficiency on (a) the virtual
8-device CPU mesh and (b) the single real chip, via parallel/scaling.py.

The virtual-mesh numbers validate the sharded program end-to-end and measure
*plumbing* efficiency (CPU "devices" share cores, so wall-clock efficiency is
not meaningful hardware data — it is recorded as such); the real-chip section
records the 1-chip baseline the multi-chip efficiency target is defined
against (BASELINE.md: >= 80% at v5p-16).

Usage:
    python tools/make_scaling.py cpu    # 8 virtual devices -> SCALING.json section
    python tools/make_scaling.py tpu    # real chip 1-device baseline
Run both; each merges its section into SCALING.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODE = sys.argv[1] if len(sys.argv) > 1 else "cpu"
if MODE == "cpu":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
else:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".cache/jax")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax  # noqa: E402

if MODE == "cpu":
    # the container's sitecustomize imports jax with JAX_PLATFORMS=axon pinned;
    # override post-import (tests/conftest.py pattern)
    jax.config.update("jax_platforms", "cpu")

from raytracer_tpu.parallel import scaling  # noqa: E402
from raytracer_tpu.scene import scenes  # noqa: E402
from raytracer_tpu.scene.device import ScenePacker  # noqa: E402


def main():
    if MODE == "cpu":
        w, h, tris = 192, 108, 12_000
        counts = (1, 2, 4, 8)
    else:
        w, h, tris = 640, 360, 260_000
        counts = (1,)
    t0 = time.time()
    desc, cfg = scenes.config3_sponza(w, h, target_triangles=tris)
    scene = ScenePacker(desc, cfg.width, cfg.height).frame()
    print(f"scene ready in {time.time()-t0:.0f}s ({len(jax.devices())} devices)",
          flush=True)
    report = scaling.measure(scene, cfg, device_counts=counts)
    section = {
        "workload": f"config3_sponza {w}x{h}, {desc.triangle_count} tris",
        "devices": {str(k): v for k, v in report["rays_per_s"].items()},
        "efficiency": {str(k): round(v, 4) for k, v in report["efficiency"].items()},
        "note": (
            "8 virtual CPU devices (plumbing validation; devices share host cores "
            "so wall-clock efficiency is not hardware data)"
            if MODE == "cpu"
            else "single real chip baseline (multi-chip hardware unavailable; "
                 "multi-chip path validated by dryrun_multichip + virtual mesh)"
        ),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "SCALING.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data[("virtual_cpu_mesh" if MODE == "cpu" else "real_chip")] = section
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps(section, indent=2))


if __name__ == "__main__":
    main()
