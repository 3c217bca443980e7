"""Measure the per-iteration cost share of the short-stack plumbing in the wide
kernel: ns/ray at wide_stack_size S in {8, 12, 16, 24, 32} on the Sponza-class
scene.  If time scales strongly with S, the 8x [N,S] masked stack writes are a
prime optimization target (see _step, ops/traversal_wide.py).

Usage: python scratch/bench_stack_cost.py
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

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.ops import traversal_wide as tw

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_traversal import bench, make_scene, rays_for  # noqa: E402

N = 1 << 17


def main():
    scene = make_scene(260_000)
    o, d = rays_for(scene, N)
    t_max = jnp.full((N,), jnp.inf, jnp.float32)
    act = jnp.ones((N,), bool)
    bvh = jax.jit(tw.build_scene_bvh)(scene)
    jax.block_until_ready(bvh.table)

    base = RenderConfig(width=8, height=8)
    for s_sz in (8, 12, 16, 24, 32):
        cfg = base.replace(wide_stack_size=s_sz)
        f = jax.jit(lambda b, o, d, t, a, c=cfg: tw.trace_closest(b, o, d, t, a, c))
        res = f(bvh, o, d, t_max, act)
        inc = int(res.incomplete)
        dt = bench(f"closest S={s_sz} (inc {inc})", f, bvh, o, d, t_max, act)
        print(f"  -> {dt/N*1e9:7.1f} ns/ray")
    for unroll in (2, 4):
        cfg = base.replace(traversal_unroll=unroll)
        f = jax.jit(lambda b, o, d, t, a, c=cfg: tw.trace_closest(b, o, d, t, a, c))
        f(bvh, o, d, t_max, act)
        dt = bench(f"closest unroll={unroll}", f, bvh, o, d, t_max, act)
        print(f"  -> {dt/N*1e9:7.1f} ns/ray")
    # any-hit with the same rays (finite t so some rays miss)
    f = jax.jit(lambda b, o, d, t, a: tw.trace_any(b, o, d, t, a, base))
    f(bvh, o, d, t_max, act)
    dt = bench("any-hit S=16", f, bvh, o, d, t_max, act)
    print(f"  -> {dt/N*1e9:7.1f} ns/ray")


if __name__ == "__main__":
    main()
