"""Decompose the wide-traversal per-iteration cost at scale: gather vs transpose
vs instance matmul vs full _step.  All at N lanes over the Sponza-class table.

Usage: python scratch/bench_step.py [n_lanes_log2]
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

from raytracer_tpu.accel.blas import build_blas
from raytracer_tpu.config import MeshAccelerator, RenderConfig
from raytracer_tpu.ops import traversal_wide as tw
from raytracer_tpu.scene import meshgen
from raytracer_tpu.scene.description import SceneDescription
from raytracer_tpu.scene.device import pack_scene

ITERS = 32


def bench(name, fn, *args, reps=3):
    out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 21)
    desc = SceneDescription()
    mesh = meshgen.sponza_like(target_triangles=260_000)
    desc.register_blas("m", build_blas(mesh, MeshAccelerator.SBVH, cache_dir=".cache/bvh"))
    desc.add_instance("m", (0.0, 0.0, 0.0))
    scene = pack_scene(desc, 8, 8)
    cfg = RenderConfig()
    bvh = jax.jit(tw.build_scene_bvh)(scene)
    jax.block_until_ready(bvh)
    rows = bvh.table.shape[0]
    print(f"n={n} table_rows={rows} ({bvh.table.nbytes/1e6:.0f} MB)")

    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, rows, n).astype(np.int32))
    per = ITERS * n

    # 1. pure gather chain (index depends on previous gather -> no overlap hiding)
    @jax.jit
    def gather_only(idx):
        def body(i, ix):
            g = jnp.take(bvh.table, ix, axis=0)  # [N,72]
            return (ix + g[:, 0].astype(jnp.int32)) % rows
        return jax.lax.fori_loop(0, ITERS, body, idx)
    t = bench("gather", gather_only, idx0)
    print(f"gather chain           : {t/per*1e9:6.2f} ns/lane-iter")

    # 2. gather + batch transpose
    @jax.jit
    def gather_t(idx):
        def body(i, ix):
            g = tw._t(jnp.take(bvh.table, ix, axis=0))  # [B,72,128]
            return (ix + g[:, 0].astype(jnp.int32).reshape(-1)) % rows
        return jax.lax.fori_loop(0, ITERS, body, idx)
    t = bench("gather+t", gather_t, idx0)
    print(f"gather + transpose     : {t/per*1e9:6.2f} ns/lane-iter")

    # 3. + one-hot instance matmul (as in _step)
    @jax.jit
    def gather_t_inst(idx):
        def body(i, ix):
            g = tw._t(jnp.take(bvh.table, ix, axis=0))
            hot = jax.nn.one_hot(ix & 1, bvh.inst_mat.shape[0], dtype=jnp.float32)
            m = tw._t(hot @ bvh.inst_mat)
            return (ix + (g[:, 0] + m[:, 0]).astype(jnp.int32).reshape(-1)) % rows
        return jax.lax.fori_loop(0, ITERS, body, idx)
    t = bench("gather+t+inst", gather_t_inst, idx0)
    print(f"  + one-hot inst matmul: {t/per*1e9:6.2f} ns/lane-iter")

    # 4. full _step
    o = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    tmax = jnp.full((n,), jnp.inf, jnp.float32)
    act = jnp.ones((n,), bool)

    @jax.jit
    def full_step(o, d):
        op, dp, tm, ac, _ = tw._pad_inputs(o, d, tmax, act)
        st = tw._init_state(tm, ac, bvh.root, False, False)
        stack = jnp.zeros((op.shape[0], cfg.wide_stack_size), jnp.int32)
        rays_t = (tw._t(op), tw._t(dp))
        def body(i, carry):
            return tw._step(bvh, carry[0], carry[1], rays_t, None, False)
        st, stack = jax.lax.fori_loop(0, ITERS, body, (st, stack))
        return st["t_best"]
    t = bench("full step", full_step, o, d)
    print(f"full _step             : {t/per*1e9:6.2f} ns/lane-iter")


if __name__ == "__main__":
    main()
