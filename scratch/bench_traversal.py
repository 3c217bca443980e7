"""Isolated traversal microbench on the real TPU: wide vs threaded-binary kernels."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.accel.blas import build_blas
from raytracer_tpu.config import MeshAccelerator, RenderConfig
from raytracer_tpu.ops import traversal, traversal_wide
from raytracer_tpu.scene import meshgen
from raytracer_tpu.scene.description import SceneDescription
from raytracer_tpu.scene.device import pack_scene

N = 1 << 17


def make_scene(tris):
    desc = SceneDescription()
    mesh = (
        meshgen.sponza_like(target_triangles=tris)
        if tris > 20000
        else meshgen.icosphere(1.0, 4)
    )
    desc.register_blas("m", build_blas(mesh, MeshAccelerator.SBVH, cache_dir=".cache/bvh"))
    desc.add_instance("m", (0.0, 0.0, 0.0))
    return pack_scene(desc, 8, 8)


def rays_for(scene, n, seed=0):
    rng = np.random.default_rng(seed)
    lo = np.asarray(scene.tl_min).min(axis=0) if scene.tl_min.shape[0] else -np.ones(3)
    hi = np.asarray(scene.tl_max).max(axis=0) if scene.tl_max.shape[0] else np.ones(3)
    c = 0.5 * (lo + hi)
    ext = (hi - lo).max()
    o = c + np.array([0.0, 0.1 * ext, 1.2 * ext])
    tgt = rng.uniform(lo, hi, size=(n, 3))
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(np.broadcast_to(o, (n, 3)), jnp.float32), jnp.asarray(d, jnp.float32)


def bench(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    # force with scalar readback
    s = float(jnp.asarray(out[0] if isinstance(out, tuple) else out).sum())
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        s = float(jnp.asarray(out[0] if isinstance(out, tuple) else out).sum())
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s}: {best*1e3:8.1f} ms   ({s:.1f})")
    return best


def main():
    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    scene = make_scene(tris)
    print(f"tris={scene.tr_p0.shape[0]} wide_nodes={scene.wd_rec.shape[1]}")
    o, d = rays_for(scene, N)
    t_max = jnp.full((N,), jnp.inf, jnp.float32)
    active = jnp.ones((N,), bool)
    cfg = RenderConfig()

    bvh_w = traversal_wide.build_scene_bvh(scene)
    bvh_b = traversal.build_scene_bvh(scene)

    @jax.jit
    def wide(o, d):
        r = traversal_wide.trace_closest(bvh_w, o, d, t_max, active, cfg)
        return r.t, r.tri

    @jax.jit
    def binary(o, d):
        r = traversal.trace_closest(bvh_b, o, d, t_max, active, cfg)
        return r.t, r.tri

    tw = bench("wide trace_closest", wide, o, d)
    tb = bench("binary trace_closest", binary, o, d)
    print(f"ratio binary/wide = {tb/tw:.2f}x   ns/ray wide={tw/N*1e9:.1f} binary={tb/N*1e9:.1f}")

    # agreement
    rw = wide(o, d)
    rb = binary(o, d)
    same = np.mean(np.asarray(rw[1] >= 0) == np.asarray(rb[1] >= 0))
    print(f"hit-mask agreement: {same*100:.3f}%")


if __name__ == "__main__":
    main()
