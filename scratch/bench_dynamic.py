"""Dynamic-scene frame benchmark (the reference's actual deliverable:
Main.cpp:51-118 with per-frame TLAS rebuild, Scene.cpp:139-171).

Runs config4 at 900x600 for N frames on the real chip and reports the ms/frame
split: host animation + repack (ScenePacker.frame, incl. the wide-TLAS rebuild,
timed separately) vs device render, plus MRays/s per category.

Usage: python scratch/bench_dynamic.py [FRAMES [WIDTH HEIGHT]]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from raytracer_tpu.render import renderer
from raytracer_tpu.scene import scenes
from raytracer_tpu.scene.device import ScenePacker
from raytracer_tpu.utils.stats import mrays_per_second


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 900
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 600
    desc, cfg = scenes.make_scene("config4")
    cfg = cfg.replace(width=w, height=h)
    packer = ScenePacker(desc, cfg.width, cfg.height)
    print(f"scene: {desc.triangle_count} tris, {len(desc.instances)} instances, "
          f"{w}x{h}, {cfg.num_bounces} bounces", flush=True)

    render = jax.jit(lambda s: renderer.render_with_stats(s, cfg))

    # timed sub-measure: the wide-TLAS rebuild alone (the per-frame accel work)
    from raytracer_tpu.accel import wide as wide_mod
    mins = np.zeros((len(desc.instances), 3), np.float32)
    maxs = np.zeros((len(desc.instances), 3), np.float32)
    roots = np.zeros((len(desc.instances),), np.int32)
    for i, inst in enumerate(desc.instances):
        box = inst.world_aabb(desc.blas_registry[inst.blas_key].root_aabb)
        mins[i], maxs[i] = box
        roots[i] = packer.wide_node_base[inst.blas_key]
    t0 = time.time()
    for _ in range(10):
        wtlas = wide_mod.build_wide_tlas(mins, maxs, roots)
        wide_mod.octant_records(wtlas, internal_offset=packer.wide_node_count)
    t_tlas = (time.time() - t0) / 10
    print(f"wide-TLAS rebuild alone: {t_tlas*1e3:.2f} ms", flush=True)

    rows = []
    for frame in range(frames):
        t0 = time.time()
        desc.update(1.0 / 60.0)
        t1 = time.time()
        scene = packer.frame()
        t2 = time.time()
        img, stats = render(scene)
        float(img.sum())  # scalar readback forces completion (PERF.md)
        t3 = time.time()
        m = mrays_per_second(stats, t3 - t0)
        rows.append(dict(
            frame=frame,
            anim_ms=round((t1 - t0) * 1e3, 2),
            repack_ms=round((t2 - t1) * 1e3, 2),
            render_ms=round((t3 - t2) * 1e3, 2),
            total_ms=round((t3 - t0) * 1e3, 2),
            total_mrays_s=round(m["total_mrays_s"], 3),
            dropped=int(stats.num_dropped),
            incomplete=int(stats.num_incomplete),
        ))
        print(json.dumps(rows[-1]), flush=True)

    steady = rows[2:]  # frames 0-1 compile distinct programs
    def med(k):
        return float(np.median([r[k] for r in steady]))
    summary = dict(
        frames=len(steady), width=w, height=h,
        anim_ms=med("anim_ms"), repack_ms=med("repack_ms"),
        render_ms=med("render_ms"), total_ms=med("total_ms"),
        fps=round(1e3 / med("total_ms"), 2),
        total_mrays_s=med("total_mrays_s"),
        tlas_rebuild_ms=round(t_tlas * 1e3, 2),
    )
    print("SUMMARY " + json.dumps(summary), flush=True)

    # ---- batched-dispatch mode (renderer.render_frames, PERF.md lever #2):
    # N frames animated host-side, stacked, ONE device dispatch per batch
    import jax.numpy as jnp

    nb = 6
    batched = jax.jit(lambda st: renderer.render_frames(st, cfg))
    times = []
    for rep in range(3):
        t0 = time.time()
        stacked = []
        for _ in range(nb):
            desc.update(1.0 / 60.0)
            stacked.append(packer.frame())
        t_host = time.time() - t0
        scene_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stacked)
        t1 = time.time()
        imgs, stats_n = batched(scene_stack)
        float(imgs.sum())
        t_dev = time.time() - t1
        drp = int(np.sum(np.asarray(stats_n.num_dropped)))
        inc = int(np.sum(np.asarray(stats_n.num_incomplete)))
        if rep > 0:  # rep 0 compiles
            times.append((t_host + t_dev) / nb)
        print(json.dumps(dict(batch_rep=rep, n=nb,
                              host_ms=round(t_host * 1e3, 2),
                              device_ms=round(t_dev * 1e3, 2),
                              per_frame_ms=round((t_host + t_dev) / nb * 1e3, 2),
                              dropped=drp, incomplete=inc)), flush=True)
    if times:
        best = min(times)
        print("BATCH_SUMMARY " + json.dumps(dict(
            n_per_dispatch=nb, per_frame_ms=round(best * 1e3, 2),
            fps=round(1.0 / best, 2),
            saved_vs_unbatched_ms=round(med("total_ms") - best * 1e3, 2),
        )), flush=True)


if __name__ == "__main__":
    main()
