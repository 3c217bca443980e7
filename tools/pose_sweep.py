"""On-chip pose-robustness sweep at the bench shape (VERDICT r4 #4).

Drives config3 at 1080p (or --width/--height) through N poses of the
reference's sponza fly-through (Scene.cpp:95-126, affine-fitted to the
stand-in — scenes.sponza_spline_poses), rendering each through the production
mechanism (scene-tuned program + same-frame lossless retry, RobustRenderer).

Records, per pose: the TUNED program's loss counters (the "worst-pose
headroom" artifact for PERF.md), whether the retry fired, the retry's
counters (must be 0), and frame times for both programs.

Usage: python tools/pose_sweep.py [--poses 8] [--width 1920 --height 1080]
Writes JSON lines to stdout and a summary table at the end.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=8)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--tris", type=int, default=260_000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from raytracer_tpu.render import renderer
    from raytracer_tpu.scene import scenes
    from raytracer_tpu.scene.device import ScenePacker

    desc, cfg = scenes.config3_sponza(
        args.width, args.height, target_triangles=args.tris
    )
    packer = ScenePacker(desc, cfg.width, cfg.height)
    poses = scenes.sponza_spline_poses(args.poses)

    tiers = (
        ("tuned", cfg),
        ("intermediate", renderer.intermediate_fallback_config(cfg)),
        ("lossless", renderer.lossless_fallback_config(cfg)),
    )
    fns = [
        (name, jax.jit(lambda s, c=c: renderer.render_with_stats(s, c)))
        for name, c in tiers
    ]

    rows = []
    for k, (pos, rot) in enumerate(poses):
        desc.camera.position = pos
        desc.camera.rotation = rot
        scene = packer.frame()
        row = dict(pose=k, position=[round(float(x), 2) for x in pos])
        for name, fn in fns:
            t0 = time.time()
            img, stats = fn(scene)
            mean = float(img.mean())  # scalar readback forces completion
            row[f"{name}_s"] = round(time.time() - t0, 3)
            row[f"{name}_dropped"] = int(stats.num_dropped)
            row[f"{name}_incomplete"] = int(stats.num_incomplete)
            row["img_mean"] = round(mean, 5)
            if row[f"{name}_dropped"] + row[f"{name}_incomplete"] == 0:
                row["tier"] = name
                break
        assert "tier" in row, f"pose {k}: even the lossless tier is lossy: {row}"
        rows.append(row)
        print(json.dumps(row), flush=True)

    from collections import Counter

    tiers_used = Counter(r["tier"] for r in rows)
    print(f"# {len(rows)} poses; tier used: {dict(tiers_used)}", flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "scratch", "pose_sweep_chip.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"# wrote {out}", flush=True)


if __name__ == "__main__":
    main()
