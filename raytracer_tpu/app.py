"""Headless frame-loop application (the Main.cpp analog).

The reference's game loop (Main.cpp:51-118) is: scene.update(dt) -> wake workers over
tiles -> barrier -> blit + FXAA -> timing + MRays/s panel -> swap.  Ours: host-side
animation + per-frame TLAS rebuild -> jit wavefront render (tiles == shards/chunks) ->
optional FXAA post pass -> PNG frames + metrics to stdout.

Usage:  python -m raytracer_tpu.app --scene config4 --frames 10 --out out/
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="TPU Whitted ray tracer")
    ap.add_argument("--scene", default="config0", help="config0..config4")
    ap.add_argument("--frames", type=int, default=1)
    ap.add_argument("--dt", type=float, default=1.0 / 60.0)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--bounces", type=int, default=None)
    ap.add_argument("--out", default="out")
    ap.add_argument("--fxaa", action="store_true")
    ap.add_argument("--heatmap", action="store_true",
                    help="BVH traversal-step heatmap render (Config.h:23)")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument(
        "--batch-frames", type=int, default=1,
        help="animate and render N frames per device dispatch (lax.map over "
        "the frame axis): amortizes the per-dispatch RTT for animation "
        "workloads (renderer.render_frames)",
    )
    ap.add_argument(
        "--no-lossless-retry", action="store_true",
        help="disable the same-frame lossless re-render when the frame's loss "
        "counters (dropped/incomplete) are nonzero (render/renderer.py "
        "RobustRenderer)",
    )
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from .render import renderer
    from .scene import scenes
    from .scene.device import ScenePacker
    from .utils import image as image_util
    from .utils.stats import mrays_per_second
    from .utils.timer import FrameTimer, ScopeTimer

    desc, cfg = scenes.make_scene(args.scene)
    if args.width:
        cfg = cfg.replace(width=args.width)
    if args.height:
        cfg = cfg.replace(height=args.height)
    if args.bounces is not None:
        cfg = cfg.replace(num_bounces=args.bounces)
    cfg = cfg.replace(enable_fxaa=args.fxaa, visualize_heatmap=args.heatmap)

    with ScopeTimer("Scene build"):
        packer = ScenePacker(desc, cfg.width, cfg.height)
    print(f"Scene contains {desc.triangle_count} triangles.")

    if args.no_lossless_retry:
        _render = jax.jit(lambda s: renderer.render_with_stats(s, cfg))

        def render(s):
            img, stats = _render(s)
            return img, stats, False
    else:
        # scene-tuned program + same-frame lossless retry on nonzero loss
        # counters: camera poses whose workload exceeds the tuned queue/ladder
        # capacities (e.g. dielectric closeups on the sponza fly-through) stay
        # correct instead of silently dropping radiance
        render = renderer.RobustRenderer(cfg)
    present = jax.jit(lambda img: renderer.present(img, cfg))

    os.makedirs(args.out, exist_ok=True)
    timer = FrameTimer()

    if args.batch_frames > 1:
        import jax.numpy as jnp

        batched = jax.jit(lambda st: renderer.render_frames(st, cfg))
        frame = 0
        while frame < args.frames:
            n = min(args.batch_frames, args.frames - frame)
            stacked = []
            for _ in range(n):
                desc.update(args.dt)
                stacked.append(packer.frame())
            scene_stack = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *stacked
            )
            imgs, stats_n = batched(scene_stack)
            float(imgs.sum())  # scalar readback forces completion
            delta = timer.tick() / n
            for k in range(n):
                stats = jax.tree_util.tree_map(lambda x: x[k], stats_n)
                metrics = mrays_per_second(stats, delta)
                print(json.dumps({
                    "frame": frame, "ms": round(delta * 1e3, 2),
                    "batched": n,
                    **{kk: round(v, 2) if isinstance(v, float) else v
                       for kk, v in metrics.items()},
                }))
                image_util.save_png(
                    os.path.join(args.out, f"frame_{frame:04d}.png"),
                    np.asarray(imgs[k]),
                )
                frame += 1
            shown = present(imgs[n - 1])
        image_util.save_png(
            os.path.join(args.out, "final_presented.png"), np.asarray(shown),
            gamma=False,
        )
        print(f"Wrote {args.frames} frame(s) to {args.out}/")
        return

    for frame in range(args.frames):
        desc.update(args.dt)
        scene = packer.frame()
        img, stats, retried = render(scene)
        shown = present(img)
        # scalar readback: block_until_ready can return without blocking on
        # the tunneled TPU runtime (PERF.md round 3), which would make the
        # frame clock (and the MRays/s panel) report dispatch time only
        float(shown.sum())
        delta = timer.tick()

        metrics = mrays_per_second(stats, delta)
        print(
            json.dumps(
                {
                    "frame": frame,
                    "ms": round(delta * 1e3, 2),
                    "fps_avg": round(timer.fps, 2),
                    "lossless_retry": retried,
                    **{k: round(v, 2) if isinstance(v, float) else v
                       for k, v in metrics.items()},
                }
            )
        )
        path = os.path.join(args.out, f"frame_{frame:04d}.png")
        image_util.save_png(path, np.asarray(img))
    # final frame also saved presented (gamma/FXAA applied)
    image_util.save_png(
        os.path.join(args.out, "final_presented.png"), np.asarray(shown), gamma=False
    )
    print(f"Wrote {args.frames} frame(s) to {args.out}/")


if __name__ == "__main__":
    main()
