import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, sys
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from raytracer_tpu.render import renderer
from raytracer_tpu.scene import scenes
from raytracer_tpu.scene.device import ScenePacker

desc, cfg = scenes.config3_sponza(target_triangles=40_000)
cfg = cfg.replace(width=128, height=72, traversal_chunk=1 << 11)
packer = ScenePacker(desc, cfg.width, cfg.height)
poses = scenes.sponza_spline_poses(8)
for qf in (0.125, 0.1875, 0.25):
    worst = 0; worst_k = -1
    for k in range(8):
        pos, rot = poses[k]
        desc.camera.position = pos; desc.camera.rotation = rot
        scene = packer.frame()
        img, stats = renderer.render_with_stats(scene, cfg.replace(queue_factor=(qf,)))
        d = int(stats.num_dropped); i = int(stats.num_incomplete)
        print(f"  qf {qf} pose {k}: dropped {d} incomplete {i}", flush=True)
        if d > worst: worst, worst_k = d, k
    print(f"queue_factor {qf}: worst dropped {worst} (pose {worst_k})", flush=True)
