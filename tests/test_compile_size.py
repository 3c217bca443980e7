"""Compile-size regression guard (VERDICT round-3 #8).

The tunneled TPU runtime compiles server-side with queueing measured from 0.5 s
to 19 minutes (PERF.md round 3); program SIZE is the only lever this repo
controls.  Round 2 shipped a 43k-line fwd program that compiled in 1470 s cold;
the scan-bounces + vectorized-step work cut the whole fwd+bwd program to ~38k
stablehlo lines.  This test pins that budget so ladder/queue/bounce edits can't
silently re-double compile time.

The budget is on the LOWERED (pre-optimization) stablehlo line count of the
1080p-config3-shaped fwd+bwd program — structure-dependent only (triangle
count scales array sizes, not op count), so the scene here uses few triangles
to keep the test fast while the program is the real bench shape.
"""

import jax
import jax.numpy as jnp

from raytracer_tpu.diff.train import apply_params, extract_params, image_loss
from raytracer_tpu.render import renderer
from raytracer_tpu.scene import scenes
from raytracer_tpu.scene.device import ScenePacker

# Round-5 measured value + ~15% headroom.  The round-5 switch back to the
# UNROLLED bounce pipeline with per-bounce decaying queues grew the program
# from ~38k to ~63k stablehlo lines DELIBERATELY: it buys 242 ms/step at 1080p
# (2538 -> 2296 ms, scratch/ab_unroll.log) for ~+80 s of one-time cold server
# compile, which tools/warm_bench.py prewarms (PERF.md round 5).  The budget
# still pins the structure so further edits can't silently re-double it.
STABLEHLO_LINE_BUDGET = 72_000


def test_1080p_fwd_bwd_program_size():
    desc, cfg = scenes.config3_sponza(1920, 1080, target_triangles=2_000)
    scene = ScenePacker(desc, cfg.width, cfg.height).frame()
    params = extract_params(scene)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    def loss_fn(p, s, tgt):
        image, stats = renderer.render_with_stats(apply_params(s, p), cfg)
        return image_loss(image, tgt), stats

    lowered = jax.jit(jax.value_and_grad(loss_fn, has_aux=True)).lower(
        params, scene, target
    )
    lines = lowered.as_text().count("\n")
    print(f"1080p fwd+bwd stablehlo lines: {lines}")
    assert lines < STABLEHLO_LINE_BUDGET, (
        f"fwd+bwd program grew to {lines} stablehlo lines "
        f"(budget {STABLEHLO_LINE_BUDGET}); check for re-unrolled bounces, "
        "per-child step unrolling, or per-bounce queue specialization"
    )
