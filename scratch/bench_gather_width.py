"""Microbench: row-gather cost vs row width on the tunneled TPU.

Validates the wide-BVH design premise: a [N] gather from [U, K] rows costs the
same for K=12 (current binary node record) and K=64 (BVH8 record, 256 B).

The extended sweep (round-4b row-width-cliff table in PERF.md: K = 72..320,
incl. K=90 for the 10-wide arity question flagged by ADVICE r4) runs with
`python bench_gather_width.py wide` — same N=1<<17 lanes / 64 chained
iterations as the committed PERF.md numbers.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 17  # wavefront lanes
U = 1 << 16  # table rows
ITERS = 64


def make_fn(k):
    @jax.jit
    def fn(table, idx):
        def body(i, carry):
            acc, j = carry
            rows = jnp.take(table, j, axis=0)
            acc = acc + rows.sum(axis=1)
            # data-dependent next index (defeats hoisting), stays in range.
            # Scale BEFORE the int cast: table values are in [0,1), so a bare
            # cast would always be 0 and the trajectory would be fixed
            # (ADVICE r4 on bench_pallas_chained).
            j = (j + (rows[:, 0] * U).astype(jnp.int32) + i) % U
            return acc, j

        acc, j = jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros((N,), jnp.float32), idx)
        )
        return acc.sum() + j.sum()

    return fn


def measure(k, reps=3):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((U, k), np.float32))
    idx = jnp.asarray(rng.integers(0, U, N).astype(np.int32))
    fn = make_fn(k)
    float(fn(table, idx))  # compile + warm
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        r = float(fn(table, idx))  # scalar readback forces completion
        dt = time.perf_counter() - t0
        best = min(best, dt)
    ns_per_lane = best / (ITERS * N) * 1e9
    print(f"K={k:4d} ({k*4:4d} B/row): {best*1e3:7.2f} ms  {ns_per_lane:6.2f} ns/lane-gather")
    return ns_per_lane


if __name__ == "__main__":
    print(f"devices: {jax.devices()}  N={N} U={U} iters={ITERS}")
    if len(sys.argv) > 1 and sys.argv[1] == "wide":
        # round-4b row-width-cliff sweep (PERF.md), + K=90 (a 10-wide node
        # record: 10x(6 box + 3 meta) = 90 floats) per ADVICE r4
        widths = (72, 90, 96, 128, 144, 192, 256, 320)
    else:
        widths = (8, 12, 16, 24, 32, 40, 48, 64, 80, 128)
    for k in widths:
        measure(k)
