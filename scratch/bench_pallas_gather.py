"""Pallas-vs-XLA fat-gather A/B at the traversal's real shapes.

The whole frame cost rests on the ~13 ns/lane dynamic row gather (PERF.md
platform model).  XLA's `gather` is the only implementation we have ever
measured; this closes the "would a hand-written pallas kernel beat it?"
question with a number.

Two pallas strategies at the real table shape ([8W,72] f32, HBM-resident —
115 MB at Sponza scale, so VMEM residency is impossible):

  1. `row-per-grid-step`: PrefetchScalarGridSpec + a (1,R) BlockSpec whose
     index_map reads the prefetched index vector — pallas's own pipeline
     double-buffers the per-row DMAs.  (Mosaic rejects this form: block rows
     must be divisible by 8 — kept as the documented failure.)
  2. `block-loop`: G indices per grid step, manual `make_async_copy` per row
     with a 2-deep DMA pipeline inside the kernel.

Baseline: `jnp.take(table, idx, axis=0)` exactly as traversal_wide.py issues it.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 400_000  # table rows (Sponza-class octant-major unified table)
R = 72       # row width (floats)
RP = 128     # pallas HBM slices must be 128-lane aligned: pallas uses a padded table
N = 1 << 16  # gathered lanes (one production chunk wavefront; idx must fit SMEM for prefetch)
REPS = 30


def bench(fn, *args):
    # scalar readback forcing: plain block_until_ready under-reports on this
    # runtime (PERF.md platform note) — a host-visible scalar is the only fence
    out = fn(*args)
    float(jnp.asarray(out).sum())
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
        float(jnp.asarray(out).sum())
    dt = (time.perf_counter() - t0) / REPS
    return dt, out


def main():
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (T, R), jnp.float32)
    tablep = jnp.pad(table, ((0, 0), (0, RP - R)))
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T, jnp.int32)

    # ---- baseline: XLA gather --------------------------------------------
    take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    dt, ref = bench(take, table, idx)
    print(f"jnp.take   [T,72] : {dt*1e3:8.2f} ms  ({dt/N*1e9:6.2f} ns/lane)")
    dt, refp = bench(take, tablep, idx)
    print(f"jnp.take   [T,128]: {dt*1e3:8.2f} ms  ({dt/N*1e9:6.2f} ns/lane)")

    # ---- pallas 1: one row per grid step, auto-pipelined DMA -------------
    def row_kernel(idx_ref, row_ref, out_ref):
        out_ref[...] = row_ref[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N,),
        in_specs=[pl.BlockSpec((1, RP), lambda i, idx_ref: (idx_ref[i], 0))],
        out_specs=pl.BlockSpec((1, RP), lambda i, idx_ref: (i, 0)),
    )
    row_gather = jax.jit(
        lambda t, i: pl.pallas_call(
            row_kernel,
            out_shape=jax.ShapeDtypeStruct((N, RP), jnp.float32),
            grid_spec=grid_spec,
        )(i, t)
    )
    try:
        dt, got = bench(row_gather, tablep, idx)
        ok = bool((got == refp).all())  # exact equality: rows are copied, not recomputed
        print(
            f"pallas row/step   : {dt*1e3:8.2f} ms  ({dt/N*1e9:6.2f} ns/lane)"
            f"  match={ok}"
        )
    except Exception as e:  # noqa: BLE001 - report and continue
        print(f"pallas row/step   : FAILED ({type(e).__name__}: {e})")

    # ---- pallas 2: G rows per grid step, manual 2-deep DMA pipeline ------
    G = 512

    def block_kernel(idx_ref, hbm_ref, out_ref, scratch, sems):
        blk = pl.program_id(0)

        def issue(slot, j):
            row = idx_ref[blk * G + j]
            return pltpu.make_async_copy(
                hbm_ref.at[pl.ds(row, 1), :], scratch.at[slot], sems.at[slot]
            )

        issue(0, 0).start()

        def body(j, _):
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < G)
            def _():
                issue(1 - slot, j + 1).start()

            issue(slot, j).wait()
            out_ref[pl.ds(j, 1), :] = scratch[slot]
            return 0

        jax.lax.fori_loop(0, G, body, 0)

    grid_spec2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((G, RP), lambda i, idx_ref: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 1, RP), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    blk_gather = jax.jit(
        lambda t, i: pl.pallas_call(
            block_kernel,
            out_shape=jax.ShapeDtypeStruct((N, RP), jnp.float32),
            grid_spec=grid_spec2,
        )(i, t)
    )
    try:
        dt, got = bench(blk_gather, tablep, idx)
        ok = bool((got == refp).all())  # exact equality: rows are copied, not recomputed
        print(
            f"pallas block DMA  : {dt*1e3:8.2f} ms  ({dt/N*1e9:6.2f} ns/lane)"
            f"  match={ok}"
        )
    except Exception as e:  # noqa: BLE001
        print(f"pallas block DMA  : FAILED ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
