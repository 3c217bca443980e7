"""Chained (data-dependent) gather loop: XLA vs pallas block-DMA.

bench_gather_width.py measured ~17 ns/lane for gathers whose NEXT indices
depend on the gathered rows (the real traversal structure); standalone
independent gathers run at ~2-3 ns/lane (bench_pallas_gather.py).  This
distinguishes: is the in-loop cost the cross-iteration dependency (nothing
any kernel can fix) or XLA's gather lowering (pallas can fix)?
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 16
T = 400_000
RP = 128
ITERS = 32
G = 512


def pallas_gather(table, idx):
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # pl.ANY: the jax-0.9 alias (pltpu.ANY is deprecated)
        out_specs=pl.BlockSpec((G, RP), lambda i, idx_ref: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 1, RP), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        block_kernel,
        out_shape=jax.ShapeDtypeStruct((N, RP), jnp.float32),
        grid_spec=grid_spec,
    )(idx, table)


def make_fn(gather):
    @jax.jit
    def fn(table, idx):
        def body(i, carry):
            acc, j = carry
            rows = gather(table, j)
            acc = acc + rows.sum(axis=1)
            # scale BEFORE the int cast: table values are in [0,1), so a bare
            # cast is always 0 and the "chained" trajectory degenerates to
            # j=(j+i)%T (ADVICE r4).  Scaling makes next indices genuinely
            # depend on gathered data, not just on the dataflow edge.
            j = (j + (rows[:, 0] * T).astype(jnp.int32) + i) % T
            return acc, j

        acc, j = jax.lax.fori_loop(0, ITERS, body, (jnp.zeros((N,), jnp.float32), idx))
        return acc.sum() + j.sum()

    return fn


def bench(name, fn, *args, reps=5):
    s = float(fn(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        s = float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / (N * ITERS) * 1e9
    print(f"{name:24s}: {best*1e3:8.2f} ms  ({per:6.2f} ns/lane-iter)  sum={s:.1f}")


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(np.abs(rng.random((T, RP), np.float32)))
    idx = jnp.asarray(rng.integers(0, T, N).astype(np.int32))

    # same loop, but indices precomputed (independent across iterations):
    # isolates dependency latency from loop/gather overhead
    idx_all = jnp.asarray(rng.integers(0, T, (ITERS, N)).astype(np.int32))

    @jax.jit
    def indep(table, idx_all):
        def body(i, acc):
            rows = jnp.take(table, idx_all[i], axis=0)
            return acc + rows.sum(axis=1)

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((N,), jnp.float32)).sum()

    xla = make_fn(lambda t, i: jnp.take(t, i, axis=0))
    pal = make_fn(pallas_gather)
    bench("indep  jnp.take", indep, table, idx_all)
    bench("chained jnp.take", xla, table, idx)
    bench("chained pallas DMA", pal, table, idx)
    # cross-check results agree
    a, b = float(xla(table, idx)), float(pal(table, idx))
    print(f"agree: {a:.1f} vs {b:.1f}")


if __name__ == "__main__":
    main()
