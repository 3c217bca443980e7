"""Pallas VMEM-resident table gather (VERDICT r4 #2, sub-family b).

The one-hot matmul route (bench_topgather.py) crosses over at ~500 rows.  The
remaining candidate: keep the top-tree table ENTIRELY in VMEM inside a pallas
kernel and gather per-lane rows with an in-register/in-VMEM lookup, avoiding
the HBM gather issue path.  Mosaic's gather support is the question (PERF.md
r3: only `tpu.dynamic_gather` in the take_along_axis shape lowers) — each
strategy below either measures or records its rejection.

  1. jnp.take(table_vmem, idx_vec) inside the kernel       (vector gather)
  2. jnp.take_along_axis(table_vmem, idx bcast [G,K])      (dynamic_gather shape)
  3. grid-blocked: table as a whole-array VMEM operand, out block per grid step

Chained-loop timing at the production shape (N=131k lanes) when one compiles.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 17
KP = 128        # padded row width (sublane/lane tiling)
U = 4680        # top-3-levels x 8 octants; 4680*128*4 = 2.4 MB VMEM
G = 2048        # lanes per grid step
ITERS = 32
REPS = 4


def kernel_take(idx_ref, tab_ref, out_ref):
    out_ref[...] = jnp.take(tab_ref[...], idx_ref[...], axis=0)


def kernel_tala(idx_ref, tab_ref, out_ref):
    idxb = jnp.broadcast_to(idx_ref[...][:, None], (G, KP))
    out_ref[...] = jnp.take_along_axis(tab_ref[...], idxb, axis=0)


def make_pallas(kernel):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(N // G,),
        in_specs=[
            pl.BlockSpec((G,), lambda i: (i,)),          # idx block
            pl.BlockSpec((U, KP), lambda i: (0, 0)),      # whole table in VMEM
        ],
        out_specs=pl.BlockSpec((G, KP), lambda i: (i, 0)),
    )
    return jax.jit(
        lambda t, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, KP), jnp.float32),
            grid_spec=grid_spec,
        )(i, t)
    )


def bench_loop(name, gather, table, idx):
    @jax.jit
    def fn(table, idx):
        def body(i, carry):
            acc, j = carry
            rows = gather(table, j)
            acc = acc + rows.sum(axis=1)
            j = (j + (rows[:, 0] * U).astype(jnp.int32) + i) % U
            return acc, j

        acc, j = jax.lax.fori_loop(0, ITERS, body,
                                   (jnp.zeros((N,), jnp.float32), idx))
        return acc.sum() + j.sum()

    s = float(fn(table, idx))
    best = np.inf
    for _ in range(REPS):
        t0 = time.perf_counter()
        s = float(fn(table, idx))
        best = min(best, time.perf_counter() - t0)
    per = best / (N * ITERS) * 1e9
    print(f"{name:28s}: {best*1e3:8.2f} ms  ({per:6.2f} ns/lane-iter)  sum={s:.1f}")


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((U, KP), np.float32))
    idx = jnp.asarray(rng.integers(0, U, N).astype(np.int32))

    bench_loop("jnp.take (XLA baseline)",
               lambda t, i: jnp.take(t, i, axis=0), table, idx)

    for name, kern in (("pallas take", kernel_take),
                       ("pallas take_along_axis", kernel_tala)):
        try:
            g = make_pallas(kern)
            got = g(table, idx)
            ref = jnp.take(table, idx, axis=0)
            ok = bool((got == ref).all())
            print(f"{name}: compiles, exact={ok}")
            bench_loop(name, lambda t, i, g=g: g(t, i), table, idx)
        except Exception as e:  # noqa: BLE001 - record the rejection verbatim
            msg = str(e).split("\n")[0][:300]
            print(f"{name}: REJECTED ({type(e).__name__}: {msg})")


if __name__ == "__main__":
    main()
