"""In-vreg (lane-axis) VMEM table gather — the last member of the
"sidestep the per-lane HBM gather" family (VERDICT r4 #2; see also
bench_topgather.py for the one-hot matmul member and bench_vmem_gather.py
for the rejected sublane-axis forms).

Mosaic DOES lower `tpu.dynamic_gather` along the 128-lane axis when the
source spans exactly ONE vreg in the gather dimension: a [72, 128] table
(record r in lane r, component c in sublane-row c, i.e. <=128 records)
gathered with per-128-lane index rows.  Three measured configurations:

  per-call   — pallas_call per loop iteration inside an XLA fori_loop
  in-kernel  — the whole chained loop inside ONE pallas kernel
  XLA take   — jnp.take baseline on the transposed [128, 72] table

Result (v5e, 131k lanes, 32 chained iterations, scalar-forced):
per-call 8.72, in-kernel 7.08, XLA take 9.25 ns/lane-iter.  The in-register
shuffle + 72-row sum costs nearly as much as XLA's HBM gather issue path, and
the form caps the table at 128 records (top ~2 wide levels x 8 octants / 16
nodes) — harvesting the ~2 ns/lane-iter on ~2 iterations of each fresh walk
is ~40 ms of a 1.6 s frame before kernel-boundary costs.  CLOSED as a loss.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 17
C = 72       # record components (sublane rows)
U = 128      # records (lanes) — the in-vreg form's hard cap
G = 8192     # lanes per grid step
ITERS = 32
REPS = 4
R = G // 128


def in_kernel(idx_ref, tab_ref, out_ref):
    tab = tab_ref[...]

    def rows(k, _):
        idx0 = idx_ref[k]

        def it(i, carry):
            acc, idx = carry
            idxb = jnp.broadcast_to(idx[None, :], (C, 128))
            g = jnp.take_along_axis(tab, idxb, axis=1)  # one vreg per 8 comps
            s = g.sum(axis=0)
            acc = acc + s
            idx = (idx + (s * 7.0).astype(jnp.int32) + i) % U
            return acc, idx

        acc, _ = jax.lax.fori_loop(
            0, ITERS, it, (jnp.zeros((128,), jnp.float32), idx0)
        )
        out_ref[k] = acc
        return 0

    jax.lax.fori_loop(0, R, rows, 0)


def gather_kernel(idx_ref, tab_ref, out_ref):
    tab = tab_ref[...]

    def rows(k, _):
        idx = idx_ref[k]
        idxb = jnp.broadcast_to(idx[None, :], (C, 128))
        g = jnp.take_along_axis(tab, idxb, axis=1)
        out_ref[k] = g.sum(axis=0)
        return 0

    jax.lax.fori_loop(0, R, rows, 0)


def make(kernel):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(N // G,),
        in_specs=[
            pl.BlockSpec((R, 128), lambda i: (i, 0)),
            pl.BlockSpec((C, U), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((R, 128), lambda i: (i, 0)),
    )
    return jax.jit(
        lambda t, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.float32),
            grid_spec=grid_spec,
        )(i.reshape(-1, 128), t).reshape(-1)
    )


def bench(name, fn, *args):
    def run():
        out = fn(*args)
        return float(out.sum() if out.ndim else out)  # scalar readback forces

    s = run()
    best = np.inf
    for _ in range(REPS):
        t0 = time.perf_counter()
        s = run()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s}: {best*1e3:8.2f} ms ({best/(N*ITERS)*1e9:6.2f} ns/lane-iter) sum={s:.1f}")


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((C, U), np.float32))
    idx = jnp.asarray(rng.integers(0, U, N).astype(np.int32))

    gfn = make(gather_kernel)
    got = gfn(table, idx)
    ref = jnp.take(table.T, idx, axis=0).sum(axis=1)
    print("single-gather kernel max err vs take:",
          float(jnp.abs(got - ref).max()), "(sum-order only)")

    @jax.jit
    def loop_percall(table, idx):
        def body(i, carry):
            acc, j = carry
            s = gfn(table, j)
            acc = acc + s
            j = (j + (s * 7.0).astype(jnp.int32) + i) % U
            return acc, j

        acc, j = jax.lax.fori_loop(0, ITERS, body,
                                   (jnp.zeros((N,), jnp.float32), idx))
        return acc.sum() + j.sum()

    kfn = make(in_kernel)

    @jax.jit
    def loop_xla(tableT, idx):
        def body(i, carry):
            acc, j = carry
            rows = jnp.take(tableT, j, axis=0)
            s = rows.sum(axis=1)
            acc = acc + s
            j = (j + (s * 7.0).astype(jnp.int32) + i) % U
            return acc, j

        acc, j = jax.lax.fori_loop(0, ITERS, body,
                                   (jnp.zeros((N,), jnp.float32), idx))
        return acc.sum() + j.sum()

    bench("pallas per-call", loop_percall, table, idx)
    bench("pallas in-kernel loop", kfn, table, idx)
    bench("XLA take baseline", loop_xla, table.T, idx)


if __name__ == "__main__":
    main()
