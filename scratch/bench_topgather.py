"""Round-5 structural shot at the gather floor (VERDICT r4 #2).

Every measured traversal design issues one HBM row-gather per lane-iteration
and pays the platform's fixed ~13-20 ns/lane gather-issue cost.  The untried
family: when the gathered table is SMALL (the top 2-3 levels of the wide tree,
65..4681 records), the gather can be re-expressed so it never issues a
per-lane HBM gather at all:

  A. one-hot matmul  — out = one_hot(idx) @ table rides the MXU (the classic
     TPU embedding pattern; the kernel already uses it for instance matrices
     at ~free cost).  Exactness matters: node records carry child links as
     exact f32 ints (f_a/f_b < 2^24), so the dot must reproduce jnp.take
     BIT-FOR-BIT -> measured with precision=HIGHEST and verified (got==ref).
  B. pallas VMEM table — whole table resident in VMEM, per-lane gather inside
     the kernel (Mosaic permitting).

Both are benchmarked in the SAME chained-loop shape as the committed
row-width-cliff sweep (N=131k lanes, 72-float rows, data-dependent next
index), against jnp.take from both a small table and a Sponza-scale table.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 17   # wavefront lanes
K = 72        # record floats
ITERS = 32
REPS = 4


def bench_loop(name, fn, *args):
    s = float(fn(*args))
    best = np.inf
    for _ in range(REPS):
        t0 = time.perf_counter()
        s = float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / (N * ITERS) * 1e9
    print(f"{name:42s}: {best*1e3:8.2f} ms  ({per:6.2f} ns/lane-iter)  sum={s:.1f}")
    return per


def chained(u, gather):
    @jax.jit
    def fn(table, idx):
        def body(i, carry):
            acc, j = carry
            rows = gather(table, j)
            acc = acc + rows.sum(axis=1)
            j = (j + (rows[:, 0] * u).astype(jnp.int32) + i) % u
            return acc, j

        acc, j = jax.lax.fori_loop(0, ITERS, body,
                                   (jnp.zeros((N,), jnp.float32), idx))
        return acc.sum() + j.sum()

    return fn


def onehot_gather(u, precision):
    def g(table, idx):
        oh = jax.nn.one_hot(idx, u, dtype=jnp.float32)
        return jax.lax.dot_general(
            oh, table, (((1,), (0,)), ((), ())), precision=precision
        )
    return g


def exactness(u, table, idx, precision):
    take = jnp.take(table, idx, axis=0)
    oh = onehot_gather(u, precision)(table, idx)
    exact = bool((take == oh).all())
    return exact


def main():
    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, 1 << 12, N).astype(np.int32))

    # Sponza-scale baseline for reference (122k rows)
    u_big = 120_000
    big = jnp.asarray(rng.random((u_big, K), np.float32))
    bench_loop(f"jnp.take      U={u_big}", chained(u_big, lambda t, i: jnp.take(t, i, axis=0)),
               big, idx0 % u_big)

    for u in (520, 4680, 18720):   # top-2/3/4 levels x 8 octants
        table = jnp.asarray(rng.random((u, K), np.float32))
        # ints-as-floats in the meta columns, like the real record
        meta = rng.integers(0, 1 << 22, (u, 16)).astype(np.float32)
        table = table.at[:, 48:64].set(jnp.asarray(meta))
        idx = idx0 % u
        bench_loop(f"jnp.take      U={u}", chained(u, lambda t, i: jnp.take(t, i, axis=0)),
                   table, idx)
        for prec in (jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT):
            pname = "HIGHEST" if prec == jax.lax.Precision.HIGHEST else "DEFAULT"
            exact = exactness(u, table, idx, prec)
            per = bench_loop(f"one-hot dot   U={u} prec={pname}",
                             chained(u, onehot_gather(u, prec)), table, idx)
            print(f"    exact vs take: {exact}")


if __name__ == "__main__":
    main()
