"""Microbench: fat-gather + relayout strategies for the traversal iteration.

The wide kernel pays, per iteration, ONE [N]-row gather from the unified
[U,72] record table followed by a [N,72] -> [B,72,128] relayout (`_t`) so the
slab/MT math runs on [B,128] lane-major slabs.  Candidates:

  a) row-major table, gather rows, then transpose (current kernel)
  b) transposed [72,U] table, gather along the minor axis: output [72,N] is
     already lane-major; only a major-dim block permute remains
  c) row-major gather, NO transpose (lower bound: math in [N,72]-minor layout
     is not what the kernel wants, but bounds the relayout's cost)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 17
U = 1 << 16
K = 72
ITERS = 32
B = N // 128


def run(name, fn, *args):
    f = jax.jit(fn)
    float(f(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:30s} {best*1e3:7.2f} ms  "
          f"{best/(ITERS*N)*1e9:6.2f} ns/lane-iter", flush=True)


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((U, K), np.float32))
    table_t = jnp.asarray(np.ascontiguousarray(np.asarray(table).T))  # [K,U]
    idx = jnp.asarray(rng.integers(0, U, N).astype(np.int32))

    def step_next(slab, j, i):
        # consume all K slabs, derive a data-dependent next index
        acc = sum(slab[c] for c in range(K))  # [B,128]
        j = (j + acc.reshape(-1).astype(jnp.int32) + i) % U
        return acc, j

    def a_gather_transpose(tb, j0):
        def body(i, carry):
            acc, j = carry
            g = jnp.take(tb, j, axis=0)  # [N,K]
            slab = g.reshape(B, 128, K).transpose(0, 2, 1)  # [B,K,128]
            a, j = step_next(slab, j, i)
            return acc + a, j
        acc, j = jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros((B, 128), jnp.float32), j0))
        return acc.sum() + j.sum()

    def b_transposed_table(tbt, j0):
        def body(i, carry):
            acc, j = carry
            g = jnp.take(tbt, j, axis=1)  # [K,N], lane-major already
            slab = g.reshape(K, B, 128).transpose(1, 0, 2)  # [B,K,128]
            a, j = step_next(slab, j, i)
            return acc + a, j
        acc, j = jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros((B, 128), jnp.float32), j0))
        return acc.sum() + j.sum()

    def c_no_transpose(tb, j0):
        def body(i, carry):
            acc, j = carry
            g = jnp.take(tb, j, axis=0)  # [N,K]
            a = g.sum(axis=1)  # minor-axis reduce, not the real math shape
            j = (j + a.astype(jnp.int32) + i) % U
            return acc + a, j
        acc, j = jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros((N,), jnp.float32), j0))
        return acc.sum() + j.sum()

    print(f"devices: {jax.devices()}  N={N} U={U} K={K} iters={ITERS}")
    run("a) gather + transpose", a_gather_transpose, table, idx)
    run("b) transposed-table gather", b_transposed_table, table_t, idx)
    run("c) gather, no transpose", c_no_transpose, table, idx)


if __name__ == "__main__":
    main()
