"""Microbench: cost of the scatter-add transpose of a row gather on this chip
(the texture-atlas VJP building block), random vs screen-coherent indices.

Usage: python scratch/bench_scatter.py [N [ROWS [WIDTH]]]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def force(x):
    return float(x.sum()) if hasattr(x, "sum") else float(x)


def timeit(fn, *a, n=3):
    force(fn(*a))
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        force(fn(*a))
        best = min(best, time.time() - t0)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 21
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    width = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    rng = np.random.default_rng(0)
    idx_rand = jnp.asarray(rng.integers(0, rows, n), jnp.int32)
    # coherent: many consecutive lanes share a texel row (screen-space locality)
    idx_coh = jnp.asarray(
        np.repeat(rng.integers(0, rows, n // 64), 64)[:n], jnp.int32
    )
    ct = jnp.asarray(rng.normal(size=(n, width)), jnp.float32)
    tbl = jnp.zeros((rows, width), jnp.float32)

    gather = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
    scat = jax.jit(lambda i, v: jnp.zeros((rows, width), jnp.float32)
                   .at[i].add(v).sum())
    # the actual VJP as jax emits it
    vjp = jax.jit(jax.grad(lambda t, i, v: (jnp.take(t, i, axis=0) * v).sum()))

    t = timeit(gather, jnp.ones((rows, width), jnp.float32), idx_rand)
    print(f"gather  random   {t*1e3:8.2f} ms  {t/n*1e9:6.2f} ns/lane")
    for tag, idx in (("random", idx_rand), ("coherent", idx_coh)):
        t = timeit(scat, idx, ct)
        print(f"scatter {tag:8s} {t*1e3:8.2f} ms  {t/n*1e9:6.2f} ns/lane",
              flush=True)
        t = timeit(lambda i=idx: vjp(tbl, i, ct))
        print(f"vjp     {tag:8s} {t*1e3:8.2f} ms  {t/n*1e9:6.2f} ns/lane",
              flush=True)


if __name__ == "__main__":
    main()
