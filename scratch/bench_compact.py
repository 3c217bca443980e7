"""Compaction primitive shoot-out on TPU: alive-first permutation via
(a) stable argsort of ~alive (current), (b) cumsum + 1-D scatter of arange.

Both produce `order` such that order[:num_alive] are the alive lane indices in
stable order.  Usage: python scratch/bench_compact.py [log2_n ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".cache/jax")

import jax
import jax.numpy as jnp
import numpy as np


def order_argsort(alive):
    return jnp.argsort(jnp.logical_not(alive))


def order_cumsum(alive):
    a = alive.astype(jnp.int32)
    ca = jnp.cumsum(a)
    n_alive = ca[-1]
    slot = jnp.where(alive, ca - 1, n_alive + jnp.cumsum(1 - a) - 1)
    n = alive.shape[0]
    return jnp.zeros((n,), jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32), unique_indices=True,
        indices_are_sorted=False,
    )


def bench(name, fn, x, reps=5):
    f = jax.jit(fn)
    out = f(x)
    s = int(jnp.asarray(out).sum())
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(x)
        s = int(jnp.asarray(out).sum())
        best = min(best, time.perf_counter() - t0)
    print(f"{name:22s}: {best*1e3:8.2f} ms  (check {s})", flush=True)
    return best


def main():
    logs = [int(a) for a in sys.argv[1:]] or [17, 19, 21]
    rng = np.random.default_rng(0)
    for lg in logs:
        n = 1 << lg
        alive = jnp.asarray(rng.random(n) < 0.4)
        print(f"-- n = 2^{lg}")
        ta = bench("argsort(~alive)", order_argsort, alive)
        tc = bench("cumsum+scatter", order_cumsum, alive)
        # correctness: same alive set in the prefix
        oa = np.asarray(jax.jit(order_argsort)(alive))
        oc = np.asarray(jax.jit(order_cumsum)(alive))
        k = int(np.asarray(alive).sum())
        assert np.array_equal(oa[:k], oc[:k]), "prefix mismatch"
        print(f"   speedup {ta/tc:.2f}x")


if __name__ == "__main__":
    main()
