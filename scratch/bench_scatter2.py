"""Scatter-transpose alternatives at the texture/sky VJP shapes.

Variants per (N lanes, R rows, W width):
  scatter    - plain .at[idx].add(ct)            (what jax's gather VJP emits)
  onehot     - ct^T @ one_hot(idx, R) via dot_general (MXU; needs XLA to fuse
               the one-hot into the dot operand)
Usage: python scratch/bench_scatter2.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

def force(x): return float(x.sum())

def timeit(fn, *a, n=3):
    force(fn(*a)); best = 1e9
    for _ in range(n):
        t0 = time.time(); force(fn(*a)); best = min(best, time.time()-t0)
    return best

rng = np.random.default_rng(0)
for (n, rows, width, tag) in [
    (1<<21, 218_453, 12, "tex-data4"),
    (1<<21, 65_536, 3, "sky"),
]:
    idx = jnp.asarray(rng.integers(0, rows, n), jnp.int32)
    ct = jnp.asarray(rng.normal(size=(n, width)), jnp.float32)
    scat = jax.jit(lambda i, v: jnp.zeros((rows, width), jnp.float32).at[i].add(v))
    t = timeit(scat, idx, ct)
    print(f"{tag:10s} scatter       {t*1e3:8.2f} ms  {t/n*1e9:6.2f} ns/lane", flush=True)

    def onehot_t(i, v):
        # [W,N] @ [N,R] -> [W,R]; one_hot built f32 and (hopefully) fused
        oh = jax.nn.one_hot(i, rows, dtype=jnp.float32)
        return jax.lax.dot_general(v.T, oh, (((1,), (0,)), ((), ()))).T
    oh = jax.jit(onehot_t)
    try:
        t = timeit(oh, idx, ct)
        print(f"{tag:10s} onehot-dot    {t*1e3:8.2f} ms  {t/n*1e9:6.2f} ns/lane", flush=True)
    except Exception as e:
        print(f"{tag:10s} onehot-dot    FAILED {type(e).__name__}", flush=True)
