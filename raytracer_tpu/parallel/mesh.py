"""Device-mesh utilities.

The reference's execution layer is pinned OS threads + an atomic tile queue
(WorkerThread.cpp:37-69).  The TPU-native analog is a `jax.sharding.Mesh`: pixels
(the tile dimension) shard across the data axes, the scene is replicated, XLA inserts
the collectives (SURVEY.md 2.3, 5.8).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(shape: tuple = None, axis_names: tuple = ("dp", "sp")) -> Mesh:
    """Build a mesh over all local devices.

    shape: per-axis sizes; defaults to (n_devices, 1) folded to len(axis_names).
    """
    devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def strided_pixel_permutation(num_pixels: int, num_shards: int) -> np.ndarray:
    """Permutation assigning pixels round-robin to shards for load balance.

    Contiguous tile sharding load-imbalances (sky rows vs geometry rows); striding
    interleaves so every shard sees a statistically identical workload (SURVEY.md 7,
    'Multi-host efficiency' hard part).  Returns idx [num_pixels_padded] such that
    shard k renders pixels idx[k*m:(k+1)*m].
    """
    pad = (-num_pixels) % num_shards
    total = num_pixels + pad
    idx = np.arange(total)
    # pixel p goes to shard p % num_shards, preserving order within a shard
    idx = idx.reshape(total // num_shards, num_shards).T.reshape(-1)
    # padded slots point at pixel 0 (their output is discarded)
    idx = np.where(idx < num_pixels, idx, 0)
    return idx.astype(np.int32)
