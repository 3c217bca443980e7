"""Sharded rendering: pixels over the device mesh, scene replicated.

TPU-native replacement for the reference's tile work-stealing scheduler
(WorkerThread.cpp:49-69): instead of threads claiming 32x32 tiles from an atomic
counter, the frame's pixels are strided round-robin across every chip of a
`jax.sharding.Mesh` via `shard_map`; each chip runs the full wavefront bounce pipeline
on its pixel set independently (rendering needs no cross-ray communication — the
reference proves this by the absence of any cross-thread sync, SURVEY.md 2.3), and the
only collective is the implicit all-gather of the assembled framebuffer.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RenderConfig
from ..render import renderer
from .mesh import strided_pixel_permutation


def make_sharded_renderer(cfg: RenderConfig, mesh: Mesh, axes=None):
    """Returns render(scene) -> [H,W,3] with pixels sharded over `axes` of `mesh`."""
    axes = tuple(axes if axes is not None else mesh.axis_names)
    n_shards = int(np.prod([mesh.shape[a] for a in axes]))
    num_pixels = cfg.num_pixels
    perm = strided_pixel_permutation(num_pixels, n_shards)
    # perm maps slot -> pixel (padded slots point at pixel 0); invert keeping the
    # first writer so padded duplicates are discarded
    inv_perm = np.full(num_pixels, -1, np.int64)
    for slot, px in enumerate(perm):
        if inv_perm[px] < 0:
            inv_perm[px] = slot
    assert np.all(inv_perm >= 0)

    idx_sharding = NamedSharding(mesh, P(axes))
    perm_dev = jax.device_put(jnp.asarray(perm), idx_sharding)
    inv_dev = jnp.asarray(inv_perm)

    def _shard_fn(scene, pixel_idx):
        rgb, stats = renderer.render_pixels(scene, cfg, pixel_idx)
        # all-reduce the per-shard ray counters (the analog of
        # WorkerThreads::sum_performance_stats, WorkerThread.cpp:131-148)
        stats = jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, axes), stats
        )
        return rgb, stats

    shard_fn = jax.shard_map(
        _shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axes)),
        out_specs=(P(axes), P()),
        check_vma=False,
    )

    @jax.jit
    def run(scene):
        rgb, stats = shard_fn(scene, perm_dev)
        image = jnp.take(rgb, inv_dev, axis=0).reshape(cfg.height, cfg.width, 3)
        return image, stats

    return run
