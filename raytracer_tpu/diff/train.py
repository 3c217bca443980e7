"""Differentiable rendering: losses, parameter extraction, and train steps.

The reference renderer is forward-only; differentiability is this framework's
extension (BASELINE.json north star): pixel gradients flow to materials, lights,
textures, sky, and camera pose.  Traversal is discrete (stop_gradient around hit ids,
ops/traversal.py); hit attributes are re-derived differentiably from the ids
(render/renderer.py:_mesh_hits_into), so gradients also reach triangle vertices and
instance transforms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..render import renderer

# DeviceScene fields that are meaningfully differentiable scene parameters.
DIFFERENTIABLE_FIELDS = (
    "mat_diffuse",
    "mat_reflection",
    "mat_transmittance",
    "mat_ior",
    "tex_data",
    "sky_data",
    "pl_pos",
    "pl_colour",
    "sl_pos",
    "sl_colour",
    "dl_colour",
    "dl_neg_dir",
    "cam_pos",
    "cam_top_left",
    "cam_x",
    "cam_y",
    "ambient",
)


def extract_params(scene, fields=DIFFERENTIABLE_FIELDS) -> dict:
    return {f: getattr(scene, f) for f in fields}


def apply_params(scene, params: dict):
    return scene._replace(**params)


def image_loss(img, target):
    """Mean squared error in linear radiance."""
    return jnp.mean((img - target) ** 2)


def render_loss(params, scene, target, cfg: RenderConfig, pixel_idx=None):
    scene = apply_params(scene, params)
    if pixel_idx is None:
        img, _ = renderer.render_with_stats(scene, cfg)
        return image_loss(img, target)
    rgb, _ = renderer.render_pixels(scene, cfg, pixel_idx)
    return image_loss(rgb, target)


def make_accum_grad_fn(cfg: RenderConfig, chunk: int | None = None):
    """Host-driven chunked fwd+bwd: compile ONE microbatch loss+grad program and
    accumulate gradients over strided pixel chunks from the host loop.

    This is the dispatch-level analog of the reference's tile loop
    (WorkerThread.cpp:53-69) and of microbatch gradient accumulation in
    large-model training: the compiled program is O(chunk) — independent of the
    frame size — so arbitrarily large frames differentiate under any program-size
    ceiling (the tunneled runtime rejects uploads past ~tens of MB of HLO), at
    the cost of one dispatch round-trip per chunk.

    Returns ``fn(params, scene, target) -> (loss, grads, RenderStats)`` where
    loss/grads match the in-jit whole-frame MSE exactly (sum re-scaled once).
    """
    import numpy as np

    chunk = chunk or cfg.traversal_chunk

    @jax.jit
    def micro(params, scene, target_flat, pixel_idx):
        def loss_sum(p):
            rgb, stats = renderer.render_wavefront(
                apply_params(scene, p), cfg, pixel_idx
            )
            tgt = jnp.take(target_flat, jnp.maximum(pixel_idx, 0), axis=0)
            valid = (pixel_idx >= 0)[:, None]
            return jnp.sum(jnp.where(valid, (rgb - tgt) ** 2, 0.0)), stats

        (s, stats), grads = jax.value_and_grad(loss_sum, has_aux=True)(params)
        return s, grads, stats

    n = cfg.num_pixels
    n_chunks = -(-n // chunk)
    padded = n_chunks * chunk
    idx = np.concatenate(
        [np.arange(n, dtype=np.int32), np.full(padded - n, -1, np.int32)]
    )
    idx_chunks = jnp.asarray(idx.reshape(chunk, n_chunks).T)  # strided, as render_pixels

    def fn(params, scene, target):
        target_flat = target.reshape(-1, 3)
        loss = None
        grads = None
        stats = None
        for c in range(n_chunks):
            s, g, st = micro(params, scene, target_flat, idx_chunks[c])
            loss = s if loss is None else loss + s
            grads = g if grads is None else jax.tree_util.tree_map(jnp.add, grads, g)
            stats = st if stats is None else jax.tree_util.tree_map(jnp.add, stats, st)
        scale = 1.0 / (n * 3)
        return (
            loss * scale,
            jax.tree_util.tree_map(lambda g: g * scale, grads),
            stats,
        )

    return fn


def make_train_step(cfg: RenderConfig, optimizer=None, fields=DIFFERENTIABLE_FIELDS):
    """Adam train step over the differentiable scene parameters (single device)."""
    import optax

    optimizer = optimizer or optax.adam(1e-2)

    @jax.jit
    def step(params, opt_state, scene, target):
        loss, grads = jax.value_and_grad(render_loss)(params, scene, target, cfg)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def init(scene):
        params = extract_params(scene, fields)
        return params, optimizer.init(params)

    return init, step


def make_sharded_train_step(cfg: RenderConfig, mesh, axes=None, optimizer=None,
                            fields=DIFFERENTIABLE_FIELDS):
    """Multi-chip fwd+bwd step: pixels sharded over the mesh, scene params
    replicated, parameter gradients all-reduced over ICI (psum) — the collective
    inventory called for by SURVEY.md 2.3/5.8.
    """
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import strided_pixel_permutation

    optimizer = optimizer or optax.adam(1e-2)
    axes = tuple(axes if axes is not None else mesh.axis_names)
    n_shards = int(np.prod([mesh.shape[a] for a in axes]))
    perm = strided_pixel_permutation(cfg.num_pixels, n_shards)
    idx_sharding = NamedSharding(mesh, P(axes))
    # make_array_from_callback instead of device_put: each process materializes
    # only its ADDRESSABLE shards, so the same code path works on a
    # single-process virtual mesh AND a true multi-process jax.distributed
    # mesh (device_put cannot target non-addressable devices) —
    # tests/test_distributed.py runs this across 2 OS processes
    perm_dev = jax.make_array_from_callback(
        perm.shape, idx_sharding, lambda idx: perm[idx]
    )

    def _local_loss_and_grad(params, scene, target_flat, pixel_idx):
        def local_loss(p):
            rgb, _ = renderer.render_pixels(apply_params(scene, p), cfg, pixel_idx)
            tgt = jnp.take(target_flat, pixel_idx, axis=0)
            # sum (not mean) locally so psum over shards gives the global sum
            return jnp.sum((rgb - tgt) ** 2)

        loss, grads = jax.value_and_grad(local_loss)(params)
        loss = jax.lax.psum(loss, axes)
        grads = jax.tree_util.tree_map(lambda g: jax.lax.psum(g, axes), grads)
        scale = 1.0 / (cfg.num_pixels * 3)
        return loss * scale, jax.tree_util.tree_map(lambda g: g * scale, grads)

    shard_fn = jax.shard_map(
        _local_loss_and_grad,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axes)),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def _step(params, opt_state, scene, target, perm):
        target_flat = target.reshape(-1, 3)
        loss, grads = shard_fn(params, scene, target_flat, perm)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def step(params, opt_state, scene, target):
        # perm_dev rides as an ARGUMENT: a closed-over array spanning
        # non-addressable devices is rejected under multi-process jax
        return _step(params, opt_state, scene, target, perm_dev)

    # expose jit introspection with the permutation pre-bound (the collectives
    # audit lowers the step to count its all_reduces — tests/test_collectives)
    step.lower = lambda *a, **kw: _step.lower(*a, perm_dev, **kw)

    def init(scene):
        params = extract_params(scene, fields)
        return params, optimizer.init(params)

    return init, step


def make_tensor_parallel_train_step(cfg: RenderConfig, mesh, dp_axis="dp",
                                    sp_axis="sp", optimizer=None,
                                    fields=DIFFERENTIABLE_FIELDS):
    """Fwd+bwd step with pixels sharded over `dp_axis` AND triangle geometry
    sharded over `sp_axis` (parallel/scene_shard.py).

    Scene parameters (materials/lights/camera/textures/sky) are replicated —
    they are identical across scene shards by construction (split_description
    shares the material buffer).  Every sp member computes the loss over its
    dp-shard of pixels redundantly (shading is post-combine), and BOTH gradient
    paths — the shading path on each member and the hit-reconstruction path
    flowing back through the all_gather to the winning shard — appear once in
    every member's loss, so `pmean` over sp (+ psum over dp) is exactly the
    single-device gradient.
    """
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import strided_pixel_permutation

    optimizer = optimizer or optax.adam(1e-2)
    dp = mesh.shape[dp_axis]
    perm = strided_pixel_permutation(cfg.num_pixels, dp)
    perm_dev = jax.device_put(
        jnp.asarray(perm), NamedSharding(mesh, P(dp_axis))
    )
    cfg_sp = cfg.replace(scene_shard_axis=sp_axis)

    def _local_loss_and_grad(params, scene_stack, target_flat, pixel_idx):
        scene = jax.tree_util.tree_map(lambda x: x[0], scene_stack)

        def local_loss(p):
            rgb, _ = renderer.render_pixels(
                apply_params(scene, p), cfg_sp, pixel_idx
            )
            tgt = jnp.take(target_flat, pixel_idx, axis=0)
            return jnp.sum((rgb - tgt) ** 2)

        loss, grads = jax.value_and_grad(local_loss)(params)
        loss = jax.lax.pmean(jax.lax.psum(loss, dp_axis), sp_axis)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(jax.lax.psum(g, dp_axis), sp_axis), grads
        )
        scale = 1.0 / (cfg.num_pixels * 3)
        return loss * scale, jax.tree_util.tree_map(lambda g: g * scale, grads)

    shard_fn = jax.shard_map(
        _local_loss_and_grad,
        mesh=mesh,
        in_specs=(P(), P(sp_axis), P(), P(dp_axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(params, opt_state, scene_stack, target):
        target_flat = target.reshape(-1, 3)
        loss, grads = shard_fn(params, scene_stack, target_flat, perm_dev)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def init(scene_stack):
        params = {
            f: getattr(scene_stack, f)[0] for f in fields
        }
        return params, optimizer.init(params)

    return init, step
