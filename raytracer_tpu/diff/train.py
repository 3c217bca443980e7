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
    perm_dev = jax.device_put(jnp.asarray(perm), idx_sharding)

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
    def step(params, opt_state, scene, target):
        target_flat = target.reshape(-1, 3)
        loss, grads = shard_fn(params, scene, target_flat, perm_dev)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def init(scene):
        params = extract_params(scene, fields)
        return params, optimizer.init(params)

    return init, step
