"""Device-side sky sampling: Debevec angular-map light probe.

Reference: /root/reference/Sky.cpp:28-67 — direction -> (u,v) via
``r = acos(z) / (2*pi*sqrt(x^2+y^2))``, nearest-texel gather, scaled by 1/pi.
The per-lane scalar gathers become one batched ``jnp.take``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import vecmath as vm


def sample_sky(sky_data, sky_size, direction):
    """direction: [N,3] (normalized). Returns [N,3] radiance."""
    x, y, z = direction[:, 0], direction[:, 1], direction[:, 2]
    denom = vm.safe_sqrt(x * x + y * y)
    r = 0.5 * vm.ONE_OVER_PI * vm.safe_arccos(z) / jnp.maximum(denom, 1e-12)
    size_f = sky_size.astype(jnp.float32)
    u = x * r + 0.5
    v = y * r + 0.5
    px = (u * size_f).astype(jnp.int32)
    py = (v * size_f).astype(jnp.int32)
    index = py * sky_size + px
    index = jnp.clip(index, 0, sky_size * sky_size - 1)
    return vm.ONE_OVER_PI * jnp.take(sky_data, index, axis=0)
