"""Device-side sky sampling: Debevec angular-map light probe.

Reference: /root/reference/Sky.cpp:28-67 — direction -> (u,v) via
``r = acos(z) / (2*pi*sqrt(x^2+y^2))``, nearest-texel gather, scaled by 1/pi.
The per-lane scalar gathers become one batched ``jnp.take``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..core import vecmath as vm


def sample_sky(sky_data, sky_size, direction):
    """direction: [N,3] (normalized). Returns [N,3] radiance."""
    x, y, z = direction[:, 0], direction[:, 1], direction[:, 2]
    denom = vm.safe_sqrt(x * x + y * y)
    r = 0.5 * vm.ONE_OVER_PI * vm.safe_arccos(z) / jnp.maximum(denom, 1e-12)
    size_f = sky_size.astype(jnp.float32)
    u = x * r + 0.5
    v = y * r + 0.5
    # Util::float_to_int / SIMD_float_to_int round to NEAREST (cvtps), not
    # truncate (Sky.cpp:40-41) — near a steep probe gradient (the sun) the two
    # pick different texels for half the sky, caught by the oracle parity test
    px = jnp.floor(u * size_f + 0.5).astype(jnp.int32)
    py = jnp.floor(v * size_f + 0.5).astype(jnp.int32)
    index = py * sky_size + px
    index = jnp.clip(index, 0, sky_size * sky_size - 1)
    # gathered probe texels are saved as checkpoint residuals ("gather" name,
    # render/renderer.py policy) so bwd reuses them instead of re-gathering
    return vm.ONE_OVER_PI * checkpoint_name(
        jnp.take(sky_data, index, axis=0), "gather"
    )
