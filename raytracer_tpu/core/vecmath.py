"""Batched 3-vector math on device.

The reference's SIMD layer (SIMD_Vector3.h, SIMD_floats.h) packs 1/4/8 rays into
struct-of-lanes registers and routes all control flow through lane masks and ``blend``.
On TPU the "lane count" is the whole wavefront: every function here operates on
``[..., 3]`` float32 arrays, masks are boolean arrays, and ``blend`` is ``jnp.where`` —
XLA fuses these into VPU code, replacing the hand-written intrinsics layer
(SIMD_floats.h:99-282) and Intel SVML transcendentals entirely.

Reference: /root/reference/Math.h, /root/reference/SIMD_Vector3.h
"""

from __future__ import annotations

import jax.numpy as jnp

PI = 3.14159265358979323846
TWO_PI = 2.0 * PI
ONE_OVER_PI = 1.0 / PI
ONE_OVER_TWO_PI = 1.0 / TWO_PI


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Row-wise dot product of [..., 3] arrays -> [...]."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def length_squared(a: jnp.ndarray) -> jnp.ndarray:
    return dot(a, a)


def length(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(length_squared(a))


def normalize(a: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Normalize rows; matches SIMD_Vector3::normalize (rsqrt of squared length)."""
    return a * jax_rsqrt(length_squared(a) + eps)[..., None]


def jax_rsqrt(x: jnp.ndarray) -> jnp.ndarray:
    import jax

    return jax.lax.rsqrt(x)


def safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt that is 0 with ZERO gradient for x <= 0.

    ``sqrt(max(x, 0))`` has a NaN cotangent at x <= 0 (d/dx sqrt evaluates to inf and
    multiplies a zero upstream); masked wavefront lanes hit that constantly, so every
    masked sqrt in the hot path uses this double-where form.
    """
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def safe_arccos(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """arccos with inputs pulled off +-1 so the gradient stays finite at the poles."""
    return jnp.arccos(jnp.clip(x, -1.0 + eps, 1.0 - eps))


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection; sign of n irrelevant (Math.h:28-30)."""
    return v - (2.0 * dot(v, n))[..., None] * n


def refract(
    v: jnp.ndarray,
    n: jnp.ndarray,
    eta: jnp.ndarray,
    cos_theta: jnp.ndarray,
    k: jnp.ndarray,
) -> jnp.ndarray:
    """Snell refraction given precomputed eta, cos_theta and k = 1 - eta^2 (1 - cos^2).

    The normal must be oriented against the incident vector (Math.h:34-36).  ``k`` is
    clamped at zero so lanes in total internal reflection produce finite garbage that
    callers must mask out, matching the reference's masked-blend discipline.
    """
    return eta[..., None] * v + (eta * cos_theta - safe_sqrt(k))[..., None] * n


def barycentric(base: jnp.ndarray, edge1: jnp.ndarray, edge2: jnp.ndarray, u, v):
    """base + u*edge1 + v*edge2 (Math.h:22-24); u, v broadcast over trailing dims."""
    if base.ndim > u.ndim:
        u = u[..., None]
        v = v[..., None]
    return base + u * edge1 + v * edge2


def linear_to_gamma(x: jnp.ndarray) -> jnp.ndarray:
    """sRGB encode, piecewise (Math.h:55-65)."""
    x = jnp.clip(x, 0.0, 1.0)
    lo = x * 12.92
    hi = jnp.power(jnp.maximum(x, 1e-12), 1.0 / 2.4) * 1.055 - 0.055
    return jnp.where(x < 0.0031308, lo, hi)


def gamma_to_linear(x: jnp.ndarray) -> jnp.ndarray:
    """sRGB decode, piecewise (Math.h:67-77)."""
    x = jnp.clip(x, 0.0, 1.0)
    lo = x / 12.92
    hi = jnp.power((x + 0.055) / 1.055, 2.4)
    return jnp.where(x < 0.04045, lo, hi)


def pow2_128(x: jnp.ndarray) -> jnp.ndarray:
    """x**128 by 7 repeated squarings (Math.h:80-96, Light.h:23)."""
    for _ in range(7):
        x = x * x
    return x


def blend(a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Universal select: returns b where mask else a (SIMD_floats.h:119-121).

    Note the reference's argument order is (case_false, case_true, mask); we keep it.
    """
    return jnp.where(mask, b, a)


def blend3(a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """blend for [..., 3] payloads with a [...] mask."""
    return jnp.where(mask[..., None], b, a)
