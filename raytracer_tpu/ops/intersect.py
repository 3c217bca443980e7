"""Batched primitive intersection ops.

Every function operates on a wavefront of N rays at once — the TPU-native counterpart of
the reference's 8-wide AVX2 ray packets (SIMD_Vector3.h).  All control flow is mask
arithmetic (`jnp.where`), mirroring the reference's blend discipline, so XLA compiles
straight-line VPU code with no divergence.

Hit records are carried as a NamedTuple-of-arrays (structure-of-arrays), the analog of
the reference's RayHit packet (RayHit.h:4-36).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import RAY_EPSILON
from ..core import vecmath as vm


class Rays(NamedTuple):
    """SoA wavefront ray batch with Igehy ray differentials (Ray.h:4-17)."""

    origin: jnp.ndarray  # [N,3]
    direction: jnp.ndarray  # [N,3]
    dO_dx: jnp.ndarray  # [N,3]
    dO_dy: jnp.ndarray  # [N,3]
    dD_dx: jnp.ndarray  # [N,3]
    dD_dy: jnp.ndarray  # [N,3]

    @property
    def count(self) -> int:
        return self.origin.shape[0]


def make_rays(origin, direction, dO_dx=None, dO_dy=None, dD_dx=None, dD_dy=None):
    z = jnp.zeros_like(origin)
    return Rays(
        origin,
        direction,
        z if dO_dx is None else dO_dx,
        z if dO_dy is None else dO_dy,
        z if dD_dx is None else dD_dx,
        z if dD_dy is None else dD_dy,
    )


class Hits(NamedTuple):
    """SoA wavefront hit record (RayHit.h:4-36)."""

    hit: jnp.ndarray  # [N] bool
    t: jnp.ndarray  # [N] distance
    point: jnp.ndarray  # [N,3] world-space hit point
    normal: jnp.ndarray  # [N,3] world-space shading normal
    material_id: jnp.ndarray  # [N] int32
    u: jnp.ndarray  # [N] texture s
    v: jnp.ndarray  # [N] texture t
    # texture-space derivatives w.r.t. screen x/y (for mip LOD)
    ds_dx: jnp.ndarray
    ds_dy: jnp.ndarray
    dt_dx: jnp.ndarray
    dt_dy: jnp.ndarray
    # positional/normal differentials (RayHit.h:14-22)
    dO_dx: jnp.ndarray  # [N,3]
    dO_dy: jnp.ndarray  # [N,3]
    dN_dx: jnp.ndarray  # [N,3]
    dN_dy: jnp.ndarray  # [N,3]
    bvh_steps: jnp.ndarray  # [N] int32 traversal-step heatmap counter (RayHit.h:24-26)


def make_miss_hits(n: int) -> Hits:
    """All-miss initialization (RayHit.h:28-35): hit=false, distance=inf."""
    f = jnp.zeros((n,), jnp.float32)
    v3 = jnp.zeros((n, 3), jnp.float32)
    return Hits(
        hit=jnp.zeros((n,), bool),
        t=jnp.full((n,), jnp.inf, jnp.float32),
        point=v3,
        normal=v3,
        material_id=jnp.zeros((n,), jnp.int32),
        u=f,
        v=f,
        ds_dx=f,
        ds_dy=f,
        dt_dx=f,
        dt_dy=f,
        dO_dx=v3,
        dO_dy=v3,
        dN_dx=v3,
        dN_dy=v3,
        bvh_steps=jnp.zeros((n,), jnp.int32),
    )


def _nonzero(x, tiny: float = 1e-20):
    """Push a (possibly zero) denominator away from 0, keeping its sign, so masked
    lanes divide by something finite and the backward pass stays NaN-free."""
    return jnp.where(jnp.abs(x) < tiny, jnp.where(x < 0, -tiny, tiny), x)


def _transfer_differentials(rays: Rays, t, normal):
    """Igehy '99 transfer: propagate (dO, dD) to the hit point (Sphere.cpp:63-75).

    Returns (dP_dx, dP_dy): derivatives of the world hit point w.r.t. screen x/y.
    """
    dP_dx_plus = rays.dO_dx + t[:, None] * rays.dD_dx
    dP_dy_plus = rays.dO_dy + t[:, None] * rays.dD_dy
    denom = -1.0 / (vm.dot(rays.direction, normal) + 1e-8)
    dt_dx = vm.dot(dP_dx_plus, normal) * denom
    dt_dy = vm.dot(dP_dy_plus, normal) * denom
    dP_dx = dP_dx_plus + dt_dx[:, None] * rays.direction
    dP_dy = dP_dy_plus + dt_dy[:, None] * rays.direction
    return dP_dx, dP_dy


# ---------------------------------------------------------------------------
# Sphere
# ---------------------------------------------------------------------------


def sphere_trace(rays: Rays, hits: Hits, center, radius, material_id) -> Hits:
    """Closest-hit against one sphere for the whole wavefront (Sphere.cpp:9-90).

    center: [3], radius: scalar, material_id: int scalar.
    """
    center = jnp.asarray(center, jnp.float32)
    radius = jnp.asarray(radius, jnp.float32)
    r2 = radius * radius
    inv_r = 1.0 / radius

    oc = rays.origin - center
    a = vm.length_squared(rays.direction)
    b = 2.0 * vm.dot(oc, rays.direction)
    c = vm.length_squared(oc) - r2
    d = b * b - 4.0 * a * c

    mask = d >= 0.0
    sqrt_d = vm.safe_sqrt(d)
    inv_denom = -1.0 / (2.0 * a)
    t0 = (b + sqrt_d) * inv_denom
    t1 = (b - sqrt_d) * inv_denom
    t = jnp.where(t0 > RAY_EPSILON, t0, t1)
    mask = mask & (t > RAY_EPSILON) & (t < hits.t)

    point = rays.origin + t[:, None] * rays.direction
    normal = (point - center) * inv_r

    # Spherical-coordinate uv (Sphere.cpp:60-61); atan2 guarded off the pole axis
    # where its gradient is undefined
    on_pole = (
        normal[:, 0] * normal[:, 0] + normal[:, 2] * normal[:, 2]
    ) < 1e-12
    u = (
        jnp.arctan2(
            jnp.where(on_pole, 1.0, normal[:, 2]),
            jnp.where(on_pole, 1.0, normal[:, 0]),
        )
        * vm.ONE_OVER_TWO_PI
        + 0.5
    )
    v = vm.safe_arccos(normal[:, 1]) * vm.ONE_OVER_PI + 0.5

    dP_dx, dP_dy = _transfer_differentials(rays, t, normal)
    dN_dx = dP_dx * inv_r
    dN_dy = dP_dy * inv_r

    # Closed-form uv derivatives (Sphere.cpp:77-88)
    nonzero = 1e-8
    ds_denom = vm.ONE_OVER_TWO_PI / (
        normal[:, 0] * normal[:, 0] + normal[:, 2] * normal[:, 2] + nonzero
    )
    ds_dx = (normal[:, 0] * dN_dx[:, 2] - normal[:, 2] * dN_dx[:, 0]) * ds_denom
    ds_dy = (normal[:, 0] * dN_dy[:, 2] - normal[:, 2] * dN_dy[:, 0]) * ds_denom
    dt_denom = -vm.ONE_OVER_PI / (
        vm.safe_sqrt(1.0 - normal[:, 1] * normal[:, 1]) + nonzero
    )
    dt_dx = dN_dx[:, 1] * dt_denom
    dt_dy = dN_dy[:, 1] * dt_denom

    m3 = mask[:, None]
    return hits._replace(
        hit=hits.hit | mask,
        t=jnp.where(mask, t, hits.t),
        point=jnp.where(m3, point, hits.point),
        normal=jnp.where(m3, normal, hits.normal),
        material_id=jnp.where(
            mask, jnp.asarray(material_id, jnp.int32), hits.material_id
        ),
        u=jnp.where(mask, u, hits.u),
        v=jnp.where(mask, v, hits.v),
        ds_dx=jnp.where(mask, ds_dx, hits.ds_dx),
        ds_dy=jnp.where(mask, ds_dy, hits.ds_dy),
        dt_dx=jnp.where(mask, dt_dx, hits.dt_dx),
        dt_dy=jnp.where(mask, dt_dy, hits.dt_dy),
        dO_dx=jnp.where(m3, dP_dx, hits.dO_dx),
        dO_dy=jnp.where(m3, dP_dy, hits.dO_dy),
        dN_dx=jnp.where(m3, dN_dx, hits.dN_dx),
        dN_dy=jnp.where(m3, dN_dy, hits.dN_dy),
    )


def sphere_intersect(rays: Rays, max_distance, center, radius) -> jnp.ndarray:
    """Cheaper geometric any-hit for shadow rays (Sphere.cpp:92-112). Returns mask."""
    center = jnp.asarray(center, jnp.float32)
    c = center - rays.origin
    t = vm.dot(c, rays.direction)
    q = c - t[:, None] * rays.direction
    p2 = vm.dot(q, q)
    radius = jnp.asarray(radius, jnp.float32)
    rs = radius * radius
    mask = p2 < rs
    t = t - vm.safe_sqrt(rs - p2)
    return mask & (t > RAY_EPSILON) & (t < max_distance)


# ---------------------------------------------------------------------------
# Plane
# ---------------------------------------------------------------------------


def plane_trace(
    rays: Rays, hits: Hits, normal, distance, u_axis, v_axis, material_id
) -> Hits:
    """Closest-hit against one infinite plane (Plane.cpp:13-69)."""
    n = jnp.asarray(normal, jnp.float32)
    u_ax = jnp.asarray(u_axis, jnp.float32)
    v_ax = jnp.asarray(v_axis, jnp.float32)
    dist = jnp.asarray(distance, jnp.float32)

    t = -(vm.dot(rays.origin, n) + dist) / _nonzero(vm.dot(rays.direction, n))
    mask = (t > RAY_EPSILON) & (t < hits.t)

    point = rays.origin + t[:, None] * rays.direction
    nb = jnp.broadcast_to(n, point.shape)

    u = vm.dot(point, u_ax)
    v = vm.dot(point, v_ax)

    dP_dx, dP_dy = _transfer_differentials(rays, t, nb)

    m3 = mask[:, None]
    return hits._replace(
        hit=hits.hit | mask,
        t=jnp.where(mask, t, hits.t),
        point=jnp.where(m3, point, hits.point),
        normal=jnp.where(m3, nb, hits.normal),
        material_id=jnp.where(
            mask, jnp.asarray(material_id, jnp.int32), hits.material_id
        ),
        u=jnp.where(mask, u, hits.u),
        v=jnp.where(mask, v, hits.v),
        ds_dx=jnp.where(mask, vm.dot(dP_dx, u_ax), hits.ds_dx),
        ds_dy=jnp.where(mask, vm.dot(dP_dy, u_ax), hits.ds_dy),
        dt_dx=jnp.where(mask, vm.dot(dP_dx, v_ax), hits.dt_dx),
        dt_dy=jnp.where(mask, vm.dot(dP_dy, v_ax), hits.dt_dy),
        dO_dx=jnp.where(m3, dP_dx, hits.dO_dx),
        dO_dy=jnp.where(m3, dP_dy, hits.dO_dy),
        # dN/dxy = 0 for planes (Plane.cpp:59-62)
        dN_dx=jnp.where(m3, 0.0, hits.dN_dx),
        dN_dy=jnp.where(m3, 0.0, hits.dN_dy),
    )


def plane_intersect(rays: Rays, max_distance, normal, distance) -> jnp.ndarray:
    """Any-hit against one plane (Plane.cpp:72-80)."""
    n = jnp.asarray(normal, jnp.float32)
    t = -(vm.dot(rays.origin, n) + jnp.asarray(distance, jnp.float32)) / _nonzero(
        vm.dot(rays.direction, n)
    )
    return (t > RAY_EPSILON) & (t < max_distance)


# ---------------------------------------------------------------------------
# Triangle (Moller-Trumbore) — used by the BVH traversal kernels
# ---------------------------------------------------------------------------


def triangle_hit(o, d, p0, e1, e2, t_max):
    """Batched Moller-Trumbore core (BottomLevelBVH.cpp:214-258).

    All inputs [N,3] (or broadcastable); returns (mask, t, u, v).
    """
    h = jnp.cross(d, e2)
    a = vm.dot(e1, h)
    # rcp with a zero-guard: the reference's rcp yields inf and masks it out
    # (BottomLevelBVH.cpp:221-223); the guard additionally keeps the BACKWARD pass
    # NaN-free on those masked lanes
    f = 1.0 / _nonzero(a)
    s = o - p0
    u = f * vm.dot(s, h)
    q = jnp.cross(s, e1)
    v = f * vm.dot(d, q)
    t = f * vm.dot(e2, q)
    mask = (
        (u > 0.0)
        & (u < 1.0)
        & (v > 0.0)
        & (u + v < 1.0)
        & (t > RAY_EPSILON)
        & (t < t_max)
    )
    return mask, t, u, v


# ---------------------------------------------------------------------------
# AABB slab test — used by the BVH traversal kernels
# ---------------------------------------------------------------------------


def aabb_hit(o, inv_d, box_min, box_max, t_max):
    """Slab test over [EPSILON, t_max) (AABB.cpp:38-52). All inputs [N,3]/[N]."""
    t0 = (box_min - o) * inv_d
    t1 = (box_max - o) * inv_d
    t_small = jnp.minimum(t0, t1)
    t_big = jnp.maximum(t0, t1)
    t_near = jnp.maximum(
        jnp.maximum(RAY_EPSILON, t_small[..., 0]),
        jnp.maximum(t_small[..., 1], t_small[..., 2]),
    )
    t_far = jnp.minimum(
        jnp.minimum(t_max, t_big[..., 0]), jnp.minimum(t_big[..., 1], t_big[..., 2])
    )
    return t_near < t_far
