"""Wavefront Whitted renderer.

The reference renders with a recursive per-packet ``bounce`` (Raytracer.cpp:87-400)
over 8-wide AVX2 lanes, scheduled as 32x32 tiles over pinned worker threads.  The
TPU-native shape is an **iterative bounce queue over the whole frame**: every
generation traces one wavefront of rays (primary = one ray per pixel), shades it,
scatter-adds its contribution into the framebuffer weighted by the throughput
accumulated along its ancestry, and compacts the surviving reflection/refraction
children into the next generation's fixed-capacity queue.  The recursion's
post-multiplications (material reflection colour, Fresnel weights, Beer's law) are
re-associated into per-ray throughput state:

  - ``weight`` [N,3]: product of ancestor coefficients (reflection colour, F_r/F_t)
  - ``sigma``  [N,3]: Beer absorption (transmittance - 1) of the medium this ray
    travels through; applied as exp(sigma * t_hit) at the ray's own hit — exactly
    the reference's ``colour_refraction * exp((trans-1) * refraction_distance)``
    (Raytracer.cpp:348-376) evaluated one level down.

Faithfulness notes (vs Raytracer.cpp:204-396):
  - a material with both reflection and transmittance adds its reflection subtree
    twice (once raw + once Fresnel-weighted), matching the reference exactly;
  - on a refracted miss the reference multiplies the sky by exp(sigma * inf); we
    clamp the Beer distance to 1e8, which matches for transmittance < 1 and avoids
    the reference's NaN when transmittance == 1.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..config import AIR_IOR, RenderConfig
from ..core import vecmath as vm
from ..ops import (
    compaction,
    intersect,
    sky_sample,
    texture_sample,
    traversal,
    traversal_wide,
)
from ..ops.intersect import Hits, Rays
from . import shading


def _traversal_module(cfg: RenderConfig):
    """Select the mesh traversal kernel (config.traversal_kernel)."""
    return traversal_wide if cfg.traversal_kernel == "wide" else traversal

_BEER_DIST_CLAMP = 1.0e8


class RenderStats(NamedTuple):
    """Per-category ray counters (PerformanceStats, Raytracer.h:4-9), counted per
    active lane (the reference counts packets x lane width)."""

    num_primary: jnp.ndarray
    num_shadow: jnp.ndarray
    num_reflection: jnp.ndarray
    num_refraction: jnp.ndarray
    num_dropped: jnp.ndarray  # queue-capacity overflow (no reference analog)
    num_incomplete: jnp.ndarray  # rays truncated by the traversal iteration ladder


# ---------------------------------------------------------------------------
# Primary rays
# ---------------------------------------------------------------------------


def primary_rays_for(scene, cfg: RenderConfig, pixel_idx) -> Rays:
    """Camera rays + closed-form direction differentials (Raytracer.cpp:34-59) for an
    arbitrary batch of global pixel indices (row-major).  Taking indices rather than a
    fixed grid lets the caller shard or permute pixels across devices."""
    i = (pixel_idx % cfg.width).astype(jnp.float32)
    j = (pixel_idx // cfg.width).astype(jnp.float32)
    direction = (
        scene.cam_x[None, :] * i[:, None]
        + scene.cam_y[None, :] * j[:, None]
        + scene.cam_top_left[None, :]
    )
    d_dot_d = vm.dot(direction, direction)
    inv_len = jax.lax.rsqrt(d_dot_d)
    denom = (inv_len / d_dot_d)[:, None]  # d_dot_d^-3/2

    dD_dx = (
        d_dot_d[:, None] * scene.cam_x[None, :]
        - vm.dot(direction, jnp.broadcast_to(scene.cam_x, direction.shape))[:, None]
        * direction
    ) * denom
    dD_dy = (
        d_dot_d[:, None] * scene.cam_y[None, :]
        - vm.dot(direction, jnp.broadcast_to(scene.cam_y, direction.shape))[:, None]
        * direction
    ) * denom

    n = pixel_idx.shape[0]
    origin = jnp.broadcast_to(scene.cam_pos, (n, 3))
    zeros = jnp.zeros((n, 3), jnp.float32)
    return Rays(
        origin=origin,
        direction=direction * inv_len[:, None],
        dO_dx=zeros,
        dO_dy=zeros,
        dD_dx=dD_dx,
        dD_dy=dD_dy,
    )


def generate_primary_rays(scene, cfg: RenderConfig) -> Rays:
    """Full-frame primary rays in row-major order."""
    return primary_rays_for(
        scene, cfg, jnp.arange(cfg.num_pixels, dtype=jnp.int32)
    )


# ---------------------------------------------------------------------------
# Scene intersection (Scene::trace_primitives / intersect_primitives)
# ---------------------------------------------------------------------------


def _mesh_hits_into(scene, rays: Rays, res: traversal.TraceResult, hits: Hits,
                    object_space_diffs: bool = False) -> Hits:
    """Reconstruct differentiable hit attributes from discrete traversal ids.

    Re-derives (t, u, v) with Moller-Trumbore from the identified triangle so
    gradients flow to vertices/instance transforms/ray, then evaluates the hit
    attribute + Ray Tracing Gems ch.20 differential formulas
    (BottomLevelBVH.cpp:260-305).
    """
    valid = res.tri >= 0
    ti = jnp.maximum(res.tri, 0)
    ii = jnp.maximum(res.inst, 0)

    # Per-lane rows gathered from NON-differentiable scene geometry (triangle
    # SoA, instance matrices) at discrete ids: pure functions of the saved
    # traversal result, so they are named checkpoint residuals ("gather") —
    # bwd then reuses the ~15 gathered rows per lane instead of re-issuing the
    # gathers (each ~13 ns/lane fixed cost, PERF.md round-3 step attribution).
    def g(arr, idx):
        return checkpoint_name(jnp.take(arr, idx, axis=0), "gather")

    inv = g(scene.inst_inv, ii)  # [N,3,4]
    world = g(scene.inst_world, ii)

    def xp(m, p):
        return jnp.einsum("nij,nj->ni", m[:, :, :3], p) + m[:, :, 3]

    def xd(m, d):
        return jnp.einsum("nij,nj->ni", m[:, :, :3], d)

    o_obj = xp(inv, rays.origin)
    d_obj = xd(inv, rays.direction)

    p0 = g(scene.tr_p0, ti)
    e1 = g(scene.tr_e1, ti)
    e2 = g(scene.tr_e2, ti)

    # differentiable re-derivation of (t, u, v) for the known triangle
    hmt = jnp.cross(d_obj, e2)
    a = vm.dot(e1, hmt)
    f = 1.0 / intersect._nonzero(a)
    s = o_obj - p0
    u = f * vm.dot(s, hmt)
    q = jnp.cross(s, e1)
    v = f * vm.dot(d_obj, q)
    t = f * vm.dot(e2, q)

    point = rays.origin + t[:, None] * rays.direction

    n0 = g(scene.tr_n0, ti)
    ne1 = g(scene.tr_ne1, ti)
    ne2 = g(scene.tr_ne2, ti)
    n_raw = n0 + u[:, None] * ne1 + v[:, None] * ne2
    normal = xd(world, vm.normalize(n_raw, eps=1e-20))

    t0 = g(scene.tr_t0, ti)
    te1 = g(scene.tr_te1, ti)
    te2 = g(scene.tr_te2, ti)
    uv = t0 + u[:, None] * te1 + v[:, None] * te2

    material = g(scene.tr_material, ti)

    # Ray Tracing Gems ch.20 differentials (BottomLevelBVH.cpp:275-305), in object
    # space; vector-valued outputs rotated to world (rigid transforms).
    dO_dx_o = xd(inv, rays.dO_dx)
    dO_dy_o = xd(inv, rays.dO_dy)
    dD_dx_o = xd(inv, rays.dD_dx)
    dD_dy_o = xd(inv, rays.dD_dy)
    one_over_k = 1.0 / intersect._nonzero(vm.dot(jnp.cross(e1, e2), d_obj))
    qx = dO_dx_o + t[:, None] * dD_dx_o
    qy = dO_dy_o + t[:, None] * dD_dy_o
    c_u = jnp.cross(e2, d_obj)
    c_v = jnp.cross(d_obj, e1)
    du_dx = one_over_k * vm.dot(c_u, qx)
    du_dy = one_over_k * vm.dot(c_u, qy)
    dv_dx = one_over_k * vm.dot(c_v, qx)
    dv_dy = one_over_k * vm.dot(c_v, qy)

    # Differential space convention (cfg.differentials_object_space): the
    # reference leaves dO/dN in OBJECT space (BottomLevelBVH.cpp:291-301;
    # Mesh.cpp:23-28 transforms only the incoming ray) — the world-space
    # rotation below is this framework's correction for rotated instances and
    # the documented default; the identity map reproduces reference semantics.
    rot = (lambda m, v: v) if object_space_diffs else xd
    dP_dx = rot(world, du_dx[:, None] * e1 + dv_dx[:, None] * e2)
    dP_dy = rot(world, du_dy[:, None] * e1 + dv_dy[:, None] * e2)

    dn_dx = du_dx[:, None] * ne1 + dv_dx[:, None] * ne2
    dn_dy = du_dy[:, None] * ne1 + dv_dy[:, None] * ne2
    n_dot_n = vm.dot(n_raw, n_raw) + 1e-20
    n_denom = (jax.lax.rsqrt(n_dot_n) / n_dot_n)[:, None]
    dN_dx = rot(world, (n_dot_n[:, None] * dn_dx - vm.dot(n_raw, dn_dx)[:, None] * n_raw) * n_denom)
    dN_dy = rot(world, (n_dot_n[:, None] * dn_dy - vm.dot(n_raw, dn_dy)[:, None] * n_raw) * n_denom)

    ds_dx = du_dx * te1[:, 0] + dv_dx * te2[:, 0]
    ds_dy = du_dy * te1[:, 0] + dv_dy * te2[:, 0]
    dt_dx = du_dx * te1[:, 1] + dv_dx * te2[:, 1]
    dt_dy = du_dy * te1[:, 1] + dv_dy * te2[:, 1]

    m3 = valid[:, None]
    return hits._replace(
        hit=hits.hit | valid,
        t=jnp.where(valid, t, hits.t),
        point=jnp.where(m3, point, hits.point),
        normal=jnp.where(m3, normal, hits.normal),
        material_id=jnp.where(valid, material, hits.material_id),
        u=jnp.where(valid, uv[:, 0], hits.u),
        v=jnp.where(valid, uv[:, 1], hits.v),
        ds_dx=jnp.where(valid, ds_dx, hits.ds_dx),
        ds_dy=jnp.where(valid, ds_dy, hits.ds_dy),
        dt_dx=jnp.where(valid, dt_dx, hits.dt_dx),
        dt_dy=jnp.where(valid, dt_dy, hits.dt_dy),
        dO_dx=jnp.where(m3, dP_dx, hits.dO_dx),
        dO_dy=jnp.where(m3, dP_dy, hits.dO_dy),
        dN_dx=jnp.where(m3, dN_dx, hits.dN_dx),
        dN_dy=jnp.where(m3, dN_dy, hits.dN_dy),
        bvh_steps=hits.bvh_steps + res.steps,
    )


def trace_scene(scene, bvh, rays: Rays, active, cfg: RenderConfig):
    """Closest hit over spheres -> planes -> two-level BVH (Scene.cpp:173-177).

    Returns (Hits, incomplete): the count of rays whose traversal budget ran out.
    """
    n = rays.count
    incomplete = jnp.int32(0)
    hits = intersect.make_miss_hits(n)
    for i in range(scene.n_spheres):
        hits = intersect.sphere_trace(
            rays, hits, scene.sph_center[i], scene.sph_radius[i], scene.sph_material[i]
        )
    for i in range(scene.n_planes):
        hits = intersect.plane_trace(
            rays,
            hits,
            scene.pln_normal[i],
            scene.pln_distance[i],
            scene.pln_u[i],
            scene.pln_v[i],
            scene.pln_material[i],
        )
    if bvh is not None:
        res = jax.lax.stop_gradient(
            _traversal_module(cfg).trace_closest(
                bvh, rays.origin, rays.direction, hits.t, active, cfg
            )
        )
        # Name the (zero-gradient) traversal outputs so the chunk checkpoint
        # policy saves them: the bwd pass then rematerializes only shading /
        # texturing, never the BVH walk (~65% of the frame, PERF.md).
        res = checkpoint_name(res, "trace")
        hits = _mesh_hits_into(
            scene, rays, res, hits,
            object_space_diffs=cfg.differentials_object_space,
        )
        incomplete = res.incomplete
    # lanes outside the wavefront are misses
    hits = hits._replace(hit=hits.hit & active)
    if cfg.scene_shard_axis is not None:
        hits, incomplete = _combine_hits_over_shards(
            hits, incomplete, cfg.scene_shard_axis
        )
    return hits, incomplete


def _combine_hits_over_shards(hits, incomplete, axis):
    """Min-t reduce reconstructed hit records across scene shards.

    The tensor-parallel mode (parallel/scene_shard.py) gives each device along
    `axis` a spatial subset of the triangle geometry; every shard traverses the
    full wavefront against its sub-scene and reconstructs hit attributes locally
    (only the owner of the winning triangle can gather its attributes), then the
    per-ray winner is selected by minimum hit distance.  Misses carry t=inf
    (make_miss_hits), so any real hit beats them; an all-miss ray deterministically
    keeps shard 0's miss record.  Analytic primitives are replicated, so ties
    between shards are bit-identical records and the argmin tie-break is benign."""
    t_all = jax.lax.all_gather(hits.t, axis)  # [S,N]
    k = jnp.argmin(t_all, axis=0)  # [N]

    def pick(f):
        g = jax.lax.all_gather(f, axis)  # [S,N,...]
        idx = k.reshape((1,) + k.shape + (1,) * (g.ndim - 1 - k.ndim))
        return jnp.take_along_axis(g, idx.astype(jnp.int32), axis=0)[0]

    return jax.tree_util.tree_map(pick, hits), jax.lax.psum(incomplete, axis)


def intersect_scene(scene, bvh, origin, direction, max_distance, active, cfg):
    """Any-hit chain with early-outs (Scene.cpp:179-190).

    Returns (blocked mask, incomplete count): `incomplete` counts shadow lanes
    the traversal ladder failed to finish — nonzero means possible light leaks
    (see traversal_wide.trace_any)."""
    rays = intersect.make_rays(origin, direction)
    blocked = jnp.zeros((origin.shape[0],), bool)
    incomplete = jnp.int32(0)
    for i in range(scene.n_spheres):
        blocked = blocked | intersect.sphere_intersect(
            rays, max_distance, scene.sph_center[i], scene.sph_radius[i]
        )
    for i in range(scene.n_planes):
        blocked = blocked | intersect.plane_intersect(
            rays, max_distance, scene.pln_normal[i], scene.pln_distance[i]
        )
    if bvh is not None:
        found, incomplete = _traversal_module(cfg).trace_any(
            bvh, origin, direction, max_distance, active & ~blocked, cfg
        )
        blocked = blocked | checkpoint_name(jax.lax.stop_gradient(found), "trace")
        incomplete = checkpoint_name(
            jax.lax.stop_gradient(incomplete), "trace"
        )
    if cfg.scene_shard_axis is not None:
        # a lane is shadowed if ANY scene shard's sub-geometry blocks it
        blocked = jax.lax.psum(blocked.astype(jnp.int32), cfg.scene_shard_axis) > 0
        incomplete = jax.lax.psum(incomplete, cfg.scene_shard_axis)
    return blocked & active, incomplete


# ---------------------------------------------------------------------------
# One bounce generation
# ---------------------------------------------------------------------------


class _Generation(NamedTuple):
    rays: Rays
    weight: jnp.ndarray  # [N,3] throughput
    sigma: jnp.ndarray  # [N,3] Beer absorption for this segment (<= 0)
    pixel: jnp.ndarray  # [N] int32 framebuffer index
    active: jnp.ndarray  # [N] bool


def _material_gather(scene, mid):
    """Per-lane material rows via ONE one-hot matmul over the packed table.

    The material buffer is tiny (MAX_MATERIALS=256, Config.h:18; real scenes
    carry far fewer), well under the measured ~500-row crossover where the
    MXU one-hot gather beats jnp.take (PERF.md round 5) — and, decisively, its
    VJP is the TRANSPOSED matmul (oh^T @ cot) instead of five per-table
    scatter-adds at ~27 ns/scattered-lane (the bwd scatter cost model).
    precision=HIGHEST makes the dot reproduce jnp.take bit-for-bit, including
    the int texture ids carried as exact f32 values (< 2^24) — verified on
    TPU in scratch/bench_topgather.py."""
    m_rows = scene.mat_diffuse.shape[0]
    packed = jnp.concatenate(
        [
            scene.mat_diffuse,
            scene.mat_reflection,
            scene.mat_transmittance,
            scene.mat_ior[:, None],
            scene.mat_texture.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )  # [M,11]
    oh = jax.nn.one_hot(mid, m_rows, dtype=jnp.float32)
    rows = checkpoint_name(
        jax.lax.dot_general(
            oh, packed, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        ),
        "gather",
    )
    return (
        rows[:, 0:3],
        rows[:, 3:6],
        rows[:, 6:9],
        rows[:, 9],
        jnp.round(rows[:, 10]).astype(jnp.int32),
    )


def _tex_tuple(scene):
    return (
        scene.tex_data,
        scene.tex_width,
        scene.tex_height,
        scene.tex_levels,
        scene.tex_offsets,
        scene.tex_quad,
    )


def _shade_generation(
    scene, bvh, gen: _Generation, fb, spawn: bool, cfg, stats, spawn_mask=None,
    secondary: bool = False, tex4=None, identity_pixels: bool = False,
):
    """Trace + shade one generation; returns (fb, child candidates or None, stats).

    ``spawn`` (Python bool) statically removes the child-candidate section.
    ``spawn_mask`` (traced scalar bool, scan path) instead gates spawning
    dynamically: the last scan iteration computes the candidate math but masks
    every child inactive, keeping stats and queue contents identical to the
    unrolled loop's spawn=False final bounce.  ``secondary`` selects the
    secondary-generation traversal ladders (config.wide_rounds*_secondary) —
    tight secondary queues have a higher active fraction than scene-tuned
    primary ladders assume.  ``identity_pixels`` (static) declares
    gen.pixel == arange(n): the framebuffer accumulation becomes a DENSE add
    instead of a scatter-add (bit-identical; a scatter at iota indices is the
    same sum), which XLA does not infer on its own — generation 0 always
    qualifies by construction (render_wavefront)."""
    if secondary:
        if cfg.wide_rounds_secondary is not None:
            cfg = cfg.replace(wide_rounds=cfg.wide_rounds_secondary)
        if cfg.wide_rounds_any_secondary is not None:
            cfg = cfg.replace(wide_rounds_any=cfg.wide_rounds_any_secondary)
    rays = gen.rays
    n = rays.count
    hits, incomplete = trace_scene(scene, bvh, rays, gen.active, cfg)
    stats = stats._replace(num_incomplete=stats.num_incomplete + incomplete)
    hit = hits.hit

    def fb_add(fb, contribution):
        if identity_pixels:
            return fb + contribution  # == scatter-add at iota indices
        return fb.at[gen.pixel].add(contribution)

    if cfg.visualize_heatmap:
        # Raytracer.cpp:97-102: steps scaled by (1/32, 1/256, 1/512)
        steps = hits.bvh_steps.astype(jnp.float32)
        heat = jnp.stack([steps / 32.0, steps / 256.0, steps / 512.0], axis=-1)
        fb = fb_add(fb, jnp.where(gen.active[:, None], heat, 0.0))
        return fb, None, stats

    # Beer's law along this segment (evaluated at the child level; see module doc)
    t_seg = jnp.minimum(jnp.where(hit, hits.t, jnp.inf), _BEER_DIST_CLAMP)
    beer = jnp.exp(gen.sigma * t_seg[:, None])
    w = gen.weight * beer

    # sky on miss (Raytracer.cpp:104-111).  Accumulated with the shaded surface
    # contribution below into ONE framebuffer update: the two terms are
    # disjoint-masked (miss vs hit), so fb+a+b == fb+(a+b) bit-for-bit while
    # halving the per-generation fb scatter count.
    miss = gen.active & ~hit
    sky_rgb = sky_sample.sample_sky(scene.sky_data, scene.sky_size, rays.direction)
    contribution = jnp.where(miss[:, None], w * sky_rgb, 0.0)

    # material albedo: per-lane gather + texture filter (Raytracer.cpp:117-141)
    mid = jnp.where(hit, hits.material_id, 0)
    diffuse_c, refl_c, trans_c, ior, tex_id = _material_gather(scene, mid)
    tex = _tex_tuple(scene)
    if scene.tex_data.shape[0] > 1:
        albedo = diffuse_c * texture_sample.sample(
            tex, tex_id, hits.u, hits.v, hits.ds_dx, hits.ds_dy, hits.dt_dx,
            hits.dt_dy, cfg, data4=tex4,
        )
    else:
        # static fast path: no textures in the scene (atlas is the white texel),
        # get_albedo == diffuse (Material.h:16-22)
        albedo = diffuse_c
    albedo = jnp.where(hit[:, None], albedo, 0.0)
    diffuse_mask = vm.length_squared(albedo) > 0.0

    # direct lighting with shadow rays (Raytracer.cpp:143-201).  All lights' shadow
    # rays are batched into ONE any-hit traversal of L*N rays — one traversal
    # program instead of one per light, with the same per-ray work.
    to_camera = vm.normalize(scene.cam_pos[None, :] - hits.point, eps=1e-20)
    light_acc = jnp.full((n, 3), 0.0, jnp.float32) + scene.ambient
    shadow_active = diffuse_mask  # already implies hit
    inf = jnp.full((n,), jnp.inf, jnp.float32)

    n_lights = (
        scene.n_point_lights + scene.n_spot_lights + scene.n_directional_lights
    )
    if n_lights:
        # Shadow rays are only traced where the light could contribute at all
        # (front-facing, inside the spot cone): a zero Blinn-Phong term makes the
        # shadow result irrelevant (Light.h:15-19), so culling is result-identical
        # and skips most of the any-hit work.
        dirs, dists, contribs = [], [], []
        for i in range(scene.n_point_lights):
            to_l = scene.pl_pos[i][None, :] - hits.point
            d2 = vm.length_squared(to_l)
            dist = jnp.sqrt(d2)
            to_l = to_l / dist[:, None]
            dirs.append(to_l)
            dists.append(dist)
            contribs.append(
                shading.point_light(
                    hits.normal, to_l, to_camera, scene.pl_colour[i][None, :], d2
                )
            )
        for i in range(scene.n_spot_lights):
            to_l = scene.sl_pos[i][None, :] - hits.point
            d2 = vm.length_squared(to_l)
            dist = jnp.sqrt(d2)
            to_l = to_l / dist[:, None]
            dirs.append(to_l)
            dists.append(dist)
            contribs.append(
                shading.spot_light(
                    hits.normal, to_l, to_camera, scene.sl_colour[i][None, :], d2,
                    scene.sl_neg_dir[i][None, :], scene.sl_inner[i],
                    scene.sl_outer[i],
                )
            )
        for i in range(scene.n_directional_lights):
            neg_dir = jnp.broadcast_to(scene.dl_neg_dir[i], hits.point.shape)
            dirs.append(neg_dir)
            dists.append(inf)
            contribs.append(
                shading.directional_light(
                    hits.normal, to_camera, scene.dl_colour[i][None, :],
                    scene.dl_neg_dir[i],
                )
            )
        shadow_origin = hits.point
        if cfg.shadow_normal_offset:
            # off-surface origins de-marginalize the any-hit decision (PERF.md);
            # front-facing cull guarantees +normal is the light side
            shadow_origin = shadow_origin + cfg.shadow_normal_offset * hits.normal
        origin_all = jnp.tile(shadow_origin, (n_lights, 1))
        contrib_mask = jnp.stack(
            [vm.length_squared(c) > 0.0 for c in contribs], axis=0
        )  # [L,N]
        blocked, shadow_incomplete = intersect_scene(
            scene,
            bvh,
            origin_all,
            jnp.concatenate(dirs, axis=0),
            jnp.concatenate(dists, axis=0),
            jnp.tile(shadow_active, n_lights) & contrib_mask.reshape(-1),
            cfg,
        )
        blocked = blocked.reshape(n_lights, n)
        stats = stats._replace(
            num_incomplete=stats.num_incomplete + shadow_incomplete
        )
        for li in range(n_lights):
            light_acc = light_acc + jnp.where(
                (shadow_active & ~blocked[li])[:, None], contribs[li], 0.0
            )
        stats = stats._replace(
            num_shadow=stats.num_shadow
            + jnp.sum(
                (shadow_active[None, :] & contrib_mask).astype(jnp.int32)
            )
        )

    fb = fb_add(fb, contribution + w * albedo * light_acc)

    if not spawn:
        return fb, None, stats

    # ---- spawn reflection / refraction children (Raytracer.cpp:204-396) ----
    refl_flag = hit & (vm.length_squared(refl_c) > 0.0)
    refr_flag = hit & (vm.length_squared(trans_c) > 0.0)
    if spawn_mask is not None:
        refl_flag = refl_flag & spawn_mask
        refr_flag = refr_flag & spawn_mask

    d = rays.direction
    nrm = hits.normal
    dot_dn = vm.dot(d, nrm)
    entering = dot_dn < 0.0  # dot_mask (Raytracer.cpp:275)

    n1 = jnp.where(entering, AIR_IOR, ior)
    n2 = jnp.where(entering, ior, AIR_IOR)
    cos_theta = jnp.where(entering, -dot_dn, dot_dn)
    n_oriented = jnp.where(entering[:, None], nrm, -nrm)
    eta = n1 / n2
    k = 1.0 - eta * eta * (1.0 - cos_theta * cos_theta)
    tir = refr_flag & (k < 0.0)

    refr_dir = vm.refract(d, n_oriented, eta, cos_theta, k)

    # Schlick Fresnel (Raytracer.cpp:378-391)
    r0 = (n1 - n2) / (n1 + n2)
    r0 = r0 * r0
    cos_f = jnp.where(n1 > n2, -vm.dot(refr_dir, n_oriented), cos_theta)
    omc = 1.0 - cos_f
    omc2 = omc * omc
    f_r = r0 + ((1.0 - r0) * omc2) * (omc2 * omc)
    f_t = 1.0 - f_r

    # reflection child
    refl_dir = vm.reflect(d, nrm)
    refl_coeff = refl_c * (
        1.0
        + jnp.where(refr_flag, jnp.where(tir, 1.0, f_r), 0.0)[:, None]
    )
    w_refl = w * refl_coeff

    # Igehy reflection differentials (Raytracer.cpp:254-262)
    ddn_dx = vm.dot(rays.dD_dx, nrm) + vm.dot(d, hits.dN_dx)
    ddn_dy = vm.dot(rays.dD_dy, nrm) + vm.dot(d, hits.dN_dy)
    refl_dD_dx = rays.dD_dx - 2.0 * (
        dot_dn[:, None] * hits.dN_dx + ddn_dx[:, None] * nrm
    )
    refl_dD_dy = rays.dD_dy - 2.0 * (
        dot_dn[:, None] * hits.dN_dy + ddn_dy[:, None] * nrm
    )

    # Igehy refraction differentials (Raytracer.cpp:325-342)
    d_dot_n = -cos_theta
    dprime_dot_n = -vm.safe_sqrt(k)
    mu = -(eta * cos_theta + dprime_dot_n)
    factor = eta + (eta * eta * cos_theta) / jnp.where(
        dprime_dot_n == 0.0, -1e-8, dprime_dot_n
    )
    dmu_dx = factor * ddn_dx
    dmu_dy = factor * ddn_dy
    refr_dD_dx = eta[:, None] * rays.dD_dx - (
        (mu * d_dot_n)[:, None] + vm.dot(hits.dN_dx, nrm)[:, None] * nrm
    ) * ddn_dx[:, None]
    refr_dD_dy = eta[:, None] * rays.dD_dy - (
        (mu * d_dot_n)[:, None] + vm.dot(hits.dN_dy, nrm)[:, None] * nrm
    ) * ddn_dy[:, None]
    del dmu_dx, dmu_dy  # reference computes but folds into the formulas above

    refr_active = refr_flag & ~tir
    w_refr = w * f_t[:, None]
    refr_sigma = jnp.where(
        (refr_active & entering)[:, None], trans_c - 1.0, 0.0
    )

    stats = stats._replace(
        num_reflection=stats.num_reflection + jnp.sum(refl_flag.astype(jnp.int32)),
        num_refraction=stats.num_refraction + jnp.sum(refr_active.astype(jnp.int32)),
    )

    zeros3 = jnp.zeros((n, 3), jnp.float32)
    cand = dict(
        origin=jnp.concatenate([hits.point, hits.point], axis=0),
        direction=jnp.concatenate([refl_dir, refr_dir], axis=0),
        dO_dx=jnp.concatenate([hits.dO_dx, hits.dO_dx], axis=0),
        dO_dy=jnp.concatenate([hits.dO_dy, hits.dO_dy], axis=0),
        dD_dx=jnp.concatenate([refl_dD_dx, refr_dD_dx], axis=0),
        dD_dy=jnp.concatenate([refl_dD_dy, refr_dD_dy], axis=0),
        weight=jnp.concatenate([w_refl, w_refr], axis=0),
        sigma=jnp.concatenate([zeros3, refr_sigma], axis=0),
        pixel=jnp.concatenate([gen.pixel, gen.pixel], axis=0),
        active=jnp.concatenate([refl_flag, refr_active], axis=0),
    )
    return fb, cand, stats


def _compact(cand: dict, capacity: int):
    """Stable-compact active child candidates into a fixed-capacity queue.

    Deliberately NOT octant-sorted (unlike the ladder boundaries,
    traversal_wide._run_rounds): sorting the queue reorders which dead-branch
    candidate data (TIR refraction differentials etc.) flows through the next
    generation's unselected where-branches, and their derivative chains
    NaN-poison camera/ior gradients (0 x inf) — measured round 4, worth only
    ~2% forward.  The ladder-boundary sort operates strictly inside
    stop_gradient'd traversal and keeps the locality win safely."""
    flags = cand["active"]
    # stable O(N) partition: actives first in order; overflow slots repeat
    # one inactive lane (inert: weight only lands where sel["active"] True)
    sel = compaction.compact_indices(flags, capacity)
    out = {k: v[sel] for k, v in cand.items()}
    n_active = jnp.sum(flags.astype(jnp.int32))
    # capacity > n_active slots hold compact_indices' fallback lane, which is
    # only guaranteed inert when an unflagged lane exists; when EVERY candidate
    # is active (possible on tiny frames where capacity > candidate count) the
    # fallback duplicates an active lane — mask by slot so a duplicated ray can
    # never double-count its radiance/gradient (ADVICE.md round 2)
    out["active"] = out["active"] & (
        jnp.arange(capacity, dtype=jnp.int32) < n_active
    )
    dropped = jnp.maximum(0, n_active - capacity)
    return out, dropped


# ---------------------------------------------------------------------------
# Top-level render
# ---------------------------------------------------------------------------


def render_wavefront(scene, cfg: RenderConfig, pixel_idx, bvh=None, tex4=None):
    """Render an arbitrary batch of pixels; returns (rgb [n,3], RenderStats).

    This is the shardable unit: pixel_idx may be any subset/permutation of the frame
    (strided across devices for load balance, SURVEY.md section 7 hard parts).
    Negative pixel indices mark padding lanes: they trace nothing and contribute
    zero.  ``bvh`` is the prebuilt frame traversal structure; passing it lets the
    chunked driver hoist the per-frame assembly out of the chunk loop.
    """
    n = pixel_idx.shape[0]
    lane_active = pixel_idx >= 0
    if tex4 is None and scene.tex_data.shape[0] > 1:
        from ..config import TextureSampleMode

        if cfg.texture_sample_mode != TextureSampleMode.NEAREST:
            # direct callers (accum/train microbatches) get the same one-per-
            # program quad-atlas expansion render_pixels hoists to frame level
            tex4 = texture_sample.expand_quads(_tex_tuple(scene))
    rays = primary_rays_for(scene, cfg, jnp.maximum(pixel_idx, 0))
    fb = jnp.zeros((n, 3), jnp.float32)
    stats = RenderStats(
        num_primary=jnp.sum(lane_active.astype(jnp.int32)),
        num_shadow=jnp.int32(0),
        num_reflection=jnp.int32(0),
        num_refraction=jnp.int32(0),
        num_dropped=jnp.int32(0),
        num_incomplete=jnp.int32(0),
    )

    if bvh is None and scene.n_instances > 0:
        bvh = _traversal_module(cfg).build_scene_bvh(scene)

    gen = _Generation(
        rays=rays,
        weight=jnp.ones((n, 3), jnp.float32),
        sigma=jnp.zeros((n, 3), jnp.float32),
        pixel=jnp.arange(n, dtype=jnp.int32),
        active=lane_active,
    )

    qf = cfg.queue_factor
    factors = tuple(qf) if isinstance(qf, (tuple, list)) else (qf,)
    depth = 0 if cfg.visualize_heatmap else cfg.num_bounces

    def gen_from_sel(sel):
        return _Generation(
            rays=Rays(
                origin=sel["origin"],
                direction=sel["direction"],
                dO_dx=sel["dO_dx"],
                dO_dy=sel["dO_dy"],
                dD_dx=sel["dD_dx"],
                dD_dy=sel["dD_dy"],
            ),
            weight=sel["weight"],
            sigma=sel["sigma"],
            pixel=sel["pixel"],
            active=sel["active"],
        )

    if cfg.scan_bounces and depth >= 2:
        # ONE traced bounce body for every secondary generation: all secondary
        # queues share the bounce-1 capacity (>= any decaying per-bounce factor,
        # so drops can only decrease) and the pipeline rolls up as a lax.scan —
        # the traversal ladders + shading compile once instead of once per
        # bounce, roughly halving the 1080p program's compile time (PERF.md r3).
        fb, cand, stats = _shade_generation(
            scene, bvh, gen, fb, True, cfg, stats, tex4=tex4,
            identity_pixels=True,
        )
        # max over the tuple (not factors[0]) so the shared capacity dominates
        # every unrolled per-bounce capacity even for non-decreasing tuples —
        # the scan path can then only drop FEWER rays than the unrolled loop
        capacity = max(min(int(round(n * max(factors))), 2 * n), 64)
        sel, dropped = _compact(cand, capacity)
        stats = stats._replace(num_dropped=stats.num_dropped + dropped)
        gen = gen_from_sel(sel)

        def bounce_body(carry, is_last):
            gen, fb, stats = carry
            fb, cand, stats = _shade_generation(
                scene, bvh, gen, fb, True, cfg, stats, spawn_mask=~is_last,
                secondary=True, tex4=tex4,
            )
            sel, dropped = _compact(cand, capacity)
            stats = stats._replace(num_dropped=stats.num_dropped + dropped)
            return (gen_from_sel(sel), fb, stats), None

        is_last = jnp.arange(1, depth + 1) == depth
        (gen, fb, stats), _ = jax.lax.scan(bounce_body, (gen, fb, stats), is_last)
        return fb, stats

    for bounce in range(depth + 1):
        spawn = bounce < depth
        fb, cand, stats = _shade_generation(
            scene, bvh, gen, fb, spawn, cfg, stats, secondary=bounce > 0,
            tex4=tex4, identity_pixels=bounce == 0,
        )
        if cand is None:
            break
        f = factors[min(bounce, len(factors) - 1)]
        capacity = max(min(int(round(n * f)), 2 * gen.pixel.shape[0]), 64)
        sel, dropped = _compact(cand, capacity)
        stats = stats._replace(num_dropped=stats.num_dropped + dropped)
        gen = gen_from_sel(sel)

    return fb, stats


def render_pixels(scene, cfg: RenderConfig, pixel_idx):
    """Chunked wavefront render over an arbitrary pixel batch.

    The analog of the reference's 32x32-tile decomposition (WorkerThread.cpp:53-69,
    Window.h:32-33): the batch is cut into fixed-size chunks of
    ``cfg.traversal_chunk`` pixels and rendered by ONE compiled chunk program
    iterated with ``lax.map``.  This bounds both the XLA program size (the bounce
    pipeline is traced once, not once per frame-sized wavefront) and, with
    ``jax.checkpoint`` on the chunk body, the reverse-mode activation memory — the
    bwd pass rematerializes one chunk at a time instead of saving whole-frame
    residuals.

    Chunks take *strided* lanes (chunk c gets pixels c, c+n_chunks, ...) so each
    chunk sees a uniform sample of the frame: per-chunk secondary-queue load stays
    balanced even when geometry is concentrated in one screen region (the same
    argument as strided device sharding, SURVEY.md section 7).
    """
    n = pixel_idx.shape[0]
    chunk = min(cfg.traversal_chunk, n)
    n_chunks = -(-n // chunk)
    bvh = (
        _traversal_module(cfg).build_scene_bvh(scene)
        if scene.n_instances > 0
        else None
    )
    # frame-level hoist of the quad-row atlas: scene-only, so every chunk x
    # generation shares ONE whole-atlas gather instead of re-expanding per
    # sample() call inside the lax.map body
    from ..config import TextureSampleMode

    tex4 = (
        texture_sample.expand_quads(_tex_tuple(scene))
        if scene.tex_data.shape[0] > 1
        and cfg.texture_sample_mode != TextureSampleMode.NEAREST
        else None
    )
    if n_chunks <= 1:
        return render_wavefront(scene, cfg, pixel_idx, bvh=bvh, tex4=tex4)

    padded = n_chunks * chunk
    idx = jnp.concatenate(
        [pixel_idx, jnp.full((padded - n,), -1, pixel_idx.dtype)]
    )
    if cfg.chunk_strided:
        idx_chunks = idx.reshape(chunk, n_chunks).T  # [n_chunks, chunk], strided
    else:
        # contiguous row-blocks: adjacent pixels share a chunk, so primary
        # rays (and their children) walk overlapping subtrees — trades the
        # strided layout's load balance for gather locality; per-chunk queue
        # overflow on geometry-dense blocks surfaces as num_dropped
        idx_chunks = idx.reshape(n_chunks, chunk)

    # save-named policy: traversal outputs ("trace": discrete, stop_gradient'd —
    # see trace_scene/intersect_scene) AND per-lane gather results ("gather":
    # triangle/instance rows, material rows, texture taps, sky texels) are kept
    # as residuals; the cheap VPU math between them is rematerialized.  bwd
    # therefore never re-walks the BVH and never re-issues the id-indexed
    # gather chains (each gather op ~13 ns/lane fixed, PERF.md) — it replays
    # only fused elementwise shading math between saved rows.
    def body(ic):
        return render_wavefront(scene, cfg, ic, bvh=bvh, tex4=tex4)

    if cfg.chunk_checkpoint:
        body = jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_only_these_names(
                "trace", "gather"
            ),
        )

    fb_c, stats_c = jax.lax.map(body, idx_chunks)
    if cfg.chunk_strided:
        # invert the strided layout: chunk c's slot k holds pixel k*n_chunks+c
        fb = fb_c.transpose(1, 0, 2).reshape(padded, 3)[:n]
    else:
        fb = fb_c.reshape(padded, 3)[:n]
    stats = jax.tree_util.tree_map(lambda x: jnp.sum(x, axis=0), stats_c)
    return fb, stats


def render_with_stats(scene, cfg: RenderConfig):
    """Render one full frame; returns (linear [H,W,3] image, RenderStats)."""
    fb, stats = render_pixels(
        scene, cfg, jnp.arange(cfg.num_pixels, dtype=jnp.int32)
    )
    return fb.reshape(cfg.height, cfg.width, 3), stats


def present(image, cfg: RenderConfig):
    """Post pass: FXAA + gamma, or plain gamma — the fullscreen shader stage
    (Window.cpp:52-63, fragment_fxaa.glsl / fragment_identity.glsl)."""
    from ..ops import fxaa

    if cfg.enable_fxaa:
        return fxaa.fxaa(image)
    return jnp.clip(image, 0.0, 1.0) ** (1.0 / 2.2)


def render(scene, cfg: RenderConfig):
    """Render one frame -> linear [H,W,3] image."""
    return render_with_stats(scene, cfg)[0]


def render_frames(scene_stack, cfg: RenderConfig):
    """Render a BATCH of packed frames in ONE dispatch.

    ``scene_stack``: a DeviceScene pytree whose leaves carry a leading frame
    axis (host-side: animate + ScenePacker.frame per step, then
    ``jax.tree_util.tree_map(lambda *xs: np.stack(xs), *frames)``).  The body
    compiles once (lax.map) and the whole animation batch costs one
    dispatch round-trip instead of one per frame — on the tunneled runtime
    each dispatch costs ~40 ms of RTT (PERF.md platform model, lever #2), so
    batching N frames saves (N-1) x RTT of wall clock for interactive-style
    workloads (the reference's frame loop, Main.cpp:51-118).

    Returns (images [N,H,W,3], stats with a leading [N] axis).
    """
    return jax.lax.map(lambda s: render_with_stats(s, cfg), scene_stack)


class Renderer:
    """Convenience wrapper: jit-compiled render for a fixed config."""

    def __init__(self, cfg: RenderConfig):
        self.cfg = cfg
        self._render = jax.jit(lambda scene: render_with_stats(scene, cfg))

    def __call__(self, scene):
        return self._render(scene)


def lossless_fallback_config(cfg: RenderConfig) -> RenderConfig:
    """The lossless execution profile for ``cfg``'s workload shape.

    queue_factor=2.0 is capacity-lossless by construction (a surface spawns at
    most 2 children, Raytracer.cpp:249-316); the single full-capacity ladder
    rounds remove every compaction-capacity assumption (no lane can be starved
    by a round capacity — only by the iteration budget, which is set ~2x past
    the deepest measured walk and still audited by num_incomplete); the larger
    stack removes the overflow path.  Costs several times the scene-tuned
    profile — which is exactly why it is the RETRY profile, not the default
    (see RobustRenderer)."""
    return cfg.replace(
        queue_factor=2.0,
        wide_rounds=((1.0, 128),),
        wide_rounds_any=((1.0, 64),),
        wide_rounds_secondary=((1.0, 128),),
        wide_rounds_any_secondary=((1.0, 64),),
        wide_stack_size=max(cfg.wide_stack_size, 24),
    )


def intermediate_fallback_config(cfg: RenderConfig) -> RenderConfig:
    """Middle retry tier: the untuned DEFAULT ladders + a 0.5 queue factor —
    covers most hot poses (measured: everything on the fitted fly-through
    except dielectric closeups that spawn ~2 children/lane) at roughly 4x the
    tuned cost instead of the full lossless profile's ~15x (PERF.md round-5
    pose-sweep artifact)."""
    base = RenderConfig()
    return cfg.replace(
        queue_factor=0.5,
        wide_rounds=base.wide_rounds,
        wide_rounds_any=base.wide_rounds_any,
        wide_rounds_secondary=((1.0, 16),) + tuple(base.wide_rounds[1:]),
        wide_rounds_any_secondary=((1.0, 8),) + tuple(base.wide_rounds_any[1:]),
    )


class RobustRenderer:
    """Scene-tuned render with same-frame lossy-counter-triggered retries.

    Static XLA shapes mean queue capacities and ladder rounds cannot adapt to
    the frame's actual workload — and a single static capacity cannot be both
    fast and lossless: a camera pose staring into a dielectric mesh spawns ~2
    children per lane (measured on the sponza spline fly-through,
    tests/test_pose_sweep.py), which only the reference-lossless factor 2.0
    covers, while typical poses need < 1/8 of that.  The TPU-native resolution
    is host-side control flow between compiled programs: render with the
    scene-tuned profile, read back the frame's loss counters (num_dropped /
    num_incomplete — maintained for exactly this), and escalate THIS frame
    through the fallback tiers (intermediate, then fully lossless) until the
    counters are zero.  Typical frames pay only the tuned cost; hot frames pay
    extra dispatches and stay correct — the analog of the reference's
    unconditionally lossless recursion (Raytracer.cpp:249-316) at amortized
    tuned-profile cost.  Each tier compiles lazily on its first use.
    """

    def __init__(self, cfg: RenderConfig, fallback_cfgs=None):
        self.cfg = cfg
        if fallback_cfgs is None:
            fallback_cfgs = (
                intermediate_fallback_config(cfg),
                lossless_fallback_config(cfg),
            )
        self.tiers = (cfg,) + tuple(fallback_cfgs)
        self._fns = [
            jax.jit(lambda s, c=c: render_with_stats(s, c)) for c in self.tiers
        ]

    def __call__(self, scene):
        """Returns (image, stats, retried: bool)."""
        retried = False
        for fn in self._fns:
            img, stats = fn(scene)
            if int(stats.num_dropped) + int(stats.num_incomplete) == 0:
                return img, stats, retried
            retried = True
        # even the lossless tier reported loss counters: surface it (callers
        # assert the counters; silent acceptance would hide a real bug)
        return img, stats, retried
