"""Wavefront two-level BVH traversal (TLAS over instances -> per-mesh BLAS).

TPU-native re-design of the reference's nested stack walks (TopLevelBVH.cpp:53-129
delegating to BottomLevelBVH.cpp:348-437 through Mesh::trace's object-space transform,
Mesh.cpp:17-31).  Instead of recursing into a second traversal at TLAS leaves, the two
levels share ONE per-ray stack whose entries are (node index, instance id): popping a
TLAS leaf pushes the instance's BLAS root with its instance id, and every node test
transforms the ray by that entry's inverse instance matrix on the fly.  The whole
wavefront advances in lockstep, one stack pop (or one leaf-triangle test) per ray per
iteration, with per-ray early termination — masks replace the reference's packet lane
masks, gathers replace its pointer chasing, and a `lax.while_loop` runs until every
ray in the chunk has drained its stack.

Leaf triangles are iterated one per step through a (tri_i, tri_end) cursor, so leaf
size is unbounded and control flow stays uniform (no data-dependent inner loops).
Rays are processed in fixed-size chunks (lax.map) to bound per-ray stack memory.

Traversal is geometry-discrete: it returns hit ids + (t, u, v, steps) and is wrapped
in stop_gradient by the renderer; differentiable hit attributes are reconstructed
from the ids afterwards.

Ordered descent picks the near child from the node's split axis and the sign of the
(instance-space) ray direction — per-ray, an improvement over the reference's lane-0
vote (BVHNode.h:30-40).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import RenderConfig, TraversalStrategy
from . import intersect


class SceneBVH(NamedTuple):
    """Unified node arrays for one frame: [TLAS | concatenated BLASes].

    kind: 0 = internal, 1 = TLAS leaf (left = instance id), 2 = BLAS leaf
    (left = first global triangle, count = triangle count).
    inst_inv1: [I+1, 3, 4] inverse instance matrices with the identity prepended so
    TLAS entries (inst id -1) index slot 0.
    """

    node_min: jnp.ndarray  # [U,3]
    node_max: jnp.ndarray
    node_left: jnp.ndarray  # [U]
    node_count: jnp.ndarray  # [U]
    node_axis: jnp.ndarray  # [U]
    node_kind: jnp.ndarray  # [U] int32
    inst_inv1: jnp.ndarray  # [I+1,3,4]
    inst_root: jnp.ndarray  # [I] global root node of each instance's BLAS
    tri_p0: jnp.ndarray  # [T,3]
    tri_e1: jnp.ndarray
    tri_e2: jnp.ndarray


def build_scene_bvh(scene) -> SceneBVH:
    """Concatenate the frame's TLAS with the static BLAS arrays (device-side).

    The TLAS is tiny (2 nodes per instance) so this is a cheap per-frame copy of the
    static BLAS block; shapes are static for a fixed scene, so jit caches the program.
    """
    n_tlas = scene.tl_min.shape[0]
    identity = jnp.concatenate(
        [jnp.eye(3, dtype=jnp.float32), jnp.zeros((3, 1), jnp.float32)], axis=1
    )
    inst_inv1 = jnp.concatenate([identity[None], scene.inst_inv], axis=0)

    # globalize BLAS internal child indices by the TLAS block size
    blas_internal = scene.nd_count == 0
    nd_left = jnp.where(blas_internal, scene.nd_left + n_tlas, scene.nd_left)
    tl_internal = scene.tl_count == 0

    node_min = jnp.concatenate([scene.tl_min, scene.nd_min], axis=0)
    node_max = jnp.concatenate([scene.tl_max, scene.nd_max], axis=0)
    node_left = jnp.concatenate([scene.tl_left, nd_left], axis=0)
    node_count = jnp.concatenate([scene.tl_count, scene.nd_count], axis=0)
    node_axis = jnp.concatenate([scene.tl_axis, scene.nd_axis], axis=0)
    kind = jnp.concatenate(
        [
            jnp.where(tl_internal, 0, 1).astype(jnp.int32),
            jnp.where(blas_internal, 0, 2).astype(jnp.int32),
        ],
        axis=0,
    )
    return SceneBVH(
        node_min=node_min,
        node_max=node_max,
        node_left=node_left,
        node_count=node_count,
        node_axis=node_axis,
        node_kind=kind,
        inst_inv1=inst_inv1,
        inst_root=scene.inst_root + n_tlas,
        tri_p0=scene.tr_p0,
        tri_e1=scene.tr_e1,
        tri_e2=scene.tr_e2,
    )


class TraceResult(NamedTuple):
    t: jnp.ndarray  # [N] closest hit distance (inf = miss)
    tri: jnp.ndarray  # [N] int32 global triangle id (-1 = miss)
    inst: jnp.ndarray  # [N] int32 instance id (-1 = miss)
    u: jnp.ndarray  # [N] barycentric u
    v: jnp.ndarray  # [N]
    steps: jnp.ndarray  # [N] int32 node pops (heatmap, RayHit.h:24-26)


def _xform_pos(m, p):
    return jnp.einsum("nij,nj->ni", m[:, :, :3], p) + m[:, :, 3]


def _xform_dir(m, d):
    return jnp.einsum("nij,nj->ni", m[:, :, :3], d)


def _traverse_chunk(bvh: SceneBVH, o, d, t_init, active_in, cfg, any_hit: bool):
    """Core lockstep stack walk for one chunk of rays.

    Closest-hit mode returns TraceResult; any-hit mode returns a blocked mask.
    """
    n = o.shape[0]
    stack_depth = cfg.traversal_stack_size
    rows = jnp.arange(n)

    # stacks have one spill column; writes to column `stack_depth` are discards
    stack_node = jnp.zeros((n, stack_depth + 1), jnp.int32)
    stack_inst = jnp.full((n, stack_depth + 1), -1, jnp.int32)
    sp = jnp.where(active_in, 1, 0).astype(jnp.int32)  # root pre-pushed at slot 0

    state = dict(
        stack_node=stack_node,
        stack_inst=stack_inst,
        sp=sp,
        inst_cur=jnp.full((n,), -1, jnp.int32),
        tri_i=jnp.zeros((n,), jnp.int32),
        tri_end=jnp.zeros((n,), jnp.int32),
        t_best=t_init,
        best_tri=jnp.full((n,), -1, jnp.int32),
        best_inst=jnp.full((n,), -1, jnp.int32),
        best_u=jnp.zeros((n,), jnp.float32),
        best_v=jnp.zeros((n,), jnp.float32),
        steps=jnp.zeros((n,), jnp.int32),
        found=jnp.zeros((n,), bool),
    )

    def cond(s):
        live = (s["sp"] > 0) | (s["tri_i"] < s["tri_end"])
        if any_hit:
            live = live & ~s["found"]
        return jnp.any(live)

    def body(s):
        if any_hit:
            live_ray = ~s["found"]
        else:
            live_ray = jnp.ones((n,), bool)
        has_tri = (s["tri_i"] < s["tri_end"]) & live_ray

        # ---- triangle phase: one Moller-Trumbore test per ray with leaf work ----
        ti = jnp.where(has_tri, s["tri_i"], 0)
        p0 = jnp.take(bvh.tri_p0, ti, axis=0)
        e1 = jnp.take(bvh.tri_e1, ti, axis=0)
        e2 = jnp.take(bvh.tri_e2, ti, axis=0)
        m_cur = jnp.take(bvh.inst_inv1, s["inst_cur"] + 1, axis=0)
        o_obj = _xform_pos(m_cur, o)
        d_obj = _xform_dir(m_cur, d)
        hit, t, u, v = intersect.triangle_hit(o_obj, d_obj, p0, e1, e2, s["t_best"])
        hit = hit & has_tri

        t_best = jnp.where(hit, t, s["t_best"])
        best_tri = jnp.where(hit, ti, s["best_tri"])
        best_inst = jnp.where(hit, s["inst_cur"], s["best_inst"])
        best_u = jnp.where(hit, u, s["best_u"])
        best_v = jnp.where(hit, v, s["best_v"])
        found = s["found"] | hit
        tri_i = s["tri_i"] + has_tri.astype(jnp.int32)

        # ---- node phase: rays without leaf work pop one stack entry ----
        do_node = (~has_tri) & (s["sp"] > 0) & live_ray
        sp2 = s["sp"] - do_node.astype(jnp.int32)
        slot = jnp.where(do_node, sp2, 0)
        node = s["stack_node"][rows, slot]
        e_inst = jnp.where(do_node, s["stack_inst"][rows, slot], -1)

        nmin = jnp.take(bvh.node_min, node, axis=0)
        nmax = jnp.take(bvh.node_max, node, axis=0)
        left = jnp.take(bvh.node_left, node, axis=0)
        count = jnp.take(bvh.node_count, node, axis=0)
        axis = jnp.take(bvh.node_axis, node, axis=0)
        kind = jnp.take(bvh.node_kind, node, axis=0)

        m_e = jnp.take(bvh.inst_inv1, e_inst + 1, axis=0)
        o_e = _xform_pos(m_e, o)
        d_e = _xform_dir(m_e, d)
        inv_d = 1.0 / d_e  # rcp; +-inf on zero components, correct slab behavior
        box_hit = intersect.aabb_hit(o_e, inv_d, nmin, nmax, t_best) & do_node

        is_internal = box_hit & (kind == 0)
        is_tlas_leaf = box_hit & (kind == 1)
        is_blas_leaf = box_hit & (kind == 2)

        # BLAS leaf -> set the triangle cursor (left = first global tri)
        tri_i = jnp.where(is_blas_leaf, left, tri_i)
        tri_end = jnp.where(is_blas_leaf, left + count, s["tri_end"])
        inst_cur = jnp.where(is_blas_leaf, e_inst, s["inst_cur"])

        # internal -> push far child then near child (BVHNode.h:30-40, per-ray)
        d_axis = jnp.take_along_axis(d_e, axis[:, None], axis=1)[:, 0]
        if cfg.traversal_strategy == TraversalStrategy.ORDERED:
            left_first = d_axis > 0.0
        else:
            left_first = jnp.ones((n,), bool)
        near = jnp.where(left_first, left, left + 1)
        far = jnp.where(left_first, left + 1, left)

        # TLAS leaf -> push the instance's BLAS root (left = instance id)
        inst_id = left  # for kind==1
        blas_root = jnp.take(bvh.inst_root, jnp.clip(inst_id, 0, None), axis=0)

        push1 = is_internal | is_tlas_leaf
        push2 = is_internal
        # first pushed entry: far child (internal) or BLAS root (tlas leaf)
        e1_node = jnp.where(is_internal, far, blas_root)
        e1_inst = jnp.where(is_internal, e_inst, inst_id)
        slot1 = jnp.where(push1, sp2, stack_depth)
        stack_node = s["stack_node"].at[rows, slot1].set(e1_node, mode="drop")
        stack_inst = s["stack_inst"].at[rows, slot1].set(e1_inst, mode="drop")
        # second entry: near child (popped first)
        slot2 = jnp.where(push2, sp2 + 1, stack_depth)
        stack_node = stack_node.at[rows, slot2].set(near, mode="drop")
        stack_inst = stack_inst.at[rows, slot2].set(e_inst, mode="drop")
        sp_new = jnp.minimum(
            sp2 + push1.astype(jnp.int32) + push2.astype(jnp.int32), stack_depth
        )

        return dict(
            stack_node=stack_node,
            stack_inst=stack_inst,
            sp=sp_new,
            inst_cur=inst_cur,
            tri_i=tri_i,
            tri_end=tri_end,
            t_best=t_best,
            best_tri=best_tri,
            best_inst=best_inst,
            best_u=best_u,
            best_v=best_v,
            steps=s["steps"] + do_node.astype(jnp.int32),
            found=found,
        )

    out = jax.lax.while_loop(cond, body, state)
    if any_hit:
        return out["found"]
    return TraceResult(
        t=out["t_best"],
        tri=out["best_tri"],
        inst=out["best_inst"],
        u=out["best_u"],
        v=out["best_v"],
        steps=out["steps"],
    )


def _chunked(fn, args, n, chunk):
    """Apply fn over [ceil(n/chunk)] padded chunks with lax.map; unpad the result."""
    if n <= chunk:
        return fn(args)
    pad = (-n) % chunk
    padded = jax.tree_util.tree_map(
        lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
        ).reshape((n + pad) // chunk, chunk, *x.shape[1:]),
        args,
    )
    out = jax.lax.map(fn, padded)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((n + pad,) + x.shape[2:])[:n], out
    )


def trace_closest(
    bvh: SceneBVH, o, d, t_max, active, cfg: RenderConfig
) -> TraceResult:
    """Closest-hit traversal for a wavefront of world-space rays.

    t_max: per-ray upper bound (e.g. from analytic primitives already tested);
    active: rays to trace (inactive rays return miss instantly).
    """
    n = o.shape[0]

    def run(args):
        oo, dd, tt, aa = args
        return _traverse_chunk(bvh, oo, dd, tt, aa, cfg, any_hit=False)

    return _chunked(run, (o, d, t_max, active), n, cfg_chunk(cfg))


def trace_any(bvh: SceneBVH, o, d, t_max, active, cfg: RenderConfig):
    """Any-hit (shadow) traversal with all-lanes early exit
    (BottomLevelBVH.cpp:398-437)."""
    n = o.shape[0]

    def run(args):
        oo, dd, tt, aa = args
        return _traverse_chunk(bvh, oo, dd, tt, aa, cfg, any_hit=True)

    return _chunked(run, (o, d, t_max, active), n, cfg_chunk(cfg))


def cfg_chunk(cfg: RenderConfig) -> int:
    return getattr(cfg, "traversal_chunk", 1 << 17)
