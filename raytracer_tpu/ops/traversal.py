"""Stackless wavefront two-level BVH traversal (threaded BVH, TPU-native).

Re-design of the reference's nested stack walks (TopLevelBVH.cpp:53-129 ->
Mesh::trace -> BottomLevelBVH.cpp:348-437) for the TPU execution model:

* **No stacks.**  Each BVH is *threaded*: per ray-direction octant, every node has a
  precomputed ``near`` (first-visited child, the per-ray form of ordered descent,
  BVHNode.h:30-40) and ``skip`` (where to jump on miss / subtree completion) link
  (accel/links.py).  Per-ray traversal state is a single node pointer — a ~40x
  reduction in loop-carried state vs an explicit stack, and no scatters.

* **No data-dependent loops.**  On the tunneled TPU runtime a ``while_loop``
  condition costs a host round-trip per iteration (~170 ms measured).  Traversal
  instead runs a *straggler ladder* of statically-bounded ``fori_loop`` rounds:
  round 0 advances every ray K0 steps; unfinished rays are compacted (argsort) into
  a 4x-smaller wavefront for K1 more steps, and so on.  Typical rays finish in
  round 0; worst-case rays get geometrically more steps on geometrically fewer
  lanes, so the *compute* cost stays near the wavefront average while the *bound*
  covers deep traversals.  Rays still unfinished after the last round are counted
  (``incomplete``) so callers can observe truncation instead of silently missing
  hits.

* **Two levels, one pointer.**  A TLAS leaf jump saves its skip link in a per-ray
  ``resume`` register (nesting depth is exactly 1), enters the instance's BLAS root,
  and transforms the ray into object space once (Mesh.cpp:17-31); the BLAS exit
  sentinel restores the world ray and continues at ``resume``.

* **Fused records, minimal gathers.**  Gathers cost ~17ns per index on this
  hardware regardless of row width (measured), so each step does at most TWO row
  gathers: one [8U,12] octant-major record fusing node geometry + that octant's
  links, and one [T/2,18] triangle-PAIR record (two Moller-Trumbore tests per
  gather; leaf ranges are pair-padded by the BLAS flatten).  Instance matrices and
  roots are resolved by one-hot matmuls on the MXU instead of gathers.

Leaf triangle pairs are drained one per step through a (tri_i, tri_end) cursor while
the node pointer waits, so leaf size is unbounded and control flow stays uniform.

Traversal is geometry-discrete: it returns hit ids + (t, u, v, steps) and is wrapped
in stop_gradient by the renderer; differentiable hit attributes are reconstructed
from the ids afterwards.  Instancing is rigid (rotation+translation, like the
reference), so object-space t equals world-space t.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..accel.links import BLAS_EXIT, DONE
from ..config import RenderConfig
from . import compaction, intersect


class SceneBVH(NamedTuple):
    """Unified per-frame traversal structure: [TLAS | concatenated BLASes].

    oct_rec fuses node geometry with that octant's links so a traversal step costs
    ONE row gather: [8U, 12] = min3 | max3 | left/first/inst | meta | near | skip |
    pad2, with integer fields stored as exact float32 values (< 2^24).  Instance
    matrices/roots are applied by one-hot matmul (MXU) instead of gathers —
    instance counts are small.
    """

    oct_rec: jnp.ndarray  # [8*U, 12] f32 octant-major fused node records
    inst_mat: jnp.ndarray  # [I+1,12] f32 inverse instance matrices (slot 0 identity)
    inst_root: jnp.ndarray  # [I+1] f32 global BLAS root per instance (slot 0 = 0)
    tri_rec: jnp.ndarray  # [Tp/2, 18] f32 triangle PAIRS: p0|e1|e2 x2

    @property
    def n_nodes(self) -> int:
        return self.oct_rec.shape[0] // 8


def _i2f(x):
    """Store integers as exact float32 VALUES (not bitcasts): the TPU pipeline
    canonicalizes NaNs / flushes denormals, so int bit patterns smuggled through
    float arrays get corrupted.  All encoded ids are < 2^24 and round-trip
    exactly; packers assert the bound."""
    return x.astype(jnp.float32)


def _f2i(x):
    return x.astype(jnp.int32)


def build_scene_bvh(scene) -> SceneBVH:
    """Assemble the frame's unified traversal arrays on device.

    The static BLAS block (nodes/links/triangles) is concatenated with the tiny
    per-frame TLAS; shapes are static per scene so jit caches the program.
    """
    n_tlas = scene.tl_min.shape[0]
    # integer fields ride in float32 lanes as exact values; enforce the bound
    assert n_tlas + scene.nd_min.shape[0] < (1 << 22), "node count exceeds 2^22"
    assert scene.tr_p0.shape[0] < (1 << 22), "triangle count exceeds 2^22"
    assert scene.inst_root.shape[0] < 255, "instance count exceeds 255"

    # ---- node records ----
    tl_internal = scene.tl_count == 0
    bl_internal = scene.nd_count == 0
    # kind: 0 internal, 1 TLAS leaf (left = instance id), 2 BLAS leaf
    tl_kind = jnp.where(tl_internal, 0, 1).astype(jnp.int32)
    bl_kind = jnp.where(bl_internal, 0, 2).astype(jnp.int32)
    # globalize BLAS internal child indices by the TLAS block size
    bl_left = jnp.where(bl_internal, scene.nd_left + n_tlas, scene.nd_left)

    node_min = jnp.concatenate([scene.tl_min, scene.nd_min], axis=0)
    node_max = jnp.concatenate([scene.tl_max, scene.nd_max], axis=0)
    left = jnp.concatenate([scene.tl_left, bl_left], axis=0)
    kind = jnp.concatenate([tl_kind, bl_kind], axis=0)
    count = jnp.concatenate([scene.tl_count, scene.nd_count], axis=0)
    meta = kind | (count << 2)

    node_rec = jnp.concatenate(
        [node_min, node_max, _i2f(left)[:, None], _i2f(meta)[:, None]],
        axis=1,
    )  # [U, 8]

    # ---- links: globalize and fuse into octant-major records ----
    tl_links = scene.tl_links  # [8,Mt,2], internal targets are TLAS-local (== global)
    bl_links = scene.nd_links  # [8,M,2], BLAS-local with BLAS_EXIT sentinels
    bl_links = jnp.where(bl_links >= 0, bl_links + n_tlas, bl_links)
    links = jnp.concatenate([tl_links, bl_links], axis=1)  # [8,U,2]

    u = node_rec.shape[0]
    oct_rec = jnp.concatenate(
        [
            jnp.broadcast_to(node_rec[None], (8, u, 8)),
            _i2f(links),
            jnp.zeros((8, u, 2), jnp.float32),  # pad rows to 12 floats
        ],
        axis=2,
    ).reshape(8 * u, 12)

    identity = jnp.concatenate(
        [jnp.eye(3, dtype=jnp.float32), jnp.zeros((3, 1), jnp.float32)], axis=1
    )
    inst_mat = jnp.concatenate([identity[None], scene.inst_inv], axis=0).reshape(-1, 12)
    inst_root = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), (scene.inst_root + n_tlas).astype(jnp.float32)]
    )

    tri_rec = jnp.concatenate([scene.tr_p0, scene.tr_e1, scene.tr_e2], axis=1)
    tri_rec = tri_rec.reshape(-1, 18)  # pairs (leaf ranges are pair-padded)

    return SceneBVH(
        oct_rec=oct_rec,
        inst_mat=inst_mat,
        inst_root=inst_root,
        tri_rec=tri_rec,
    )


class TraceResult(NamedTuple):
    t: jnp.ndarray  # [N] closest hit distance (inf = miss)
    tri: jnp.ndarray  # [N] i32 global triangle id (-1 = miss)
    inst: jnp.ndarray  # [N] i32 instance id (-1 = miss)
    steps: jnp.ndarray  # [N] i32 node visits (heatmap; zeros unless tracked)
    incomplete: jnp.ndarray  # [] i32 rays truncated by the iteration ladder


def _octant(d):
    return (
        (d[:, 0] > 0).astype(jnp.int32)
        | ((d[:, 1] > 0).astype(jnp.int32) << 1)
        | ((d[:, 2] > 0).astype(jnp.int32) << 2)
    )


def _mat_apply(rows, p, translate):
    """rows: [N,12] packed 3x4; p: [N,3]."""
    m = rows.reshape(-1, 3, 4)
    out = jnp.einsum("nij,nj->ni", m[:, :, :3], p)
    if translate:
        out = out + m[:, :, 3]
    return out


# ---------------------------------------------------------------------------
# Packed wavefront state: 4-6 loop-carried [N] arrays.
#
# The object-space ray is NOT carried: it is recomputed each step from the packed
# instance id via a one-hot MXU matmul (instance counts are tiny), which keeps the
# fori-loop carry, the compile size, and the ladder-compaction cost minimal.
#
# Encodings (all < 2^31; bounds asserted in build_scene_bvh):
#   ri     = (resume + 1) << 8 | (inst + 1)      resume < 2^22, inst < 255
#   cursor = pair_index << 4 | pairs_remaining   pairs_remaining <= 15
#   best   = tri << 8 | (inst + 1), or -1        tri < 2^22
# ---------------------------------------------------------------------------


def _transform_rays(bvh: SceneBVH, ri, o_w, d_w):
    """Current-space ray from the packed instance id (one-hot MXU matmul)."""
    inst = (ri & 255) - 1
    hot = jax.nn.one_hot(inst + 1, bvh.inst_mat.shape[0], dtype=jnp.float32)
    mrow = hot @ bvh.inst_mat
    o = _mat_apply(mrow, o_w, translate=True)
    d = _mat_apply(mrow, d_w, translate=False)
    return o, d, inst


def _init_state(t_init, active, any_hit: bool, track_steps: bool) -> dict:
    n = t_init.shape[0]
    i32 = lambda v: jnp.full((n,), v, jnp.int32)  # noqa: E731
    s = dict(
        cur=jnp.where(active, 0, DONE).astype(jnp.int32),
        ri=i32(0),  # resume = -1, inst = -1
        cursor=i32(0),
    )
    if any_hit:
        s["found"] = jnp.zeros((n,), bool)
    else:
        s["t_best"] = t_init
        s["best"] = i32(-1)
    if track_steps:
        s["steps"] = i32(0)
    return s


def _alive(s: dict, any_hit: bool):
    a = (s["cur"] >= 0) | (s["cur"] == BLAS_EXIT) | ((s["cursor"] & 15) > 0)
    if any_hit:
        a = a & ~s["found"]
    return a


def _step(bvh: SceneBVH, s: dict, o_w, d_w, t_fixed, any_hit: bool,
          ordered: bool = True) -> dict:
    n_nodes = bvh.n_nodes
    cursor = s["cursor"]
    has_tri = (cursor & 15) > 0
    if any_hit:
        has_tri = has_tri & ~s["found"]
        t_best = t_fixed
    else:
        t_best = s["t_best"]

    # ---- resolve BLAS exit BEFORE the transform so the ray is world-space ----
    exiting = (s["cur"] == BLAS_EXIT) & ~has_tri
    resume = (s["ri"] >> 8) - 1
    cur = jnp.where(exiting, resume, s["cur"])
    ri = jnp.where(exiting, 0, s["ri"])

    o, d, inst = _transform_rays(bvh, ri, o_w, d_w)
    inv_d = 1.0 / d
    # NAIVE (Config.h:27-30): direction-independent child order = octant-0 links
    oct_ = _octant(d) if ordered else jnp.zeros((d.shape[0],), jnp.int32)

    # ---- triangle phase: one PAIR of Moller-Trumbore tests ----
    pi = jnp.where(has_tri, cursor >> 4, 0)
    trec = jnp.take(bvh.tri_rec, pi, axis=0)
    hit0, t0, _, _ = intersect.triangle_hit(
        o, d, trec[:, 0:3], trec[:, 3:6], trec[:, 6:9], t_best
    )
    hit0 = hit0 & has_tri
    if not any_hit:
        t_best = jnp.where(hit0, t0, t_best)
    hit1, t1, _, _ = intersect.triangle_hit(
        o, d, trec[:, 9:12], trec[:, 12:15], trec[:, 15:18], t_best
    )
    hit1 = hit1 & has_tri
    hit = hit0 | hit1
    if not any_hit:
        t_best = jnp.where(hit1, t1, t_best)
        tri_id = jnp.where(hit1, pi * 2 + 1, pi * 2)
        best = jnp.where(hit, (tri_id << 8) | (inst + 1), s["best"])
    cursor = jnp.where(has_tri, cursor + 15, cursor)  # pi += 1, remaining -= 1

    # ---- node phase: follow the threaded links ----
    do_node = (~has_tri) & (cur >= 0)
    if any_hit:
        found = s["found"] | hit
        do_node = do_node & ~found
    nidx = jnp.where(do_node, cur, 0)
    nrec = jnp.take(bvh.oct_rec, oct_ * n_nodes + nidx, axis=0)
    left = _f2i(nrec[:, 6])
    meta = _f2i(nrec[:, 7])
    near = _f2i(nrec[:, 8])
    skip = _f2i(nrec[:, 9])
    kind = meta & 3
    count = meta >> 2

    box_hit = intersect.aabb_hit(o, inv_d, nrec[:, 0:3], nrec[:, 3:6], t_best)
    box_hit = box_hit & do_node
    is_int = box_hit & (kind == 0)
    is_tl = box_hit & (kind == 1)
    is_bl = box_hit & (kind == 2)

    nxt = jnp.where(is_int, near, skip)

    # BLAS leaf -> arm the pair cursor (left = first triangle, pair-aligned)
    cursor = jnp.where(is_bl, ((left >> 1) << 4) | (count >> 1), cursor)

    # TLAS leaf -> enter the instance (one-hot root lookup); the entered root is
    # tested next step, after the transform picks up the new instance id
    inst_id = left
    hot = jax.nn.one_hot(
        jnp.where(is_tl, inst_id + 1, 0), bvh.inst_mat.shape[0], dtype=jnp.float32
    )
    root = jnp.round(hot @ bvh.inst_root).astype(jnp.int32)
    nxt = jnp.where(is_tl, root, nxt)
    ri = jnp.where(is_tl, ((skip + 1) << 8) | (inst_id + 1), ri)

    out = dict(s)
    out["cur"] = jnp.where(do_node, nxt, cur)
    out["ri"] = ri
    out["cursor"] = cursor
    if any_hit:
        out["found"] = found
    else:
        out["t_best"] = t_best
        out["best"] = best
    if "steps" in s:
        out["steps"] = s["steps"] + do_node.astype(jnp.int32)
    return out


def _run_rounds(bvh, state, o_w, d_w, t_fixed, cfg, any_hit: bool):
    """Straggler ladder: statically-bounded rounds over geometrically smaller
    compacted wavefronts (see module docstring)."""
    n = state["cur"].shape[0]
    rounds = cfg.traversal_rounds
    from ..config import TraversalStrategy

    ordered = cfg.traversal_strategy == TraversalStrategy.ORDERED

    def run(s, ow, dw, tf, iters):
        return jax.lax.fori_loop(
            0,
            iters,
            lambda i, st: _step(bvh, st, ow, dw, tf, any_hit, ordered),
            s,
            unroll=cfg.traversal_unroll,
        )

    for ri, (frac, iters) in enumerate(rounds):
        m = max(int(round(n * frac)), 256)
        if ri == 0 and frac >= 1.0:
            state = run(state, o_w, d_w, t_fixed, iters)
            continue
        if m >= n:
            state = run(state, o_w, d_w, t_fixed, iters)
            continue
        alive = _alive(state, any_hit)
        sel = compaction.compact_indices(alive, m)  # stable: alive first, O(N)
        sub = {k: v[sel] for k, v in state.items()}
        sub = run(
            sub,
            o_w[sel],
            d_w[sel],
            t_fixed[sel] if t_fixed is not None else None,
            iters,
        )
        state = {k: state[k].at[sel].set(sub[k]) for k in state}
    return state


def trace_closest(bvh: SceneBVH, o, d, t_max, active, cfg: RenderConfig) -> TraceResult:
    """Closest-hit traversal for a wavefront of world-space rays."""
    track_steps = cfg.visualize_heatmap
    state = _init_state(t_max, active, any_hit=False, track_steps=track_steps)
    state = _run_rounds(bvh, state, o, d, None, cfg, any_hit=False)
    incomplete = jnp.sum(_alive(state, False).astype(jnp.int32))
    best = state["best"]
    tri = jnp.where(best >= 0, best >> 8, -1)
    inst = jnp.where(best >= 0, (best & 255) - 1, -1)
    n = o.shape[0]
    steps = state["steps"] if track_steps else jnp.zeros((n,), jnp.int32)
    return TraceResult(
        t=state["t_best"],
        tri=tri,
        inst=inst,
        steps=steps,
        incomplete=incomplete,
    )


def trace_any(bvh: SceneBVH, o, d, t_max, active, cfg: RenderConfig):
    """Any-hit (shadow) traversal; found rays retire immediately
    (BottomLevelBVH.cpp:398-437)."""
    state = _init_state(t_max, active, any_hit=True, track_steps=False)
    state = _run_rounds(bvh, state, o, d, t_max, cfg, any_hit=True)
    incomplete = jnp.sum(_alive(state, True).astype(jnp.int32))
    return state["found"], incomplete
