"""Wavefront 8-wide BVH traversal with a short packed stack (TPU-native).

Successor of the threaded binary traversal (ops/traversal.py) built on two measured
properties of this hardware (PERF.md):

  1. A [N] row gather costs ~6 ns/lane for ANY row width up to 80 floats, so the
     unit of traversal work is "one fat gather": a [8W, 64] octant-major WIDE node
     record (8 child AABBs + encoded child entries, children pre-sorted per ray
     octant — accel/wide.py), or a [T/8, 72] 8-triangle leaf record retiring a whole
     leaf per iteration.  vs the binary kernel this cuts per-ray iterations ~3x.

  2. Vector math on [N, 3]-shaped arrays runs at ~2% VPU lane utilization (the
     minor dim maps to the 128-wide lane axis), while the same math on [B, 128]
     component slabs runs at speed of light — hidden entirely inside the gather
     latency.  Every gathered record is therefore batch-transposed once
     ([N,K] -> [B,K,128], one relayout) and ALL slab tests / Moller-Trumbore
     evaluations are written as scalar-component arithmetic on [B,128] slabs
     (measured 9.4x faster than the [N,3] formulation).

Control flow stays a statically-bounded straggler ladder (no data-dependent
``while``: a cond on this runtime costs a ~170 ms host round-trip per iteration).
Deferred hit children go onto a short per-ray stack of packed int32 entries
(kind|payload|instance — see accel/wide.py), pushed far-to-near so pops are
near-first.  The TLAS and all BLASes share one unified record array; entering an
instance is just following a child entry whose instance-override bits switch the
ray into object space (Mesh.cpp:17-31) — no separate nesting machinery: the stack
itself remembers the enclosing space because every entry carries its instance id.

Traversal is geometry-discrete and wrapped in stop_gradient by the renderer;
differentiable hit attributes are reconstructed from the returned ids.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..accel.wide import KIND_INTERNAL, KIND_LEAF, PAYLOAD_BITS
from ..config import RAY_EPSILON, RenderConfig
from . import compaction, intersect

POP = -1  # take the next deferred entry off the stack
EXIT = -2  # traversal finished

_PAYLOAD_MASK = (1 << PAYLOAD_BITS) - 1
_LANES = 128  # wavefronts are padded to this so [B,128] slabs tile exactly


class WideSceneBVH(NamedTuple):
    """Unified per-frame traversal structure: [BLAS block | per-frame TLAS | tris].

    ``table`` holds BOTH the octant-major wide node records (rows 0..8W-1, 72 f32
    each: 48 box floats + 8 f_a + 8 f_b + 8 pad) and the 8-triangle leaf records
    (rows 8W.., (p0|e1|e2) x 8 = 72 f32), so each traversal iteration issues ONE
    fat gather whether a lane sits at a node or a leaf — halving the gather count
    of the node+leaf two-table scheme (gathers dominate traversal cost, PERF.md).
    """

    table: jnp.ndarray  # [8*W + T/8, 72] f32 unified records
    inst_mat: jnp.ndarray  # [I+1,12] f32 inverse instance matrices (slot 0 identity)
    root: int  # trace-time constant: global index of the TLAS wide root
    node_rows: int  # trace-time constant: 8*W (first triangle-record row)

    @property
    def n_nodes(self) -> int:
        return self.node_rows // 8


def build_scene_bvh(scene) -> WideSceneBVH:
    """Assemble the frame's unified wide traversal arrays on device.

    The static BLAS record block comes pre-assembled from the packer
    (scene.wd_rec, [8,Wb,72]); the tiny per-frame TLAS (scene.wt_rec, [8,Wt,72])
    is appended so BLAS child indices need no per-frame fix-up, mirroring the
    reference's split of cold BLAS build vs per-frame TLAS rebuild
    (BottomLevelBVH.cpp:18-58 / TopLevelBVH.cpp:32-45).  Triangle records go
    after the node block in the same table (leaf row = node_rows + payload).
    """
    wb = scene.wd_rec.shape[1]
    rec = jnp.concatenate([scene.wd_rec, scene.wt_rec], axis=1)
    rec = rec.reshape(-1, 72)

    identity = jnp.concatenate(
        [jnp.eye(3, dtype=jnp.float32), jnp.zeros((3, 1), jnp.float32)], axis=1
    )
    inst_mat = jnp.concatenate([identity[None], scene.inst_inv], axis=0).reshape(-1, 12)

    tri = jnp.concatenate([scene.tr_p0, scene.tr_e1, scene.tr_e2], axis=1)
    # leaves are 8-aligned by the BLAS flatten; records are COMPONENT-major
    # (col c*8 + j = component c of triangle j, c over p0xyz|e1xyz|e2xyz) so the
    # gathered [B,72,128] record views as [B,9,8,128] with contiguous [B,8,128]
    # per-component slabs — the Moller-Trumbore loop vectorizes over the
    # 8-triangle axis (see _step)
    tri_rec = tri.reshape(-1, 8, 9).transpose(0, 2, 1).reshape(-1, 72)

    return WideSceneBVH(
        table=jnp.concatenate([rec, tri_rec], axis=0),
        inst_mat=inst_mat,
        root=wb,
        node_rows=rec.shape[0],
    )


class TraceResult(NamedTuple):
    t: jnp.ndarray  # [N] closest hit distance (inf = miss)
    tri: jnp.ndarray  # [N] i32 global triangle id (-1 = miss)
    inst: jnp.ndarray  # [N] i32 instance id (-1 = miss)
    steps: jnp.ndarray  # [N] i32 node visits (heatmap; zeros unless tracked)
    incomplete: jnp.ndarray  # [] i32 rays truncated by ladder budget or stack overflow


def _t(x):
    """Batch-transpose [N,K] -> [B,K,128]: ONE relayout after which per-component
    slices x_t[:, c] are [B,128] slabs computing at full lane utilization.
    Element n of component c lives at [n // 128, c, n % 128], so a [B,128] slab
    reshapes back to [N] for free (row-major compatible)."""
    n, k = x.shape
    return x.reshape(n // _LANES, _LANES, k).transpose(0, 2, 1)


def _flat(x):
    """[B,128] -> [N] (free reshape, see _t)."""
    return x.reshape(-1)


def _init_state(t_init, active, root: int, any_hit: bool, track_steps: bool) -> dict:
    n = t_init.shape[0]
    i32 = lambda v: jnp.full((n,), v, jnp.int32)  # noqa: E731
    root_entry = (KIND_INTERNAL << PAYLOAD_BITS | root) << 8  # inst1 = 0 (world)
    s = dict(
        cur=jnp.where(active, root_entry, EXIT).astype(jnp.int32),
        sp=i32(0),
        ovf=jnp.zeros((n,), bool),
    )
    if any_hit:
        s["found"] = jnp.zeros((n,), bool)
    else:
        s["t_best"] = t_init
        s["best"] = i32(-1)
    if track_steps:
        s["steps"] = i32(0)
    # stack is threaded separately (its ladder compaction is 2-D)
    return s


def _alive(s: dict, any_hit: bool):
    a = s["cur"] != EXIT
    if any_hit:
        a = a & ~s["found"]
    return a


def _step(bvh: WideSceneBVH, s, stack, rays_t, t_fixed, any_hit: bool,
          ordered: bool = True):
    """One traversal iteration.  rays_t = (o_t, d_t): [B,3,128] transposed
    world-space ray components (constant over the round)."""
    o_t, d_t = rays_t
    n = s["cur"].shape[0]
    b = n // _LANES
    n_nodes = bvh.n_nodes
    stack_size = stack.shape[1]
    cols = jnp.arange(stack_size, dtype=jnp.int32)[None, :]

    # ---- pop: resolve POP sentinels from the stack (or retire the ray) ----
    sp = s["sp"]
    need = s["cur"] == POP
    has = sp > 0
    top = jnp.sum(jnp.where(cols == (sp - 1)[:, None], stack, 0), axis=1)
    cur = jnp.where(need, jnp.where(has, top, EXIT), s["cur"])
    sp = sp - (need & has).astype(jnp.int32)

    live = cur >= 0
    if any_hit:
        live = live & ~s["found"]
        t_best = t_fixed
    else:
        t_best = s["t_best"]

    # ---- decode + ray into current instance space ----
    kind = jnp.where(live, cur >> (PAYLOAD_BITS + 8), 0)
    payload = jnp.where(live, (cur >> 8) & _PAYLOAD_MASK, 0)
    inst1 = jnp.where(live, cur & 255, 0)
    hot = jax.nn.one_hot(inst1, bvh.inst_mat.shape[0], dtype=jnp.float32)
    m = _t(hot @ bvh.inst_mat)  # [B,12,128] rows of the 3x4 inverse matrix
    owx, owy, owz = o_t[:, 0], o_t[:, 1], o_t[:, 2]
    dwx, dwy, dwz = d_t[:, 0], d_t[:, 1], d_t[:, 2]
    ox = m[:, 0] * owx + m[:, 1] * owy + m[:, 2] * owz + m[:, 3]
    oy = m[:, 4] * owx + m[:, 5] * owy + m[:, 6] * owz + m[:, 7]
    oz = m[:, 8] * owx + m[:, 9] * owy + m[:, 10] * owz + m[:, 11]
    dx = m[:, 0] * dwx + m[:, 1] * dwy + m[:, 2] * dwz
    dy = m[:, 4] * dwx + m[:, 5] * dwy + m[:, 6] * dwz
    dz = m[:, 8] * dwx + m[:, 9] * dwy + m[:, 10] * dwz
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    if ordered:
        oct_t = (
            (dx > 0).astype(jnp.int32)
            | ((dy > 0).astype(jnp.int32) << 1)
            | ((dz > 0).astype(jnp.int32) << 2)
        )
    else:
        # BVH_TRAVERSE_TREE_NAIVE (Config.h:27-30): fixed, direction-independent
        # child order — every ray reads the octant-0 record
        oct_t = jnp.zeros_like(dx, jnp.int32)
    tb = t_best.reshape(b, _LANES)

    # ---- ONE fat gather for the iteration: node record OR leaf record ----
    is_leaf = live & (kind == KIND_LEAF)
    is_node = live & (kind == KIND_INTERNAL)
    row = jnp.where(
        is_leaf,
        bvh.node_rows + payload,
        jnp.where(is_node, _flat(oct_t) * n_nodes + payload, 0),
    )
    grec = _t(jnp.take(bvh.table, row, axis=0))  # [B,72,128]

    # Records are COMPONENT-major (col c*8+j, accel/wide.octant_records /
    # build_scene_bvh), so both phases vectorize over the 8-child sublane axis:
    # each per-component slice below is a contiguous [B,8,128] slab and the
    # whole phase is ONE set of VPU ops instead of 8 unrolled per-child copies
    # (8x fewer HLO ops; identical f32 arithmetic, bit-identical results).
    oxE, oyE, ozE = ox[:, None], oy[:, None], oz[:, None]
    dxE, dyE, dzE = dx[:, None], dy[:, None], dz[:, None]
    tbE = tb[:, None]

    # ---- leaf phase: one 8-triangle record, eight Moller-Trumbore tests ----
    # comp c of all 8 triangles = contiguous sublane-aligned slice [B,8,128]
    def comp(c):
        return grec[:, c * 8 : (c + 1) * 8]

    tri = [comp(c) for c in range(9)]  # p0xyz | e1xyz | e2xyz
    leaf_t = is_leaf.reshape(b, _LANES)
    if not any_hit:
        best_t = s["best"].reshape(b, _LANES)
        payload_t = payload.reshape(b, _LANES)
        inst1_t = inst1.reshape(b, _LANES)
    # Moller-Trumbore (BottomLevelBVH.cpp:214-258) on [B,8,128] slabs
    e1x, e1y, e1z = tri[3], tri[4], tri[5]
    e2x, e2y, e2z = tri[6], tri[7], tri[8]
    hx = dyE * e2z - dzE * e2y
    hy = dzE * e2x - dxE * e2z
    hz = dxE * e2y - dyE * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    f = 1.0 / jnp.where(jnp.abs(a) < 1e-30, 1e-30, a)
    sx = oxE - tri[0]
    sy = oyE - tri[1]
    sz = ozE - tri[2]
    u = f * (sx * hx + sy * hy + sz * hz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (dxE * qx + dyE * qy + dzE * qz)
    t = f * (e2x * qx + e2y * qy + e2z * qz)
    hit = (
        (u > 0.0) & (u < 1.0) & (v > 0.0) & (u + v < 1.0)
        & (t > RAY_EPSILON) & (t < tbE) & leaf_t[:, None]
    )
    if any_hit:
        found = s["found"] | _flat(jnp.any(hit, axis=1))
    else:
        # sequential per-j semantics: min t among hits wins, earliest j on ties
        t_cand = jnp.where(hit, t, jnp.inf)
        jmin = jnp.argmin(t_cand, axis=1).astype(jnp.int32)  # first min
        tmin = jnp.min(t_cand, axis=1)
        new_hit = tmin < tb
        tb = jnp.where(new_hit, tmin, tb)
        best_t = jnp.where(
            new_hit, ((payload_t * 8 + jmin) << 8) | inst1_t, best_t
        )

    # ---- node phase: slab-test all 8 children of the gathered record ----
    # (is_node & ~found needs no refinement: a lane is node XOR leaf this
    # iteration, and previously-found lanes are already excluded by `live`)
    node_t = is_node.reshape(b, _LANES)
    t0x, t1x = (comp(0) - oxE) * ix[:, None], (comp(3) - oxE) * ix[:, None]
    t0y, t1y = (comp(1) - oyE) * iy[:, None], (comp(4) - oyE) * iy[:, None]
    t0z, t1z = (comp(2) - ozE) * iz[:, None], (comp(5) - ozE) * iz[:, None]
    t_near = jnp.maximum(
        jnp.maximum(RAY_EPSILON, jnp.minimum(t0x, t1x)),
        jnp.maximum(jnp.minimum(t0y, t1y), jnp.minimum(t0z, t1z)),
    )
    t_far = jnp.minimum(
        jnp.minimum(tbE, jnp.maximum(t0x, t1x)),
        jnp.minimum(jnp.maximum(t0y, t1y), jnp.maximum(t0z, t1z)),
    )
    fa = grec[:, 48:56].astype(jnp.int32)  # [B,8,128]
    fbv = grec[:, 56:64].astype(jnp.int32)
    entries = (fa << 8) | jnp.where(fbv > 0, fbv, inst1.reshape(b, _LANES)[:, None])
    # exclude empty slots (KIND_EMPTY boxes are always-miss point boxes, but be
    # explicit so garbage payloads can never enter the walk)
    bits = (t_near < t_far) & node_t[:, None] & ((fa >> PAYLOAD_BITS) != 7)

    # nearest remaining child = lowest set bit (children pre-sorted per octant);
    # the rest are pushed far-to-near so pops come near-first
    ibits = bits.astype(jnp.int32)
    incl = jnp.cumsum(ibits, axis=1)  # inclusive prefix count over children
    is_first = bits & (incl == 1)  # lowest set bit
    first_entry = jnp.sum(jnp.where(is_first, entries, 0), axis=1)  # [B,128]
    has_any = incl[:, 7] > 0

    # suffix counts: children farther than j sit BELOW j on the stack
    rest = bits & ~is_first
    ir = rest.astype(jnp.int32)
    n_push = jnp.sum(ir, axis=1)  # [B,128]
    rc = n_push[:, None] - (jnp.cumsum(ir, axis=1) - ir)  # suffix-inclusive

    sp_t = sp.reshape(b, _LANES)
    overflow_t = node_t & (sp_t + n_push > stack_size)
    pos = sp_t[:, None] + rc - 1  # [B,8,128] position of slot j's push
    for j in range(8):
        pos_j = _flat(pos[:, j])
        ok_j = _flat(rest[:, j]) & (pos_j < stack_size)
        stack = jnp.where(
            ok_j[:, None] & (cols == pos_j[:, None]),
            _flat(entries[:, j])[:, None],
            stack,
        )
    sp = jnp.where(is_node, jnp.minimum(sp + _flat(n_push), stack_size), sp)

    # ---- advance ----
    nxt_t = jnp.where(node_t, jnp.where(has_any, first_entry, POP), POP)
    nxt = jnp.where(is_node | is_leaf, _flat(nxt_t), cur)

    out = dict(s)
    out["cur"] = nxt
    out["sp"] = sp
    out["ovf"] = s["ovf"] | _flat(overflow_t)
    if any_hit:
        out["found"] = found
    else:
        out["t_best"] = _flat(tb)
        out["best"] = _flat(best_t)
    if "steps" in s:
        out["steps"] = s["steps"] + is_node.astype(jnp.int32)
    return out, stack


def _round_up(n, mult):
    return (n + mult - 1) // mult * mult


_STATE_KEYS = ("cur", "sp", "ovf", "found", "t_best", "best", "steps")


def _pack_cols(state, stack):
    """Pack the traversal state dict + stack into ONE [N, S+K] int32 matrix.

    A [N] row gather costs a FIXED ~13 ns/lane for any row width up to ~80
    floats (PERF.md step-cost attribution), so one wide-row gather moves the
    whole per-lane state for the price the old code paid PER ARRAY.  Floats
    ride as exact bit patterns (bitcast i32 — safe: int arrays are never
    canonicalized; the f32-carrying-int hazard of PERF.md does not apply in
    this direction), bools as 0/1."""
    cols = [stack]
    for k in _STATE_KEYS:
        if k not in state:
            continue
        v = state[k]
        if v.dtype == jnp.bool_:
            v = v.astype(jnp.int32)
        elif v.dtype != jnp.int32:
            v = jax.lax.bitcast_convert_type(v, jnp.int32)
        cols.append(v[:, None])
    return jnp.concatenate(cols, axis=1)


def _unpack_cols(packed, stack_size: int, any_hit: bool, track_steps: bool):
    stack = packed[:, :stack_size]
    s = {}
    i = stack_size

    def col():
        nonlocal i
        c = packed[:, i]
        i += 1
        return c

    s["cur"] = col()
    s["sp"] = col()
    s["ovf"] = col().astype(jnp.bool_)
    if any_hit:
        s["found"] = col().astype(jnp.bool_)
    else:
        s["t_best"] = jax.lax.bitcast_convert_type(col(), jnp.float32)
        s["best"] = col()
    if track_steps:
        s["steps"] = col()
    return s, stack


def _run_rounds(bvh, state, stack, o_w, d_w, t_fixed, cfg, any_hit: bool,
                root: int = 0):
    """Straggler ladder (see ops/traversal.py): statically-bounded rounds over
    geometrically smaller compacted wavefronts.

    Boundary cost discipline (PERF.md round 4 itemization):
      - per-lane state crosses each boundary as ONE packed int32 row
        (_pack_cols) and the ray as one f32 row — 2 gathers + 1 scatter per
        boundary instead of one op per array (~16), at the platform's fixed
        ~13 ns/lane-per-gather-op cost;
      - round 0 with frac < 1.0 (the shadow contribution-cull shape,
        renderer.py) REBUILDS the compacted sub-state fresh (stack of zeros,
        root entries) — bit-identical to gathering the untouched state, so the
        dominant boundary pays only the ray-row gather;
      - the final round scatters back only the packed row (results are
        extracted from it); sub-stack write-back is skipped everywhere the
        next boundary re-packs anyway."""
    n = state["cur"].shape[0]
    rounds = cfg.wide_rounds_any if any_hit else cfg.wide_rounds
    from ..config import TraversalStrategy

    ordered = cfg.traversal_strategy == TraversalStrategy.ORDERED
    track_steps = "steps" in state
    stack_size = stack.shape[1]

    def run(s, stk, ow, dw, tf, iters):
        rays_t = (_t(ow), _t(dw))

        def body(i, carry):
            st, sk = carry
            return _step(bvh, st, sk, rays_t, tf, any_hit, ordered)

        return jax.lax.fori_loop(0, iters, body, (s, stk), unroll=cfg.traversal_unroll)

    # [N, 6/7] f32 ray rows: one gather moves o+d(+t_max) across a boundary
    ray_cols = [o_w, d_w]
    if t_fixed is not None:
        ray_cols.append(t_fixed[:, None])
    ray_pack = jnp.concatenate(ray_cols, axis=1)

    packed = None  # authoritative packed state once the first boundary runs
    for ri, (frac, iters) in enumerate(rounds):
        m = _round_up(max(int(round(n * frac)), 256), _LANES)
        if (ri == 0 and frac >= 1.0) or m >= n:
            assert packed is None  # full rounds only occur as a prefix
            state, stack = run(state, stack, o_w, d_w, t_fixed, iters)
            continue
        if packed is None:
            alive = _alive(state, any_hit)
        else:
            cur = packed[:, stack_size]
            alive = cur != EXIT
            if any_hit:
                alive = alive & (packed[:, stack_size + 3] == 0)  # ~found
        if getattr(cfg, "ladder_sort_octant", False):
            # A/B knob (PERF.md): order the compacted sub-wavefront by ray
            # octant so neighbouring lanes walk similar subtrees — trades an
            # O(N log N) argsort for potential gather locality in the rounds
            oct_key = (
                (o_w[:, 0] * 0).astype(jnp.int32)  # shape anchor
                | (d_w[:, 0] > 0).astype(jnp.int32)
                | ((d_w[:, 1] > 0).astype(jnp.int32) << 1)
                | ((d_w[:, 2] > 0).astype(jnp.int32) << 2)
            )
            key = jnp.where(alive, oct_key, 16)  # dead lanes last
            sel = jnp.argsort(key, stable=True)[:m].astype(jnp.int32)
        else:
            sel = compaction.compact_indices(alive, m)  # stable: alive first, O(N)
        rp = ray_pack[sel]
        ow, dw = rp[:, 0:3], rp[:, 3:6]
        tf = rp[:, 6] if t_fixed is not None else None
        if ri == 0:
            # fresh sub-state: slots [0, n_alive) of a round-0 compaction hold
            # exactly the alive lanes (stable compaction of untouched state), so
            # re-init with root entries reproduces the gathered state bit-for-bit
            n_alive = jnp.sum(alive.astype(jnp.int32))
            sub_active = jnp.arange(m, dtype=jnp.int32) < n_alive
            t_seed = tf if any_hit else state["t_best"][sel]
            sub = _init_state(
                t_seed, sub_active, root, any_hit, track_steps=track_steps
            )
            sub_stack = jnp.zeros((m, stack_size), jnp.int32)
        else:
            if packed is None:  # first boundary after a full-round prefix
                packed = _pack_cols(state, stack)  # linear stream, no gathers
            sub, sub_stack = _unpack_cols(
                packed[sel], stack_size, any_hit, track_steps
            )
        if packed is None:
            packed = _pack_cols(state, stack)
        sub, sub_stack = run(sub, sub_stack, ow, dw, tf, iters)
        packed = packed.at[sel].set(_pack_cols(sub, sub_stack))
    if packed is not None:
        state, _stack = _unpack_cols(packed, stack_size, any_hit, track_steps)
    return state


def _pad_inputs(o, d, t_max, active):
    """Pad the wavefront to a multiple of 128 so [B,128] slabs tile exactly."""
    n = o.shape[0]
    np_ = _round_up(n, _LANES)
    if np_ == n:
        return o, d, t_max, active, n
    pad = np_ - n
    o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)], axis=0)
    d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)], axis=0)
    t_max = jnp.concatenate([t_max, jnp.zeros((pad,), t_max.dtype)], axis=0)
    active = jnp.concatenate([active, jnp.zeros((pad,), bool)], axis=0)
    return o, d, t_max, active, n


def trace_closest(
    bvh: WideSceneBVH, o, d, t_max, active, cfg: RenderConfig
) -> TraceResult:
    """Closest-hit traversal for a wavefront of world-space rays."""
    o, d, t_max, active, n = _pad_inputs(o, d, t_max, active)
    track_steps = cfg.visualize_heatmap
    state = _init_state(t_max, active, bvh.root, any_hit=False, track_steps=track_steps)
    stack = jnp.zeros((o.shape[0], cfg.wide_stack_size), jnp.int32)
    state = _run_rounds(bvh, state, stack, o, d, None, cfg, any_hit=False,
                        root=bvh.root)
    incomplete = jnp.sum((_alive(state, False) | state["ovf"]).astype(jnp.int32))
    best = state["best"][:n]
    tri = jnp.where(best >= 0, best >> 8, -1)
    inst = jnp.where(best >= 0, (best & 255) - 1, -1)
    steps = state["steps"][:n] if track_steps else jnp.zeros((n,), jnp.int32)
    return TraceResult(
        t=state["t_best"][:n], tri=tri, inst=inst, steps=steps, incomplete=incomplete
    )


def trace_any(bvh: WideSceneBVH, o, d, t_max, active, cfg: RenderConfig):
    """Any-hit (shadow) traversal; found rays retire immediately
    (BottomLevelBVH.cpp:398-437).

    Returns (found [N] bool, incomplete [] i32).  `incomplete` counts lanes the
    ladder failed to finish (still alive after every round, or stack overflow) —
    nonzero means shadow decisions may be missing occlusions (light leaks): the
    scene-tuned compacted ladders (e.g. config3's round-0 capacity < 1.0) assume
    the contribution-culled wavefront, and this counter is what catches a frame
    where that assumption breaks (goldens and bench assert it is 0)."""
    o, d, t_max, active, n = _pad_inputs(o, d, t_max, active)
    state = _init_state(t_max, active, bvh.root, any_hit=True, track_steps=False)
    stack = jnp.zeros((o.shape[0], cfg.wide_stack_size), jnp.int32)
    state = _run_rounds(bvh, state, stack, o, d, t_max, cfg, any_hit=True,
                        root=bvh.root)
    incomplete = jnp.sum((_alive(state, True) | (state["ovf"] & ~state["found"]))
                         .astype(jnp.int32))
    return state["found"][:n], incomplete
