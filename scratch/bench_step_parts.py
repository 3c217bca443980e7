"""Ablate the wide-traversal step to attribute the ~22 ns/lane-iteration cost.

The ladder's fori_loop runs a FIXED iteration count, so disabling a section
changes the walk's correctness but NOT the op schedule shape — good enough to
attribute cost. Variants:
  full        : _step as shipped
  no_onehot   : identity instance transform (skip one-hot matmul)
  no_stack    : no stack pop/push (cur advances, stack untouched)
  no_leaf     : skip leaf MT phase
  no_node     : skip node slab phase (gather still happens)
  gather_only : gather + transpose + trivial consume
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.accel.blas import build_blas
from raytracer_tpu.accel.wide import KIND_INTERNAL, KIND_LEAF, PAYLOAD_BITS
from raytracer_tpu.config import RAY_EPSILON, MeshAccelerator, RenderConfig
from raytracer_tpu.ops import traversal_wide as tw
from raytracer_tpu.scene import meshgen
from raytracer_tpu.scene.description import SceneDescription
from raytracer_tpu.scene.device import pack_scene

N = 1 << 17
ITERS = 16
_LANES = 128
_PAYLOAD_MASK = (1 << PAYLOAD_BITS) - 1
POP, EXIT = tw.POP, tw.EXIT
_t, _flat = tw._t, tw._flat


def step_variant(bvh, s, stack, rays_t, variant):
    o_t, d_t = rays_t
    n = s["cur"].shape[0]
    b = n // _LANES
    n_nodes = bvh.n_nodes
    stack_size = stack.shape[1]
    cols = jnp.arange(stack_size, dtype=jnp.int32)[None, :]

    sp = s["sp"]
    if variant != "no_stack":
        need = s["cur"] == POP
        has = sp > 0
        top = jnp.sum(jnp.where(cols == (sp - 1)[:, None], stack, 0), axis=1)
        cur = jnp.where(need, jnp.where(has, top, EXIT), s["cur"])
        sp = sp - (need & has).astype(jnp.int32)
    else:
        cur = s["cur"]

    live = cur >= 0
    t_best = s["t_best"]
    kind = jnp.where(live, cur >> (PAYLOAD_BITS + 8), 0)
    payload = jnp.where(live, (cur >> 8) & _PAYLOAD_MASK, 0)
    inst1 = jnp.where(live, cur & 255, 0)
    if variant != "no_onehot":
        hot = jax.nn.one_hot(inst1, bvh.inst_mat.shape[0], dtype=jnp.float32)
        m = _t(hot @ bvh.inst_mat)
        owx, owy, owz = o_t[:, 0], o_t[:, 1], o_t[:, 2]
        dwx, dwy, dwz = d_t[:, 0], d_t[:, 1], d_t[:, 2]
        ox = m[:, 0] * owx + m[:, 1] * owy + m[:, 2] * owz + m[:, 3]
        oy = m[:, 4] * owx + m[:, 5] * owy + m[:, 6] * owz + m[:, 7]
        oz = m[:, 8] * owx + m[:, 9] * owy + m[:, 10] * owz + m[:, 11]
        dx = m[:, 0] * dwx + m[:, 1] * dwy + m[:, 2] * dwz
        dy = m[:, 4] * dwx + m[:, 5] * dwy + m[:, 6] * dwz
        dz = m[:, 8] * dwx + m[:, 9] * dwy + m[:, 10] * dwz
    else:
        ox, oy, oz = o_t[:, 0], o_t[:, 1], o_t[:, 2]
        dx, dy, dz = d_t[:, 0], d_t[:, 1], d_t[:, 2]
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    oct_t = (
        (dx > 0).astype(jnp.int32)
        | ((dy > 0).astype(jnp.int32) << 1)
        | ((dz > 0).astype(jnp.int32) << 2)
    )
    tb = t_best.reshape(b, _LANES)

    is_leaf = live & (kind == KIND_LEAF)
    is_node = live & (kind == KIND_INTERNAL)
    row = jnp.where(
        is_leaf,
        bvh.node_rows + payload,
        jnp.where(is_node, _flat(oct_t) * n_nodes + payload, 0),
    )
    if variant == "full_barrier":
        grec = jax.lax.optimization_barrier(_t(jnp.take(bvh.table, row, axis=0)))
    elif variant == "full_barrier_pre":
        grec = _t(jax.lax.optimization_barrier(jnp.take(bvh.table, row, axis=0)))
    else:
        grec = _t(jnp.take(bvh.table, row, axis=0))

    if variant == "gather_only":
        out = dict(s)
        out["cur"] = jnp.where(
            live, (cur + _flat(grec[:, 0]).astype(jnp.int32)) % (1 << 28), cur
        )
        return out, stack
    if variant == "raw_sum":
        raw = jnp.take(bvh.table, row, axis=0)  # [N,72], no transpose
        out = dict(s)
        out["t_best"] = s["t_best"] + jnp.sum(raw, axis=1) * 1e-30
        out["cur"] = jnp.where(live, cur, cur)
        return out, stack

    def comp(c):
        return grec[:, c * 8 : (c + 1) * 8]

    oxE, oyE, ozE = ox[:, None], oy[:, None], oz[:, None]
    dxE, dyE, dzE = dx[:, None], dy[:, None], dz[:, None]
    tbE = tb[:, None]

    leaf_t = is_leaf.reshape(b, _LANES)
    best_t = s["best"].reshape(b, _LANES)
    payload_t = payload.reshape(b, _LANES)
    inst1_t = inst1.reshape(b, _LANES)
    if variant == "leaf_consume6":
        s6 = comp(0)
        for c in range(1, 6):
            s6 = s6 + comp(c)
        tb = tb + jnp.min(s6, axis=1) * 1e-30
    elif variant == "leaf_consume":
        s72 = comp(0)
        for c in range(1, 9):
            s72 = s72 + comp(c)
        tb = tb + jnp.min(s72, axis=1) * 1e-30
    elif variant == "leaf_consume64":
        s64 = comp(0)
        for c in range(1, 8):
            s64 = s64 + comp(c)
        tb = tb + jnp.min(s64, axis=1) * 1e-30
    elif variant != "no_leaf":
        tri = [comp(c) for c in range(9)]
        no_div = variant in ("no_div", "no_div_sel")  # noqa: F841 keep flag
        e1x, e1y, e1z = tri[3], tri[4], tri[5]
        e2x, e2y, e2z = tri[6], tri[7], tri[8]
        hx = dyE * e2z - dzE * e2y
        hy = dzE * e2x - dxE * e2z
        hz = dxE * e2y - dyE * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        if no_div:
            f = jnp.where(jnp.abs(a) < 1e-30, 1e-30, a)  # bogus math, same shape
        else:
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
        if variant in ("no_sel", "no_div_sel"):
            tb = jnp.where(jnp.any(hit, axis=1), t[:, 0], tb)  # bogus, cheap
        else:
            t_cand = jnp.where(hit, t, jnp.inf)
            jmin = jnp.argmin(t_cand, axis=1).astype(jnp.int32)
            tmin = jnp.min(t_cand, axis=1)
            new_hit = tmin < tb
            tb = jnp.where(new_hit, tmin, tb)
            best_t = jnp.where(new_hit, ((payload_t * 8 + jmin) << 8) | inst1_t, best_t)

    node_t = is_node.reshape(b, _LANES)
    if variant != "no_node":
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
        fa = grec[:, 48:56].astype(jnp.int32)
        fbv = grec[:, 56:64].astype(jnp.int32)
        entries = (fa << 8) | jnp.where(
            fbv > 0, fbv, inst1.reshape(b, _LANES)[:, None]
        )
        bits = (t_near < t_far) & node_t[:, None] & ((fa >> PAYLOAD_BITS) != 7)
        ibits = bits.astype(jnp.int32)
        incl = jnp.cumsum(ibits, axis=1)
        is_first = bits & (incl == 1)
        first_entry = jnp.sum(jnp.where(is_first, entries, 0), axis=1)
        has_any = incl[:, 7] > 0
        rest = bits & ~is_first
        ir = rest.astype(jnp.int32)
        n_push = jnp.sum(ir, axis=1)
        rc = n_push[:, None] - (jnp.cumsum(ir, axis=1) - ir)
        sp_t = sp.reshape(b, _LANES)
        if variant != "no_stack":
            pos = sp_t[:, None] + rc - 1
            for j in range(8):
                pos_j = _flat(pos[:, j])
                ok_j = _flat(rest[:, j]) & (pos_j < stack_size)
                stack = jnp.where(
                    ok_j[:, None] & (cols == pos_j[:, None]),
                    _flat(entries[:, j])[:, None],
                    stack,
                )
            sp = jnp.where(
                is_node, jnp.minimum(sp + _flat(n_push), stack_size), sp
            )
        nxt_t = jnp.where(node_t, jnp.where(has_any, first_entry, POP), POP)
        nxt = jnp.where(is_node | is_leaf, _flat(nxt_t), cur)
    else:
        nxt = jnp.where(is_node | is_leaf, POP, cur)

    out = dict(s)
    out["cur"] = nxt
    out["sp"] = sp
    out["t_best"] = _flat(tb)
    out["best"] = _flat(best_t)
    return out, stack


def main():
    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 260000
    desc = SceneDescription()
    mesh = meshgen.sponza_like(target_triangles=tris)
    desc.register_blas("m", build_blas(mesh, MeshAccelerator.SBVH, cache_dir=".cache/bvh"))
    desc.add_instance("m", (0.0, 0.0, 0.0))
    scene = pack_scene(desc, 8, 8)
    bvh = tw.build_scene_bvh(scene)

    rng = np.random.default_rng(0)
    lo = np.asarray(scene.tl_min).min(axis=0)
    hi = np.asarray(scene.tl_max).max(axis=0)
    c = 0.5 * (lo + hi)
    ext = (hi - lo).max()
    o = c + np.array([0.0, 0.1 * ext, 1.2 * ext])
    tgt = rng.uniform(lo, hi, size=(N, 3))
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.asarray(np.broadcast_to(o, (N, 3)), jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    t_max = jnp.full((N,), jnp.inf, jnp.float32)
    active = jnp.ones((N,), bool)
    cfg = RenderConfig()

    for variant in ["no_leaf", "leaf_consume6", "leaf_consume", "raw_sum",
                    "gather_only"]:
        @jax.jit
        def run(o, d, variant=variant):
            state = tw._init_state(t_max, active, bvh.root, False, False)
            stack = jnp.zeros((N, cfg.wide_stack_size), jnp.int32)
            rays_t = (_t(o), _t(d))

            def body(i, carry):
                st, sk = carry
                return step_variant(bvh, st, sk, rays_t, variant)

            state, stack = jax.lax.fori_loop(0, ITERS, body, (state, stack))
            return state["t_best"], state["best"]

        r = run(o, d)
        jax.block_until_ready(r)
        float(jnp.sum(r[0][jnp.isfinite(r[0])]))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            r = run(o, d)
            s = float(jnp.sum(jnp.where(jnp.isfinite(r[0]), r[0], 0.0)))
            best = min(best, time.perf_counter() - t0)
        ns = best / (N * ITERS) * 1e9
        print(f"{variant:12s}: {best*1e3:7.1f} ms  {ns:5.2f} ns/lane-iter  ({s:.0f})")


if __name__ == "__main__":
    main()
