"""Traversal-vs-brute-force equivalence: the wavefront two-level BVH walk must find
exactly the hits a direct loop over all triangles finds (the de-facto regression tool
the reference lacks; its analog is the heatmap render, SURVEY.md 4.3)."""

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.accel.blas import build_blas
from raytracer_tpu.config import MeshAccelerator, RenderConfig
from raytracer_tpu.ops import traversal
from raytracer_tpu.scene import meshgen
from raytracer_tpu.scene.description import SceneDescription
from raytracer_tpu.scene.device import pack_scene


def _scene_with(meshes_and_pos, seed=0):
    desc = SceneDescription()
    for i, (mesh, pos) in enumerate(meshes_and_pos):
        key = f"m{i}"
        desc.register_blas(key, build_blas(mesh, MeshAccelerator.BVH, cache_dir=None))
        desc.add_instance(key, pos)
    return pack_scene(desc, 8, 8)


def _brute_force(scene, o, d):
    """Reference semantics: closest hit over every (instance, triangle) pair."""
    o = np.asarray(o)
    d = np.asarray(d)
    n = o.shape[0]
    best_t = np.full(n, np.inf)
    hit = np.zeros(n, bool)
    inst_world = np.asarray(scene.inst_world)
    inst_inv = np.asarray(scene.inst_inv)
    p0 = np.asarray(scene.tr_p0)
    e1 = np.asarray(scene.tr_e1)
    e2 = np.asarray(scene.tr_e2)
    nd_left = np.asarray(scene.nd_left)
    nd_count = np.asarray(scene.nd_count)
    # per-instance triangle ranges: [root.first-ish] — instead loop all leaves per blas
    for ii in range(inst_world.shape[0]):
        inv = inst_inv[ii]
        oo = o @ inv[:, :3].T + inv[:, 3]
        dd = d @ inv[:, :3].T
        root = int(np.asarray(scene.inst_root)[ii])
        # gather this instance's triangles by walking its subtree
        stack = [root]
        tri_ids = []
        while stack:
            k = stack.pop()
            if nd_count[k] > 0:
                tri_ids += list(range(nd_left[k], nd_left[k] + nd_count[k]))
            else:
                stack += [nd_left[k], nd_left[k] + 1]
        for t_id in tri_ids:
            h = np.cross(dd, e2[t_id])
            a = np.sum(e1[t_id] * h, axis=-1)
            with np.errstate(divide="ignore", invalid="ignore"):
                f = 1.0 / a
            s = oo - p0[t_id]
            u = f * np.sum(s * h, axis=-1)
            q = np.cross(s, e1[t_id])
            v = f * np.sum(dd * q, axis=-1)
            t = f * np.sum(e2[t_id] * q, axis=-1)
            m = (
                (u > 0) & (u < 1) & (v > 0) & (u + v < 1)
                & (t > 0.005) & (t < best_t)
            )
            best_t = np.where(m, t, best_t)
            hit |= m
    return hit, best_t


def _trace(scene, o, d, cfg=None):
    cfg = cfg or RenderConfig(traversal_chunk=1 << 12)
    bvh = traversal.build_scene_bvh(scene)
    n = o.shape[0]
    return traversal.trace_closest(
        bvh,
        jnp.asarray(o, jnp.float32),
        jnp.asarray(d, jnp.float32),
        jnp.full((n,), jnp.inf, jnp.float32),
        jnp.ones((n,), bool),
        cfg,
    )


def _random_rays(n, seed, origin_box=5.0, target_box=2.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-origin_box, origin_box, size=(n, 3)).astype(np.float32)
    tgt = rng.uniform(-target_box, target_box, size=(n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def test_single_instance_matches_brute_force():
    scene = _scene_with([(meshgen.icosphere(1.0, 2), (0.0, 0.0, 0.0))])
    o, d = _random_rays(256, 3)
    res = _trace(scene, o, d)
    hit_bf, t_bf = _brute_force(scene, o, d)
    hit = np.asarray(res.tri) >= 0
    assert hit_bf.sum() > 0.1 * len(o), "test rays must actually hit"
    np.testing.assert_array_equal(hit, hit_bf)
    np.testing.assert_allclose(np.asarray(res.t)[hit], t_bf[hit], rtol=1e-4)


def test_multi_instance_shared_blas():
    torus = meshgen.torus(1.0, 0.3, 16, 8)
    box = meshgen.box((1.0, 2.0, 1.0))
    scene_desc = SceneDescription()
    scene_desc.register_blas("torus", build_blas(torus, MeshAccelerator.BVH, cache_dir=None))
    scene_desc.register_blas("box", build_blas(box, MeshAccelerator.BVH, cache_dir=None))
    scene_desc.add_instance("torus", (-2.0, 0.0, 0.0))
    i2 = scene_desc.add_instance("torus", (2.0, 0.5, 0.0))  # shared BLAS
    from raytracer_tpu.core import quaternion as quat

    i2.transform.rotation = quat.axis_angle([0.0, 0.0, 1.0], 0.7)
    scene_desc.add_instance("box", (0.0, -1.5, 0.0))
    scene = pack_scene(scene_desc, 8, 8)

    o, d = _random_rays(512, 4, origin_box=6.0, target_box=3.0)
    res = _trace(scene, o, d)
    hit_bf, t_bf = _brute_force(scene, o, d)
    hit = np.asarray(res.tri) >= 0
    assert hit_bf.sum() > 0.1 * len(o), "test rays must actually hit"
    np.testing.assert_array_equal(hit, hit_bf)
    np.testing.assert_allclose(np.asarray(res.t)[hit], t_bf[hit], rtol=1e-4)


def test_any_hit_matches_closest_hit_mask():
    scene = _scene_with([(meshgen.icosphere(1.0, 2), (0.0, 0.0, 0.0))])
    o, d = _random_rays(256, 5)
    cfg = RenderConfig(traversal_chunk=1 << 12)
    bvh = traversal.build_scene_bvh(scene)
    n = o.shape[0]
    t_max = jnp.full((n,), jnp.inf, jnp.float32)
    active = jnp.ones((n,), bool)
    res = traversal.trace_closest(bvh, jnp.asarray(o), jnp.asarray(d), t_max, active, cfg)
    blocked, inc = traversal.trace_any(bvh, jnp.asarray(o), jnp.asarray(d), t_max, active, cfg)
    assert int(inc) == 0
    np.testing.assert_array_equal(np.asarray(blocked), np.asarray(res.tri) >= 0)


def test_inactive_rays_report_miss():
    scene = _scene_with([(meshgen.icosphere(1.0, 1), (0.0, 0.0, 0.0))])
    # NB: not exactly through a vertex — the strict u>0/v>0 bounds (matching
    # BottomLevelBVH.cpp:231-244) reject exact-vertex hits
    o = np.tile(np.array([[0.11, 0.07, -5.0]], np.float32), (4, 1))
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (4, 1))
    bvh = traversal.build_scene_bvh(scene)
    cfg = RenderConfig()
    active = jnp.asarray([True, False, True, False])
    res = traversal.trace_closest(
        bvh, jnp.asarray(o), jnp.asarray(d), jnp.full((4,), jnp.inf), active, cfg
    )
    tri = np.asarray(res.tri)
    assert tri[0] >= 0 and tri[2] >= 0
    assert tri[1] == -1 and tri[3] == -1
