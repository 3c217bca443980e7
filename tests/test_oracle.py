"""Whole-pipeline parity vs the scalar oracle renderer (render/oracle.py).

The oracle is a formula-for-formula scalar port of the reference's recursive
kernel (Raytracer.cpp:87-400) with brute-force intersection — structurally
unrelated to the wavefront renderer (no BVH, no queues, no throughput
re-association, recursion instead of generations).  Agreement at <= 1e-3 mean
ties the composed production pipeline (shading, Fresnel/Beer/TIR, all three
light falloffs, ray differentials, texture LOD) to the reference's math.

Expected divergence sources (documented, all bounded by the tolerances below):
  - f32 (wavefront, XLA-fused) vs f64 (oracle, numpy) arithmetic: shadow rays
    originate exactly ON surfaces, so a handful of lanes sit within rounding of
    the hit/miss decision (PERF.md "shadow-ray determinism"); a flipped lane
    changes that pixel by a full light contribution.  Hence the per-pixel
    mismatch budget alongside the mean bound.
  - sky texel addressing: the oracle rounds (Sky.cpp float_to_int), the
    wavefront renderer truncates — adjacent-texel picks on a smooth procedural
    probe differ by ~1e-3 per affected pixel.
  - instances use identity rotation: the reference (and oracle) leave mesh hit
    differentials in OBJECT space (BottomLevelBVH.cpp:291-301), the production
    renderer rotates them to world — the conventions coincide only for
    identity-rotation instances (oracle.py module docstring).
"""

import jax
import numpy as np

from raytracer_tpu.accel.blas import build_blas
from raytracer_tpu.config import (
    MeshAccelerator,
    MipmapFilter,
    RenderConfig,
    TextureSampleMode,
)
from raytracer_tpu.render import renderer
from raytracer_tpu.render.oracle import OracleRenderer
from raytracer_tpu.scene import meshgen
from raytracer_tpu.scene.description import (
    DirectionalLight,
    PointLight,
    SceneDescription,
    SpotLight,
)
from raytracer_tpu.scene.device import pack_scene
from raytracer_tpu.scene.sky import procedural_probe


def _oracle_scene():
    """All features the VERDICT parity brief lists: diffuse+specular under all
    three light types, mirror, dielectric with Beer+TIR+Fresnel, textured
    material with differential-driven LOD, mesh instancing."""
    desc = SceneDescription()
    data, size = procedural_probe(32)
    desc.set_sky(data, size)

    # dielectric sphere: Beer (transmittance < 1) + TIR (ior 1.5) + Fresnel,
    # plus nonzero reflection to exercise the reference's double-add semantics
    glass = desc.add_sphere((0.0, 1.0, 6.0), 1.0)
    desc.material(glass).diffuse = np.array([0.05, 0.05, 0.0])
    desc.material(glass).reflection = np.array([0.2, 0.2, 0.2])
    desc.material(glass).transmittance = np.array([0.7, 0.8, 0.9])
    desc.material(glass).index_of_refraction = 1.5

    # mirror sphere (reflection only)
    mirror = desc.add_sphere((-2.5, 1.2, 7.5), 1.2)
    desc.material(mirror).reflection = np.array([0.8, 0.7, 0.6])

    # textured floor plane: checkerboard with a full mip chain; the oblique view
    # gives large anisotropic footprints so the LOD path is exercised
    floor = desc.add_plane((0.0, -1.0, 0.0))
    ch = np.indices((16, 16)).sum(0) % 2
    desc.material(floor).texture_array = np.stack(
        [0.2 + 0.6 * ch, 0.3 + 0.4 * ch, 0.25 + 0.5 * ch], -1
    ).astype(np.float32)
    desc.material(floor).diffuse = np.array([1.0, 1.0, 1.0])

    # mesh instances sharing one BLAS — identity rotation (module docstring)
    ico = meshgen.icosphere(0.8, 2)
    for m in ico.materials:
        m.diffuse = np.array([0.6, 0.3, 0.2])
    desc.register_blas("ico", build_blas(ico, MeshAccelerator.BVH, cache_dir=None))
    desc.add_instance("ico", (2.6, 0.6, 7.0))
    desc.add_instance("ico", (0.8, 0.2, 4.0))

    desc.point_lights.append(
        PointLight(np.array([12.0, 10.0, 9.0]), np.array([0.0, 5.0, 3.0]))
    )
    desc.spot_lights.append(
        SpotLight(
            colour=np.array([6.0, 2.0, 2.0]),
            position=np.array([3.0, 5.0, 8.0]),
            direction=np.array([-0.3, -1.0, -0.2]),
            inner_angle_deg=35.0,
            outer_angle_deg=55.0,
        )
    )
    desc.directional_lights.append(
        DirectionalLight(np.array([0.35, 0.35, 0.4]), np.array([0.2, -1.0, 0.1]))
    )
    desc.camera.position = np.array([0.0, 1.4, 0.0])
    return desc


def _compare(cfg, desc=None, min_hit_frac=0.9):
    desc = desc if desc is not None else _oracle_scene()
    scene = pack_scene(desc, cfg.width, cfg.height)
    img_wave, stats = jax.jit(
        lambda s: renderer.render_with_stats(s, cfg)
    )(scene)
    assert int(stats.num_incomplete) == 0
    assert int(stats.num_dropped) == 0
    img_wave = np.asarray(img_wave)

    img_oracle = OracleRenderer(scene, cfg).render()

    delta = np.abs(img_wave - img_oracle).max(axis=-1)
    mean = float(np.abs(img_wave - img_oracle).mean())
    frac_bad = float((delta > 1e-3).mean())
    assert mean <= 1e-3, f"mean |delta| {mean:.2e} vs oracle"
    # a small pixel budget for f32-marginal shadow/texel decisions (docstring)
    assert frac_bad <= 0.02, f"{frac_bad:.3%} pixels differ > 1e-3"
    # the scene must actually exercise geometry: most pixels hit something
    assert float((img_oracle.sum(-1) > 0).mean()) > min_hit_frac
    return mean, frac_bad


def test_oracle_parity_mipmap_aniso():
    """Depth-3 recursion, MIPMAP + anisotropic LOD (the config3 filter)."""
    cfg = RenderConfig(
        width=48, height=32, num_bounces=3, queue_factor=2.0,
        traversal_chunk=1 << 11,
        texture_sample_mode=TextureSampleMode.MIPMAP,
        mipmap_filter=MipmapFilter.ANISOTROPIC,
    )
    _compare(cfg)


def test_oracle_parity_trilinear_deep():
    """Depth-5 recursion (dielectric chains), trilinear filter, unrolled
    bounce path (scan_bounces=False) — covers both pipeline shapes."""
    cfg = RenderConfig(
        width=40, height=28, num_bounces=5, queue_factor=2.0,
        traversal_chunk=1 << 11, scan_bounces=False,
        texture_sample_mode=TextureSampleMode.MIPMAP,
        mipmap_filter=MipmapFilter.TRILINEAR,
    )
    _compare(cfg)


def test_oracle_parity_ewa():
    """EWA filtering through the FULL renderer (Texture.cpp:242-337) — the
    scalar-level texture parity tests (test_textures.py) cover the filter in
    isolation; this ties the differential->ellipse->weighted-scan chain into
    the composed pipeline (VERDICT r4 #5a).  max_anisotropy=4 keeps the
    eccentricity-clamped ellipse bbox inside the renderer's static
    ewa_max_span window, where the bounded-window formulation is exact."""
    cfg = RenderConfig(
        width=48, height=32, num_bounces=2, queue_factor=2.0,
        traversal_chunk=1 << 11, max_anisotropy=4.0,
        texture_sample_mode=TextureSampleMode.MIPMAP,
        mipmap_filter=MipmapFilter.EWA,
    )
    _compare(cfg)


def _rotated_textured_scene():
    """A textured, uv-mapped mesh instance under a NON-identity rotation: the
    two paths previously unchecked by any oracle scene (VERDICT r4 #5b/#5c) —
    the mesh differential -> texture LOD chain, and the rotated-instance
    differential convention (compared under
    cfg.differentials_object_space=True, the reference's semantics,
    BottomLevelBVH.cpp:291-301)."""
    from raytracer_tpu.core import quaternion as quat

    desc = SceneDescription()
    data, size = procedural_probe(32)
    desc.set_sky(data, size)

    # uv-mapped box with a mip-mapped checker texture (meshgen boxes carry uvs)
    box = meshgen.box((2.0, 1.2, 1.6))
    ch = np.indices((32, 32)).sum(0) % 2
    tex = np.stack([0.15 + 0.7 * ch, 0.3 + 0.5 * ch, 0.6 + 0.3 * ch], -1)
    for m in box.materials:
        m.diffuse = np.array([0.9, 0.9, 0.85])
        m.texture_array = tex.astype(np.float32)
    desc.register_blas("box", build_blas(box, MeshAccelerator.BVH, cache_dir=None))
    inst = desc.add_instance("box", (0.0, 0.8, 5.0))
    inst.transform.rotation = quat.multiply(
        quat.axis_angle([0.0, 1.0, 0.0], 0.7),
        quat.axis_angle([1.0, 0.0, 0.0], 0.35),
    )
    inst2 = desc.add_instance("box", (-2.6, 0.5, 7.0))
    inst2.transform.rotation = quat.axis_angle([0.0, 1.0, 0.0], -1.1)

    # mirror floor so secondary rays re-hit the rotated textured mesh and the
    # reflected differentials drive its LOD too
    floor = desc.add_plane((0.0, -0.5, 0.0))
    desc.material(floor).diffuse = np.array([0.4, 0.4, 0.45])
    desc.material(floor).reflection = np.array([0.3, 0.3, 0.3])

    desc.point_lights.append(
        PointLight(np.array([14.0, 12.0, 10.0]), np.array([2.0, 6.0, 2.0]))
    )
    desc.directional_lights.append(
        DirectionalLight(np.array([0.3, 0.3, 0.35]), np.array([0.1, -1.0, 0.2]))
    )
    desc.camera.position = np.array([0.0, 1.2, 0.0])
    return desc


def test_oracle_parity_rotated_textured_mesh():
    """Rotated instances + textured mesh LOD, object-space differential
    convention (reference semantics) on BOTH sides — closes the previously
    untested rotated-instance differential path against an independent
    implementation."""
    cfg = RenderConfig(
        width=48, height=32, num_bounces=2, queue_factor=2.0,
        traversal_chunk=1 << 11, differentials_object_space=True,
        texture_sample_mode=TextureSampleMode.MIPMAP,
        mipmap_filter=MipmapFilter.ANISOTROPIC,
    )
    _compare(cfg, desc=_rotated_textured_scene(), min_hit_frac=0.5)


def test_object_space_flag_identity_invariant():
    """Under identity rotations the two differential conventions coincide:
    the flag must be a no-op there (sanity for the compatibility flag)."""
    cfg = RenderConfig(
        width=32, height=24, num_bounces=1, queue_factor=2.0,
        traversal_chunk=1 << 10,
        texture_sample_mode=TextureSampleMode.MIPMAP,
        mipmap_filter=MipmapFilter.ANISOTROPIC,
    )
    desc = _oracle_scene()
    scene = pack_scene(desc, cfg.width, cfg.height)
    img_a = np.asarray(renderer.render(scene, cfg))
    img_b = np.asarray(
        renderer.render(scene, cfg.replace(differentials_object_space=True))
    )
    assert np.array_equal(img_a, img_b)
