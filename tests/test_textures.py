"""Texture pipeline tests: mip chain, atlas packing, and every filter mode
(Texture.cpp:49-337 semantics)."""

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.config import MipmapFilter, RenderConfig, TextureSampleMode
from raytracer_tpu.ops import texture_sample as ts
from raytracer_tpu.scene import textures


def _atlas_of(rgb, build_mips=True):
    tex = textures.from_array(rgb, srgb=False, build_mips=build_mips)
    atlas = textures.build_atlas([tex])
    return (
        jnp.asarray(atlas.data),
        jnp.asarray(atlas.width),
        jnp.asarray(atlas.height),
        jnp.asarray(atlas.mip_levels),
        jnp.asarray(atlas.mip_offsets),
        jnp.asarray(atlas.quad_idx),
    )


def test_mip_chain_box_filter():
    rgb = np.zeros((4, 4, 3), np.float32)
    rgb[0, 0] = 1.0  # single bright texel
    tex = textures.from_array(rgb, srgb=False)
    assert tex.mip_levels == 3  # 4x4, 2x2, 1x1
    # level1 texel (0,0) = average of the 2x2 block = 0.25
    lvl1 = tex.data[tex.mip_offsets[1] : tex.mip_offsets[1] + 4]
    np.testing.assert_allclose(lvl1[0], [0.25] * 3, atol=1e-6)
    # level2 = global average = 1/16
    lvl2 = tex.data[tex.mip_offsets[2] :]
    np.testing.assert_allclose(lvl2[0], [1.0 / 16] * 3, atol=1e-6)


def test_non_pot_textures_have_single_level():
    tex = textures.from_array(np.ones((5, 7, 3), np.float32), srgb=False)
    assert tex.mip_levels == 1


def test_atlas_reserves_white_none_texture():
    atlas = textures.build_atlas([])
    assert atlas.data.shape[0] == 1
    np.testing.assert_allclose(atlas.data[0], 1.0)


def test_bilinear_at_texel_centers():
    rng = np.random.default_rng(0)
    rgb = rng.uniform(size=(8, 8, 3)).astype(np.float32)
    tex = _atlas_of(rgb)
    # sample at the center of texel (x, y): s = (x + 0.5) / 8
    xs, ys = np.meshgrid(np.arange(8), np.arange(8), indexing="xy")
    s = jnp.asarray(((xs + 0.5) / 8.0).reshape(-1), jnp.float32)
    t = jnp.asarray(((ys + 0.5) / 8.0).reshape(-1), jnp.float32)
    tid = jnp.ones((64,), jnp.int32)
    out = ts._sample_bilinear(tex, tid, s, t, jnp.zeros((64,), jnp.int32))
    expected = rgb[ys.reshape(-1), xs.reshape(-1)]  # row-major: data[y*w + x]
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_fetch_wraparound():
    rgb = np.zeros((4, 4, 3), np.float32)
    rgb[0, 0] = 1.0
    tex = _atlas_of(rgb)
    tid = jnp.ones((2,), jnp.int32)
    lvl = jnp.zeros((2,), jnp.int32)
    out = ts._fetch_texel(
        tex, tid, jnp.asarray([4, -4]), jnp.asarray([4, -4]), lvl
    )  # wraps to (0,0)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def _deriv_sample(filter_mode, width_scale):
    """Sample the center with derivatives sized to force a given mip footprint."""
    rgb = np.zeros((16, 16, 3), np.float32)
    rgb[::2, :, 0] = 1.0  # horizontal stripes -> mips converge to 0.5
    tex = _atlas_of(rgb)
    cfg = RenderConfig(
        texture_sample_mode=TextureSampleMode.MIPMAP, mipmap_filter=filter_mode
    )
    n = 4
    tid = jnp.ones((n,), jnp.int32)
    s = jnp.full((n,), 0.5, jnp.float32)
    # t at the CENTER of an even (red) stripe so the base level reads 1.0
    t = jnp.full((n,), (4 + 0.5) / 16.0, jnp.float32)
    dd = jnp.full((n,), width_scale, jnp.float32)
    z = jnp.zeros((n,), jnp.float32)
    return np.asarray(ts.sample(tex, tid, s, t, dd, z, z, dd, cfg))


def test_trilinear_lod_converges_to_mean():
    # derivatives span the whole texture -> coarsest mip == mean (0.25, 0, 0)...
    # stripes mean: half rows red -> (0.5, 0, 0)
    out = _deriv_sample(MipmapFilter.TRILINEAR, 1.0)
    np.testing.assert_allclose(out[:, 0], 0.5, atol=1e-2)
    out_fine = _deriv_sample(MipmapFilter.TRILINEAR, 1e-6)
    # tiny footprint -> base level, away from the stripe mean
    assert abs(float(out_fine[0, 0]) - 0.5) > 0.2


def test_anisotropic_and_ewa_finite_and_bounded():
    for f in (MipmapFilter.ANISOTROPIC, MipmapFilter.EWA):
        for scale in (1e-6, 0.01, 0.2, 1.0):
            out = _deriv_sample(f, scale)
            assert np.all(np.isfinite(out))
            assert np.all((out >= -1e-4) & (out <= 1.0 + 1e-4))


def test_mipmap_mode_falls_back_to_bilinear_for_non_pot():
    rgb = np.ones((5, 7, 3), np.float32) * 0.3
    tex = _atlas_of(rgb)
    cfg = RenderConfig(texture_sample_mode=TextureSampleMode.MIPMAP)
    n = 2
    tid = jnp.ones((n,), jnp.int32)
    half = jnp.full((n,), 0.5, jnp.float32)
    big = jnp.full((n,), 0.5, jnp.float32)
    z = jnp.zeros((n,), jnp.float32)
    out = ts.sample(tex, tid, half, half, big, z, z, big, cfg)
    np.testing.assert_allclose(np.asarray(out), 0.3, atol=1e-5)


def test_texture_gradients_flow_to_texels():
    import jax

    rgb = np.random.default_rng(1).uniform(size=(8, 8, 3)).astype(np.float32)
    tex = _atlas_of(rgb)
    tid = jnp.ones((4,), jnp.int32)
    s = jnp.asarray([0.2, 0.4, 0.6, 0.8], jnp.float32)
    cfg = RenderConfig(texture_sample_mode=TextureSampleMode.BILINEAR)

    def loss(data):
        t2 = (data,) + tex[1:]
        z = jnp.zeros((4,), jnp.float32)
        return jnp.sum(ts.sample(t2, tid, s, s, z, z, z, z, cfg))

    g = jax.grad(loss)(tex[0])
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_quad_row_bilinear_matches_four_gathers():
    """The [X,12] quad-row path must reproduce the 4-texel-gather bilinear exactly
    (same weights, same texels, wrap included)."""
    rng = np.random.default_rng(3)
    rgb = rng.uniform(size=(16, 8, 3)).astype(np.float32)
    tex = _atlas_of(rgb)
    n = 256
    sv = jnp.asarray(rng.uniform(-0.2, 1.4, n).astype(np.float32))  # wraps both ways
    tv = jnp.asarray(rng.uniform(-0.2, 1.4, n).astype(np.float32))
    lvl = jnp.asarray(rng.integers(0, 3, n).astype(np.int32))
    tid = jnp.ones((n,), jnp.int32)
    ref = ts._sample_bilinear(tex, tid, sv, tv, lvl)
    q = ts._sample_bilinear(tex, tid, sv, tv, lvl, ts._expand_quads(tex))
    np.testing.assert_allclose(np.asarray(q), np.asarray(ref), atol=1e-6)
