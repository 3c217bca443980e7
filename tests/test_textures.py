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


# ---------------------------------------------------------------------------
# Brute-force parity with the reference's scalar filtering semantics
# (Texture.cpp:131-337), re-evaluated in numpy with the true data-dependent
# loops — the jnp implementations' statically-bounded formulations must agree.
# ---------------------------------------------------------------------------


class _ScalarRef:
    """Scalar numpy re-evaluation of Texture.cpp (per-sample loops)."""

    MAX_ANISOTROPY = 8.0
    EWA_TABLE_SIZE = 128
    EWA_ALPHA = 2.0

    def __init__(self, tex):
        from raytracer_tpu.scene import textures as tex_mod

        self.data = np.asarray(tex.data)
        self.width = int(tex.width)
        self.height = int(tex.height)
        self.levels = int(tex.mip_levels)
        self.offsets = list(tex.mip_offsets)
        del tex_mod

    def fetch_texel(self, x, y, level):
        # Texture.cpp:131-147: positive-mod wraparound
        w = max(self.width >> level, 1)
        h = max(self.height >> level, 1)
        x, y = int(x) % w, int(y) % h
        return self.data[self.offsets[level] + x + y * w]

    def sample_bilinear(self, s, t, level=0):
        # Texture.cpp:157-186
        lw = max(self.width >> level, 1)
        lh = max(self.height >> level, 1)
        ss = s * lw - 0.5
        tt = t * lh - 0.5
        x0, y0 = int(np.floor(ss)), int(np.floor(tt))
        fs, ft = ss - np.floor(ss), tt - np.floor(tt)
        w0 = (1 - fs) * (1 - ft)
        w1 = fs * (1 - ft)
        w2 = (1 - fs) * ft
        w3 = fs * ft
        return (
            w0 * self.fetch_texel(x0, y0, level)
            + w1 * self.fetch_texel(x0 + 1, y0, level)
            + w2 * self.fetch_texel(x0, y0 + 1, level)
            + w3 * self.fetch_texel(x0 + 1, y0 + 1, level)
        )

    def sample_anisotropic(self, s, t, ds_dx, ds_dy, dt_dx, dt_dy):
        # Texture.cpp:207-239
        p_x = max(abs(ds_dx), abs(dt_dx))
        p_y = max(abs(ds_dy), abs(dt_dy))
        p_min, p_max = min(p_x, p_y), max(p_x, p_y)
        n = min(np.ceil(p_max / p_min) if p_min > 0 else np.inf, self.MAX_ANISOTROPY)
        lam = self.levels - 1.0 + np.log2(max(p_max / n, 1e-30))
        level = int(np.floor(lam + 0.5))  # Util::float_to_int = round
        if level < 0:
            return self.sample_bilinear(s, t)
        if level >= self.levels - 1:
            return self.fetch_texel(0, 0, self.levels - 1)
        x_major = p_x > p_y
        step_s = ds_dx if x_major else ds_dy
        step_t = dt_dx if x_major else dt_dy
        acc = np.zeros(3)
        i = 1.0
        while i <= n + 0.001:
            x = s + step_s * (i / (n + 1.0) - 0.5)
            y = t + step_t * (i / (n + 1.0) - 0.5)
            acc = acc + self.sample_bilinear(x, y, level)
            i += 1.0
        return acc / n

    def ewa_weight(self, r2):
        idx = min(int(np.floor(r2 * self.EWA_TABLE_SIZE + 0.5)), self.EWA_TABLE_SIZE - 1)
        r2q = idx / (self.EWA_TABLE_SIZE - 1)
        return np.exp(-self.EWA_ALPHA * r2q) - np.exp(-self.EWA_ALPHA)

    def sample_ewa(self, s, t, ds_dx, ds_dy, dt_dx, dt_dy):
        # Texture.cpp:242-337
        major = np.array([ds_dx, dt_dx], np.float64)
        minor = np.array([ds_dy, dt_dy], np.float64)
        maj_len = np.linalg.norm(major)
        min_len = np.linalg.norm(minor)
        if min_len > maj_len:
            major, minor = minor, major
            maj_len, min_len = min_len, maj_len
        if min_len < 1e-5:
            return self.sample_bilinear(s, t)
        if maj_len > self.width:
            return self.fetch_texel(0, 0, self.levels - 1)
        if min_len * self.MAX_ANISOTROPY < maj_len:
            scale = maj_len / (min_len * self.MAX_ANISOTROPY)
            minor = minor * scale
            min_len = min_len * scale
        lam = max(0.0, self.levels - 1.0 + np.log2(min_len))
        level = int(np.floor(lam + 0.5))
        if level >= self.levels - 1:
            return self.fetch_texel(0, 0, self.levels - 1)
        lw = float(self.width >> level)
        lh = float(self.height >> level)
        ss = s * lw - 0.5
        tt = t * lh - 0.5
        majx, majy = major[0] * lw, major[1] * lh
        minx, miny = minor[0] * lw, minor[1] * lh
        a = 1.0 + (majy * majy + miny * miny)
        b = -2.0 * (majx * majy + minx * miny)
        c = 1.0 + (majx * majx + minx * minx)
        inv_f = 1.0 / (a * c - b * b * 0.25)
        a, b, c = a * inv_f, b * inv_f, c * inv_f
        det = -b * b + 4.0 * a * c
        sqrt_u = np.sqrt(det * c)
        sqrt_v = np.sqrt(det * a)
        tid = 2.0 / det
        s0 = int(np.floor(ss - tid * sqrt_u + 0.5 + 0.5))
        s1 = int(np.floor(ss + tid * sqrt_u - 0.5 + 0.5))
        t0 = int(np.floor(tt - tid * sqrt_v + 0.5 + 0.5))
        t1 = int(np.floor(tt + tid * sqrt_v - 0.5 + 0.5))
        acc = np.zeros(3)
        wsum = 0.0
        for ti in range(t0, t1 + 1):
            for si in range(s0, s1 + 1):
                uu, vv = si - ss, ti - tt
                r2 = a * uu * uu + b * uu * vv + c * vv * vv
                if r2 < 1.0:
                    wgt = self.ewa_weight(r2)
                    acc = acc + wgt * self.fetch_texel(si, ti, level)
                    wsum += wgt
        return acc / wsum


def _parity_case(filter_mode, seed):
    rng = np.random.default_rng(seed)
    rgb = rng.uniform(0.0, 1.0, (32, 32, 3)).astype(np.float32)
    tex = textures.from_array(rgb, srgb=False, build_mips=True)
    atlas = _atlas_of(rgb)
    ref = _ScalarRef(tex)
    n = 200
    s = rng.uniform(0.0, 1.0, n).astype(np.float32)
    t = rng.uniform(0.0, 1.0, n).astype(np.float32)
    # derivative magnitudes spanning sharp to whole-texture footprints
    mag = 10.0 ** rng.uniform(-3.0, -0.3, n)
    ang = rng.uniform(0, 2 * np.pi, n)
    aniso = 10.0 ** rng.uniform(-1.2, 1.2, n)
    ds_dx = (mag * np.cos(ang)).astype(np.float32)
    dt_dx = (mag * np.sin(ang)).astype(np.float32)
    ds_dy = (-mag / aniso * np.sin(ang)).astype(np.float32)
    dt_dy = (mag / aniso * np.cos(ang)).astype(np.float32)
    cfg = RenderConfig(
        texture_sample_mode=TextureSampleMode.MIPMAP,
        mipmap_filter=filter_mode,
        max_anisotropy=8.0,
        ewa_max_span=32,
    )
    tid = jnp.ones((n,), jnp.int32)
    got = np.asarray(
        ts.sample(
            atlas, tid, jnp.asarray(s), jnp.asarray(t), jnp.asarray(ds_dx),
            jnp.asarray(ds_dy), jnp.asarray(dt_dx), jnp.asarray(dt_dy), cfg,
        )
    )
    fn = (
        ref.sample_anisotropic
        if filter_mode == MipmapFilter.ANISOTROPIC
        else ref.sample_ewa
    )
    want = np.stack(
        [fn(s[i], t[i], ds_dx[i], ds_dy[i], dt_dx[i], dt_dy[i]) for i in range(n)]
    )
    err = np.abs(got - want).max(-1)
    # f32-vs-f64 level/bbox rounding can flip a handful of lanes at decision
    # boundaries; everything else must match to float precision
    flipped = err > 1e-3
    assert flipped.mean() <= 0.02, f"{flipped.sum()}/{n} lanes off, max {err.max()}"
    assert np.median(err) < 1e-5


def test_anisotropic_parity_with_reference_semantics():
    _parity_case(MipmapFilter.ANISOTROPIC, seed=0)
    _parity_case(MipmapFilter.ANISOTROPIC, seed=1)


def test_ewa_parity_with_reference_semantics():
    _parity_case(MipmapFilter.EWA, seed=2)
    _parity_case(MipmapFilter.EWA, seed=3)
