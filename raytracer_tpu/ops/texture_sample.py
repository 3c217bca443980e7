"""Differentiable texture filtering over the flat mip atlas.

Reference: /root/reference/Texture.cpp — nearest (149-155), bilinear (157-186),
trilinear (PBRT 10.4; 189-204), anisotropic (OpenGL EXT spec; 207-239), and EWA
(242-337).  The reference's per-lane scalar ``fetch_texel`` gathers become batched
``jnp.take`` over the atlas; every lane carries its own texture id, so one call
filters the whole wavefront across all textures at once.

EWA's data-dependent ellipse-bbox scan (Texture.cpp:302-334) is re-expressed as a
statically bounded window scan (config.ewa_max_span^2 taps, masked), since jit
requires static loop bounds; taps outside the window are dropped.

All filters are differentiable w.r.t. atlas texel values and (for bilinear-derived
filters) the sample coordinates.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..config import MipmapFilter, RenderConfig, TextureSampleMode
from ..core.vecmath import safe_sqrt as _safe_sqrt

_EWA_ALPHA = 2.0
_EWA_TABLE_SIZE = 128  # Texture.h:52-62


def _fetch_texel(tex, tex_id, x, y, level):
    """Wrap-around texel fetch (Texture.cpp:131-147). x, y, level, tex_id: [N] int32."""
    data, width, height, levels, offsets, _quad = tex
    w = jnp.maximum(width[tex_id] >> level, 1)
    h = jnp.maximum(height[tex_id] >> level, 1)
    x = jnp.mod(x, w)  # positive mod (Math.h:44-52)
    y = jnp.mod(y, h)
    idx = offsets[tex_id, level] + x + y * w
    # name the gathered texels as checkpoint residuals: atlas gathers dominate
    # the texture stage's cost (PERF.md: ~13 ns/lane fixed per gather op) and
    # their values are exactly what the filter VJPs need as primals — saving
    # them keeps the bwd pass from re-walking the whole tap chain
    return checkpoint_name(jnp.take(data, idx, axis=0), "gather")


def _expand_quads(tex):
    """[X,12] quad-row atlas: each row holds a texel's full 2x2 bilinear footprint
    (wrap baked into tex.quad_idx at pack time).  Built in-jit with one big gather
    so it stays differentiable w.r.t. the base atlas; one bilinear tap then costs
    ONE row gather instead of four."""
    data, _w, _h, _l, _o, quad = tex
    return jnp.take(data, quad.reshape(-1), axis=0).reshape(-1, 12)


def _sample_nearest(tex, tex_id, s, t):
    """Texture.cpp:149-155."""
    _, width, height, _, _, _ = tex
    wf = width[tex_id].astype(jnp.float32)
    hf = height[tex_id].astype(jnp.float32)
    x = jnp.round(s * wf).astype(jnp.int32)
    y = jnp.round(t * hf).astype(jnp.int32)
    zero = jnp.zeros_like(x)
    return _fetch_texel(tex, tex_id, x, y, zero)


def _sample_bilinear(tex, tex_id, s, t, level, data4=None):
    """Texture.cpp:157-186. level: [N] int32.

    With ``data4`` (the [X,12] quad-row atlas from ``_expand_quads``) the whole
    2x2 footprint arrives in ONE row gather; without it, four texel gathers
    (identical results - the quad rows are gathered from the same base atlas).
    """
    _, width, height, _, offsets, _ = tex
    lwi = jnp.maximum(width[tex_id] >> level, 1)
    lhi = jnp.maximum(height[tex_id] >> level, 1)
    lw = lwi.astype(jnp.float32)
    lh = lhi.astype(jnp.float32)
    ss = s * lw - 0.5
    tt = t * lh - 0.5
    fs = ss - jnp.floor(ss)
    ft = tt - jnp.floor(tt)
    w0 = (1.0 - fs) * (1.0 - ft)
    w1 = fs * (1.0 - ft)
    w2 = (1.0 - fs) * ft
    w3 = 1.0 - w0 - w1 - w2
    x0 = jnp.floor(ss).astype(jnp.int32)
    y0 = jnp.floor(tt).astype(jnp.int32)
    if data4 is None:
        return (
            w0[:, None] * _fetch_texel(tex, tex_id, x0, y0, level)
            + w1[:, None] * _fetch_texel(tex, tex_id, x0 + 1, y0, level)
            + w2[:, None] * _fetch_texel(tex, tex_id, x0, y0 + 1, level)
            + w3[:, None] * _fetch_texel(tex, tex_id, x0 + 1, y0 + 1, level)
        )
    x = jnp.mod(x0, lwi)
    y = jnp.mod(y0, lhi)
    # [N,12]; named for the same reason as _fetch_texel: one saved row per tap
    # replaces the bwd re-gather of the whole 2x2 footprint
    q = checkpoint_name(
        jnp.take(data4, offsets[tex_id, level] + x + y * lwi, axis=0), "gather"
    )
    return (
        w0[:, None] * q[:, 0:3]
        + w1[:, None] * q[:, 3:6]
        + w2[:, None] * q[:, 6:9]
        + w3[:, None] * q[:, 9:12]
    )


def _top_texel(tex, tex_id):
    """fetch_texel(0, 0, last_mip): the 1x1 coarsest level."""
    _, _, _, levels, _, _ = tex
    zero = jnp.zeros_like(tex_id)
    return _fetch_texel(tex, tex_id, zero, zero, levels[tex_id] - 1)


def _sample_trilinear(tex, tex_id, s, t, ds_dx, ds_dy, dt_dx, dt_dy, data4=None,
                      base=None, top=None):
    """PBRT-style trilinear LOD from the max abs derivative (Texture.cpp:189-204).

    ``base``/``top`` (the level-0 bilinear and 1x1-mip fallbacks) can be passed
    in by ``sample`` so their gather — and, in bwd, its atlas scatter-VJP — is
    shared with the non-mipmapped fallback path instead of issued twice.
    """
    _, _, _, levels, _, _ = tex
    lf = levels[tex_id].astype(jnp.float32)
    width = 2.0 * jnp.maximum(
        jnp.maximum(jnp.abs(ds_dx), jnp.abs(ds_dy)),
        jnp.maximum(jnp.abs(dt_dx), jnp.abs(dt_dy)),
    )
    lam = lf - 1.0 + jnp.log2(jnp.maximum(width, 1e-8))
    level = jnp.floor(lam).astype(jnp.int32)

    lo = jnp.clip(level, 0, levels[tex_id] - 1)
    hi = jnp.clip(level + 1, 0, levels[tex_id] - 1)
    f = (lam - jnp.floor(lam))[:, None]
    mixed = (1.0 - f) * _sample_bilinear(
        tex, tex_id, s, t, lo, data4
    ) + f * _sample_bilinear(tex, tex_id, s, t, hi, data4)
    if base is None:
        base = _sample_bilinear(tex, tex_id, s, t, jnp.zeros_like(level), data4)
    if top is None:
        top = _top_texel(tex, tex_id)
    out = jnp.where((level < 0)[:, None], base, mixed)
    out = jnp.where((level >= levels[tex_id] - 1)[:, None], top, out)
    return out


def _sample_anisotropic(
    tex, tex_id, s, t, ds_dx, ds_dy, dt_dx, dt_dy, max_anisotropy: float,
    data4=None, base=None, top=None,
):
    """OpenGL-EXT-style anisotropic filtering (Texture.cpp:207-239): up to N probes
    along the major axis at a sharper mip level, statically unrolled and masked."""
    _, _, _, levels, _, _ = tex
    lf = levels[tex_id].astype(jnp.float32)
    p_x = jnp.maximum(jnp.abs(ds_dx), jnp.abs(dt_dx))
    p_y = jnp.maximum(jnp.abs(ds_dy), jnp.abs(dt_dy))
    p_min = jnp.minimum(p_x, p_y)
    p_max = jnp.maximum(p_x, p_y)

    n = jnp.minimum(jnp.ceil(p_max / jnp.maximum(p_min, 1e-20)), max_anisotropy)
    n = jnp.maximum(n, 1.0)
    lam = lf - 1.0 + jnp.log2(jnp.maximum(p_max / n, 1e-20))
    level = jnp.round(lam).astype(jnp.int32)  # Util::float_to_int rounds to nearest
    level_c = jnp.clip(level, 0, levels[tex_id] - 1)

    x_major = p_x > p_y
    step_s = jnp.where(x_major, ds_dx, ds_dy)
    step_t = jnp.where(x_major, dt_dx, dt_dy)
    inv_np1 = 1.0 / (n + 1.0)

    acc = jnp.zeros((s.shape[0], 3), s.dtype)
    max_taps = int(max_anisotropy)
    for i in range(1, max_taps + 1):
        fi = jnp.float32(i)
        use = fi <= n + 0.001
        x = s + step_s * (fi * inv_np1 - 0.5)
        y = t + step_t * (fi * inv_np1 - 0.5)
        tap = _sample_bilinear(tex, tex_id, x, y, level_c, data4)
        acc = acc + jnp.where(use[:, None], tap, 0.0)
    aniso = acc / n[:, None]

    if base is None:
        base = _sample_bilinear(tex, tex_id, s, t, jnp.zeros_like(level), data4)
    if top is None:
        top = _top_texel(tex, tex_id)
    out = jnp.where((level < 0)[:, None], base, aniso)
    out = jnp.where((level >= levels[tex_id] - 1)[:, None], top, out)
    return out


def _ewa_weight(r2):
    """Quantized gaussian falloff, identical to the reference's 128-entry table
    (Texture.h:53-62); the index rounds to nearest (Util::float_to_int,
    Texture.cpp:327)."""
    idx = jnp.minimum(jnp.floor(r2 * _EWA_TABLE_SIZE + 0.5), _EWA_TABLE_SIZE - 1)
    r2q = idx / (_EWA_TABLE_SIZE - 1)
    return jnp.exp(-_EWA_ALPHA * r2q) - jnp.exp(-_EWA_ALPHA)


def _sample_ewa(
    tex, tex_id, s, t, ds_dx, ds_dy, dt_dx, dt_dy, cfg: RenderConfig, data4=None,
    base=None, top=None,
):
    """Elliptical weighted average (Texture.cpp:242-337), bounded-window form."""
    _, width, height, levels, _, _ = tex
    lf = levels[tex_id].astype(jnp.float32)
    wf = width[tex_id].astype(jnp.float32)
    hf = height[tex_id].astype(jnp.float32)

    maj_x, maj_y = ds_dx, dt_dx
    min_x, min_y = ds_dy, dt_dy
    maj_len = _safe_sqrt(maj_x * maj_x + maj_y * maj_y)
    min_len = _safe_sqrt(min_x * min_x + min_y * min_y)
    swap = min_len > maj_len
    maj_x, min_x = jnp.where(swap, min_x, maj_x), jnp.where(swap, maj_x, min_x)
    maj_y, min_y = jnp.where(swap, min_y, maj_y), jnp.where(swap, maj_y, min_y)
    maj_len, min_len = (
        jnp.where(swap, min_len, maj_len),
        jnp.where(swap, maj_len, min_len),
    )

    degenerate = min_len < 1e-5
    too_big = maj_len > wf

    # eccentricity clamp (Texture.cpp:262-268)
    scale = maj_len / jnp.maximum(min_len * cfg.max_anisotropy, 1e-20)
    need = min_len * cfg.max_anisotropy < maj_len
    min_x = jnp.where(need, min_x * scale, min_x)
    min_y = jnp.where(need, min_y * scale, min_y)
    min_len = jnp.where(need, min_len * scale, min_len)

    lam = jnp.maximum(0.0, lf - 1.0 + jnp.log2(jnp.maximum(min_len, 1e-20)))
    level = jnp.round(lam).astype(jnp.int32)
    at_top = level >= levels[tex_id] - 1
    level_c = jnp.clip(level, 0, levels[tex_id] - 1)

    lw = jnp.maximum(width[tex_id] >> level_c, 1).astype(jnp.float32)
    lh = jnp.maximum(height[tex_id] >> level_c, 1).astype(jnp.float32)
    ss = s * lw - 0.5
    tt = t * lh - 0.5
    majx = maj_x * lw
    majy = maj_y * lh
    minx = min_x * lw
    miny = min_y * lh

    a = 1.0 + (majy * majy + miny * miny)
    b = -2.0 * (majx * majy + minx * miny)
    c = 1.0 + (majx * majx + minx * minx)
    inv_f = 1.0 / (a * c - b * b * 0.25)
    a, b, c = a * inv_f, b * inv_f, c * inv_f

    det = -b * b + 4.0 * a * c
    sqrt_u = _safe_sqrt(det * c)
    sqrt_v = _safe_sqrt(det * a)
    two_inv_det = 2.0 / det
    # Util::float_to_int rounds to nearest: round(x) == floor(x + 0.5)
    s0 = jnp.floor(ss - two_inv_det * sqrt_u + 1.0).astype(jnp.int32)
    s1 = jnp.floor(ss + two_inv_det * sqrt_u).astype(jnp.int32)
    t0 = jnp.floor(tt - two_inv_det * sqrt_v + 1.0).astype(jnp.int32)
    t1 = jnp.floor(tt + two_inv_det * sqrt_v).astype(jnp.int32)

    span = cfg.ewa_max_span
    acc = jnp.zeros((s.shape[0], 3), s.dtype)
    wsum = jnp.zeros_like(s)
    for dj in range(span):
        tj = t0 + dj
        for di in range(span):
            si = s0 + di
            in_box = (si <= s1) & (tj <= t1)
            uu = si.astype(jnp.float32) - ss
            vv = tj.astype(jnp.float32) - tt
            r2 = a * uu * uu + b * uu * vv + c * vv * vv
            inside = in_box & (r2 < 1.0)
            wgt = jnp.where(inside, _ewa_weight(r2), 0.0)
            texel = _fetch_texel(tex, tex_id, si, tj, level_c)
            acc = acc + wgt[:, None] * texel
            wsum = wsum + wgt
    ewa = acc / jnp.maximum(wsum, 1e-20)[:, None]

    bil = base if base is not None else _sample_bilinear(
        tex, tex_id, s, t, jnp.zeros_like(level), data4
    )
    if top is None:
        top = _top_texel(tex, tex_id)
    out = jnp.where(degenerate[:, None], bil, ewa)
    out = jnp.where((too_big | at_top)[:, None], top, out)
    return out


def sample(
    tex,
    tex_id,
    s,
    t,
    ds_dx,
    ds_dy,
    dt_dx,
    dt_dy,
    cfg: RenderConfig,
    data4=None,
):
    """Config-dispatched texture sample for a wavefront (Texture.h:33-49).

    tex: (data [X,3], width [K], height [K], levels [K], offsets [K,16],
    quad_idx [X,4]).  tex_id: [N] int32 per-lane atlas ids (0 = none -> white).
    ``data4``: optional precomputed quad-row atlas (``expand_quads``) — the
    whole-atlas gather is scene-only, so callers rendering many wavefronts
    (one per generation per chunk) should hoist it to frame level instead of
    re-expanding per call.
    """
    mode = cfg.texture_sample_mode
    if mode == TextureSampleMode.NEAREST:
        return _sample_nearest(tex, tex_id, s, t)
    if data4 is None:
        data4 = _expand_quads(tex)  # one whole-atlas gather, shared per tap
    if mode == TextureSampleMode.BILINEAR:
        return _sample_bilinear(tex, tex_id, s, t, jnp.zeros_like(tex_id), data4)

    # MIPMAP: non-mipmapped textures (levels == 1) fall back to bilinear
    # (Texture.h:37).  The level-0 bilinear and the 1x1-mip top texel are
    # computed ONCE and shared with the filter's out-of-range fallbacks: the
    # filters' internal base/bil calls are argument-identical, and each
    # deduplicated tap saves one atlas row gather in fwd plus one ~27 ns/lane
    # scatter-add in the texture VJP (PERF.md scatter cost model).
    _, _, _, levels, _, _ = tex
    bil = _sample_bilinear(tex, tex_id, s, t, jnp.zeros_like(tex_id), data4)
    top = _top_texel(tex, tex_id)
    if cfg.mipmap_filter == MipmapFilter.TRILINEAR:
        mip = _sample_trilinear(tex, tex_id, s, t, ds_dx, ds_dy, dt_dx, dt_dy,
                                data4, base=bil, top=top)
    elif cfg.mipmap_filter == MipmapFilter.ANISOTROPIC:
        mip = _sample_anisotropic(
            tex, tex_id, s, t, ds_dx, ds_dy, dt_dx, dt_dy, cfg.max_anisotropy,
            data4, base=bil, top=top,
        )
    else:
        mip = _sample_ewa(tex, tex_id, s, t, ds_dx, ds_dy, dt_dx, dt_dy, cfg,
                          data4, base=bil, top=top)
    return jnp.where((levels[tex_id] > 1)[:, None], mip, bil)


def expand_quads(tex):
    """Public frame-level hoist of the quad-row atlas (see sample(data4=...))."""
    return _expand_quads(tex)
