"""FXAA post pass (jnp port of the luma-based GLSL shader).

Reference: /root/reference/Data/Shaders/fragment_fxaa.glsl:21-70 — X-pattern luma taps,
gradient blur direction with span clamp, and a 2-vs-4 sample fallback by luma range.
The reference applies gamma 1/2.2 when sampling the linear framebuffer
(fragment_fxaa.glsl:16-18) and outputs the final gamma-space image; so does this.

Texture taps at arbitrary (bilinear) offsets become bilinear gathers on the image grid.
"""

from __future__ import annotations

import jax.numpy as jnp

FXAA_REDUCE_MIN = 1.0 / 128.0
FXAA_REDUCE_MUL = 1.0 / 8.0
FXAA_SPAN_MAX = 8.0

_LUMA = jnp.array([0.299, 0.587, 0.114])


def _bilinear_tap(img, x, y):
    """Sample gamma-space image at fractional pixel coords (clamped), bilinear."""
    h, w = img.shape[:2]
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    p00 = img[y0, x0]
    p10 = img[y0, x1]
    p01 = img[y1, x0]
    p11 = img[y1, x1]
    return (
        p00 * (1 - fx) * (1 - fy)
        + p10 * fx * (1 - fy)
        + p01 * (1 - fx) * fy
        + p11 * fx * fy
    )


def fxaa(linear_image):
    """[H,W,3] linear -> [H,W,3] gamma-space anti-aliased image."""
    img = jnp.clip(linear_image, 0.0, 1.0) ** (1.0 / 2.2)
    h, w = img.shape[:2]

    def shift(dy, dx):
        # clamp-to-edge neighbour fetch, matching the GLSL sampler's edge clamp
        # (a roll would wrap opposite-edge luma into border pixels)
        ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
        xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
        return img[ys[:, None], xs[None, :]]

    # X-pattern: the GLSL offsets are +-1 texel diagonals
    c_m = img
    c_tl = shift(-1, -1)
    c_tr = shift(-1, 1)
    c_bl = shift(1, -1)
    c_br = shift(1, 1)

    luma = lambda c: jnp.einsum("...c,c->...", c, _LUMA)  # noqa: E731
    l_tl, l_tr, l_bl, l_br, l_m = map(luma, (c_tl, c_tr, c_bl, c_br, c_m))

    l_min = jnp.minimum(jnp.minimum(jnp.minimum(l_tl, l_tr), jnp.minimum(l_bl, l_br)), l_m)
    l_max = jnp.maximum(jnp.maximum(jnp.maximum(l_tl, l_tr), jnp.maximum(l_bl, l_br)), l_m)

    dir_x = (l_bl + l_br) - (l_tl + l_tr)
    dir_y = (l_tl + l_bl) - (l_tr + l_br)

    reduce = jnp.maximum(FXAA_REDUCE_MIN, (l_tl + l_tr + l_bl + l_br) * 0.25 * FXAA_REDUCE_MUL)
    adjust = 1.0 / (jnp.minimum(jnp.abs(dir_x), jnp.abs(dir_y)) + reduce)
    dir_x = jnp.clip(dir_x * adjust, -FXAA_SPAN_MAX, FXAA_SPAN_MAX)
    dir_y = jnp.clip(dir_y * adjust, -FXAA_SPAN_MAX, FXAA_SPAN_MAX)

    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
    )

    def tap(k):
        return _bilinear_tap(img, xs + dir_x * k, ys + dir_y * k)

    result_a = 0.5 * (tap(1.0 / 3.0 - 0.5) + tap(2.0 / 3.0 - 0.5))
    result_b = 0.5 * (tap(0.0 - 0.5) + tap(1.0 - 0.5))
    result = 0.5 * (result_a + result_b)

    l_res = luma(result)
    bad = (l_res < l_min) | (l_res > l_max)
    return jnp.where(bad[..., None], result_a, result)
