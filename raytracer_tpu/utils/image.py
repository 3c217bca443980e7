"""Image IO helpers (PNG via PIL; replaces the reference's SDL/GL presentation —
SURVEY.md 2.2: headless rendering to arrays + saved PNGs)."""

from __future__ import annotations

import numpy as np


def to_srgb_u8(linear_image: np.ndarray) -> np.ndarray:
    """Linear [H,W,3] float -> gamma-2.2 uint8 (Window.h:56-65 packs clamped RGB;
    the present shaders apply pow(1/2.2), fragment_identity.glsl:10-12)."""
    img = np.clip(np.asarray(linear_image), 0.0, 1.0) ** (1.0 / 2.2)
    return (img * 255.0 + 0.5).astype(np.uint8)


def save_png(path: str, image: np.ndarray, gamma: bool = True) -> None:
    from PIL import Image

    arr = to_srgb_u8(image) if gamma else (
        np.clip(np.asarray(image), 0, 1) * 255
    ).astype(np.uint8)
    Image.fromarray(arr).save(path)


def load_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
