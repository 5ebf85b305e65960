"""Color conversions (device-side, jnp).

BGR→Lab matches OpenCV's 8-bit `cvtColor(BGR2Lab)` semantics (the reference
feeds uint8 frames to cv::cvtColor for appearance histograms,
segmentation/region_descriptor.cpp:73): output L is scaled to [0,255] by
255/100 and a,b are offset by +128.
"""

from __future__ import annotations

import jax.numpy as jnp

# sRGB D65 RGB -> XYZ (OpenCV constants), rows normalized for white point.
_RGB2XYZ = jnp.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    jnp.float32,
)
_WHITE = jnp.array([0.950456, 1.0, 1.088754], jnp.float32)


def _lab_f(t: jnp.ndarray) -> jnp.ndarray:
    # OpenCV threshold 0.008856; cube root above, linear below.
    return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)


def _srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92)


def bgr_to_lab(bgr: jnp.ndarray, *, uint8_scale: bool = True) -> jnp.ndarray:
    """Convert BGR float [0,1] (…,3) to Lab (sRGB gamma linearization, as
    OpenCV's cvtColor does).

    With uint8_scale (default), matches OpenCV 8-bit output ranges:
    L in [0,255] (scaled by 255/100), a,b in [0,255] (offset +128).
    Without it, L in [0,100], a,b in [-127,127] (OpenCV float semantics).
    """
    rgb = _srgb_to_linear(bgr[..., ::-1])
    xyz = rgb @ _RGB2XYZ.T
    xyz = xyz / _WHITE
    f = _lab_f(xyz)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    y = xyz[..., 1]
    L = jnp.where(y > 0.008856, 116.0 * fy - 16.0, 903.3 * y)
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    if uint8_scale:
        L = L * (255.0 / 100.0)
        a = a + 128.0
        b = b + 128.0
    return jnp.stack([L, a, b], axis=-1)


def bgr_u8_to_float(bgr_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 BGR -> float32 in [0,1] (reference: dense_segmentation.cpp:181)."""
    return bgr_u8.astype(jnp.float32) * (1.0 / 255.0)
