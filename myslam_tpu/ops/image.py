"""Image pyramid and filtering ops.

Replaces the reference's OpenCV calls (cv::resize + reflected-border copy in
ORBextractor::ComputePyramid, src/ORBextractor.cc:1109-1137, and the 7x7
sigma=2 GaussianBlur before descriptor extraction,
src/ORBextractor.cc:1086-1092) with XLA convolutions and jax.image.resize.

Images are float32 [H, W] in [0, 255] (grayscale). All shapes static; the
pyramid is a Python tuple of per-level arrays with sizes fixed by config.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel_1d(size: int = 7, sigma: float = 2.0):
    x = np.arange(size) - (size - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return jnp.asarray(k / k.sum(), dtype=jnp.float32)


def _sep_conv2d(img, k1d):
    """Separable 2D convolution with reflect padding, [H, W] f32.

    Implemented as static-shift multiply-adds (pure VPU elementwise work)
    instead of conv_general_dilated: single-channel convs lower poorly on
    the TPU backend (measured ~2 ms + 11 s compile vs fused shifts)."""
    k = int(k1d.shape[0])
    pad = (k - 1) // 2
    H, W = img.shape
    x = jnp.pad(img, ((0, 0), (pad, pad)), mode="reflect")
    out = jnp.zeros_like(img)
    for i in range(k):
        out = out + k1d[i] * jax.lax.slice(x, (0, i), (H, i + W))
    x = jnp.pad(out, ((pad, pad), (0, 0)), mode="reflect")
    out = jnp.zeros_like(img)
    for i in range(k):
        out = out + k1d[i] * jax.lax.slice(x, (i, 0), (i + H, W))
    return out


def gaussian_blur(img, size: int = 7, sigma: float = 2.0):
    """7x7 sigma=2 Gaussian blur (reference src/ORBextractor.cc:1090)."""
    return _sep_conv2d(img, gaussian_kernel_1d(size, sigma))


def pyramid_shapes(height: int, width: int, n_levels: int, scale: float):
    """Static per-level (H, W) — mirrors ORBextractor::ComputePyramid
    rounding (src/ORBextractor.cc:1112-1115: cvRound(w/scale^l))."""
    return tuple(
        (int(round(height / scale**l)), int(round(width / scale**l)))
        for l in range(n_levels)
    )


def resize_bilinear(img, shape):
    return jax.image.resize(img, shape, method="bilinear")


@partial(jax.jit, static_argnames=("n_levels", "scale"))
def build_pyramid(img, n_levels: int = 8, scale: float = 1.2):
    """Tuple of n_levels images, level l downscaled by scale^l.

    Like the reference, each level is resized from the PREVIOUS level (not
    level 0) so blur accumulates the same way
    (src/ORBextractor.cc:1117-1124)."""
    shapes = pyramid_shapes(img.shape[0], img.shape[1], n_levels, scale)
    levels = [img]
    for l in range(1, n_levels):
        levels.append(resize_bilinear(levels[-1], shapes[l]))
    return tuple(levels)
