"""Stereo rectification: undistort-rectify maps + device-side remap.

TPU-native equivalent of the cv::initUndistortRectifyMap /
cv::remap pair the reference's stereo examples rely on (the EuRoC
stereo driver declared at CMakeLists.txt:110-116 reads LEFT.K/D/R/P and
RIGHT.K/D/R/P from the settings file and rectifies every frame before
Frame construction — the library itself assumes rectified input,
src/Frame.cc:61-117 computes stereo matches along horizontal epipolar
lines).

Maps are built ONCE on the host (numpy, exact mirror of OpenCV's
pinhole+radtan model) and the per-frame remap is a jitted bilinear
gather on device, fused with whatever follows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def build_rectify_maps(K, D, R, P, width: int, height: int):
    """Forward map from rectified pixel -> source (distorted) pixel.

    Args:
      K: [3,3] original intrinsics.  D: [k1,k2,p1,p2(,k3)] radtan.
      R: [3,3] rectifying rotation.  P: [3,4] or [3,3] new projection.
      width/height: rectified image size.
    Returns (map_x, map_y) float32 [H, W] — the same contract as
    cv::initUndistortRectifyMap(CV_32F).
    """
    K = np.asarray(K, np.float64)
    D = np.asarray(D, np.float64).ravel()
    D = np.concatenate([D, np.zeros(max(0, 5 - len(D)))])
    R = np.asarray(R, np.float64)
    P = np.asarray(P, np.float64)
    fx_n, fy_n = P[0, 0], P[1, 1]
    cx_n, cy_n = P[0, 2], P[1, 2]

    u, v = np.meshgrid(np.arange(width, dtype=np.float64),
                       np.arange(height, dtype=np.float64))
    # rectified pixel -> normalized ray in the rectified frame
    x = (u - cx_n) / fx_n
    y = (v - cy_n) / fy_n
    ray = np.stack([x, y, np.ones_like(x)], axis=-1)
    # rotate back into the original camera frame (R maps original ->
    # rectified, so apply R^T)
    ray = ray @ R          # == (R.T @ ray^T)^T
    xn = ray[..., 0] / ray[..., 2]
    yn = ray[..., 1] / ray[..., 2]
    # apply the radtan distortion model (k1, k2, p1, p2, k3)
    k1, k2, p1, p2, k3 = D[:5]
    r2 = xn * xn + yn * yn
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    xd = xn * radial + 2 * p1 * xn * yn + p2 * (r2 + 2 * xn * xn)
    yd = yn * radial + p1 * (r2 + 2 * yn * yn) + 2 * p2 * xn * yn
    map_x = (K[0, 0] * xd + K[0, 2]).astype(np.float32)
    map_y = (K[1, 1] * yd + K[1, 2]).astype(np.float32)
    return map_x, map_y


@jax.jit
def remap_bilinear(img, map_x, map_y):
    """Bilinear resample img at (map_x, map_y); out-of-bounds -> 0
    (cv::remap with BORDER_CONSTANT). One gather of the four neighbor
    planes — runs on device so rectification fuses into the frame
    pipeline."""
    H, W = img.shape
    x0i = jnp.floor(map_x).astype(jnp.int32)
    y0i = jnp.floor(map_y).astype(jnp.int32)
    # x == W-1 / y == H-1 are valid samples (cv::remap treats the last
    # pixel as in-bounds); the clamped x0c/y0c below keep the gather safe
    inb = ((map_x >= 0) & (map_x <= W - 1)
           & (map_y >= 0) & (map_y <= H - 1))
    x0c = jnp.clip(x0i, 0, W - 2)
    y0c = jnp.clip(y0i, 0, H - 2)
    # Fractions against the CLAMPED base: at map_x == W-1 the base clamps
    # to W-2, so fx must be 1 (not 0) to sample the true last column.
    fx = map_x - x0c
    fy = map_y - y0c
    i00 = img[y0c, x0c]
    i01 = img[y0c, x0c + 1]
    i10 = img[y0c + 1, x0c]
    i11 = img[y0c + 1, x0c + 1]
    out = ((1 - fy) * ((1 - fx) * i00 + fx * i01)
           + fy * ((1 - fx) * i10 + fx * i11))
    return jnp.where(inb, out, 0.0)


class StereoRectifier:
    """Host wrapper: build both cameras' maps from a Settings object's
    LEFT.*/RIGHT.* opencv-matrix nodes (the reference stereo example's
    calibration surface) and rectify pairs on device."""

    def __init__(self, settings):
        M = settings.matrices
        need = ["LEFT.K", "LEFT.D", "LEFT.R", "LEFT.P",
                "RIGHT.K", "RIGHT.D", "RIGHT.R", "RIGHT.P"]
        missing = [k for k in need if k not in M]
        if missing:
            raise ValueError(f"settings missing rectification nodes: "
                             f"{missing}")
        w = int(settings.extras.get("LEFT.width", settings.width))
        h = int(settings.extras.get("LEFT.height", settings.height))
        self.lx, self.ly = build_rectify_maps(
            M["LEFT.K"], M["LEFT.D"], M["LEFT.R"], M["LEFT.P"], w, h)
        self.rx, self.ry = build_rectify_maps(
            M["RIGHT.K"], M["RIGHT.D"], M["RIGHT.R"], M["RIGHT.P"], w, h)
        self.lx = jnp.asarray(self.lx)
        self.ly = jnp.asarray(self.ly)
        self.rx = jnp.asarray(self.rx)
        self.ry = jnp.asarray(self.ry)

    def __call__(self, left, right):
        left = jnp.asarray(left).astype(jnp.float32)
        right = jnp.asarray(right).astype(jnp.float32)
        return (remap_bilinear(left, self.lx, self.ly),
                remap_bilinear(right, self.rx, self.ry))
