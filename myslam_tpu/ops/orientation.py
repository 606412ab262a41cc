"""Intensity-centroid keypoint orientation (IC_Angle).

TPU-native replacement for the reference's IC_Angle
(src/ORBextractor.cc:79-106): angle = atan2(m01, m10) over the circular
31x31 patch, where m01 = sum(y * I), m10 = sum(x * I) and the circle mask
is the same u_max row extents (src/ORBextractor.cc:455-472).

Batched over all keypoints via one vmapped dynamic-slice patch gather —
2k keypoints x 31x31 = ~2M pixels, trivially VPU-sized.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

HALF_PATCH = 15
PATCH = 2 * HALF_PATCH + 1  # 31


def _circle_mask_and_coords():
    """Circular mask + x/y coordinate grids for the 31x31 patch, matching the
    reference's integer u_max construction (src/ORBextractor.cc:455-472)."""
    umax = np.zeros(HALF_PATCH + 1, dtype=np.int32)
    vmax = int(np.floor(HALF_PATCH * np.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(HALF_PATCH * np.sqrt(2.0) / 2))
    hp2 = HALF_PATCH * HALF_PATCH
    for v in range(vmax + 1):
        umax[v] = int(round(np.sqrt(hp2 - v * v)))
    # symmetry completion
    v0 = 0
    for v in range(HALF_PATCH, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1

    ys, xs = np.mgrid[-HALF_PATCH : HALF_PATCH + 1, -HALF_PATCH : HALF_PATCH + 1]
    mask = np.abs(xs) <= umax[np.abs(ys)]
    return (
        jnp.asarray(mask, dtype=jnp.float32),
        jnp.asarray(xs, dtype=jnp.float32),
        jnp.asarray(ys, dtype=jnp.float32),
    )


_MASK, _XS, _YS = _circle_mask_and_coords()


@jax.jit
def ic_angles(img, xy, valid):
    """Orientation in radians for each keypoint.

    Args:
      img: [H, W] level image (pre-blur, like the reference which runs
           IC_Angle on mvImagePyramid, src/ORBextractor.cc:474-481).
      xy: [N, 2] keypoint (x, y) in level coords (float, rounded inside).
      valid: [N] bool.
    Returns: angles [N] float32 (radians in [-pi, pi]).
    """
    pad = jnp.pad(img, HALF_PATCH, mode="edge")
    xi = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, img.shape[1] - 1)
    yi = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, img.shape[0] - 1)

    def patch_moments(x, y):
        p = jax.lax.dynamic_slice(pad, (y, x), (PATCH, PATCH))
        m10 = jnp.sum(_XS * _MASK * p)
        m01 = jnp.sum(_YS * _MASK * p)
        return jnp.arctan2(m01, m10)

    ang = jax.vmap(patch_moments)(xi, yi)
    return jnp.where(valid, ang, 0.0)
