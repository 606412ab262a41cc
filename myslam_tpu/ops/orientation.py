"""Intensity-centroid keypoint orientation (IC_Angle).

TPU-native replacement for the reference's IC_Angle
(src/ORBextractor.cc:79-106): angle = atan2(m01, m10) over the circular
31x31 patch, where m01 = sum(y * I), m10 = sum(x * I) and the circle mask
is the same u_max row extents (src/ORBextractor.cc:455-472).

Patches come from the gather-free one-hot extraction (ops/patches.py);
the moments are two [N, 961] x [961] matvecs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import patches as patches_mod

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
_WX = (_XS * _MASK).reshape(-1)   # [961]
_WY = (_YS * _MASK).reshape(-1)


@jax.jit
def ic_angles_from_patches(patches31):
    """patches31 [N, 31, 31] -> angles [N] (radians)."""
    p = patches31.reshape(patches31.shape[0], -1)
    m10 = p @ _WX
    m01 = p @ _WY
    return jnp.arctan2(m01, m10)


@jax.jit
def ic_angles(img, xy, valid):
    """Orientation in radians for each keypoint (standalone convenience;
    the extractor reuses its own patches)."""
    p = patches_mod.extract_patches(img, xy, HALF_PATCH)
    ang = ic_angles_from_patches(p)
    return jnp.where(valid, ang, 0.0)
