"""FrameFeatures: fixed-capacity SoA container for per-image features.

Replaces the reference's Frame keypoint vectors + 64x48 bucket grid
(include/Frame.h:37-38,158-161; src/Frame.cc:230-245). There is no bucket
grid here: matchers evaluate full masked distance tiles, so the only
spatial structure needed is the raw coordinate arrays.
"""

from __future__ import annotations

from flax import struct
import jax.numpy as jnp

from ..geom import projection
from ..geom.projection import Camera


@struct.dataclass
class FrameFeatures:
    """All arrays have leading dim N (static capacity, padded).

    xy:        [N, 2] undistorted keypoint coords, level-0 pixels.
    xy_raw:    [N, 2] raw (distorted) coords — drawing/debug only.
    level:     [N] i32 pyramid octave.
    angle:     [N] f32 orientation (radians).
    response:  [N] f32 corner score.
    desc:      [N, 8] u32 packed binary descriptor.
    valid:     [N] bool.
    u_right:   [N] f32 right-image column (stereo/RGB-D; -1 = no stereo
               measurement; None for monocular frames) — reference
               Frame::mvuRight (include/Frame.h:139-143).
    depth:     [N] f32 metric depth (-1 unknown; None for monocular) —
               reference Frame::mvDepth.
    """

    xy: jnp.ndarray
    xy_raw: jnp.ndarray
    level: jnp.ndarray
    angle: jnp.ndarray
    response: jnp.ndarray
    desc: jnp.ndarray
    valid: jnp.ndarray
    u_right: jnp.ndarray = None
    depth: jnp.ndarray = None

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]

    def sigma2(self, scale: float = 1.2):
        """Per-keypoint sigma^2 = scale^(2*level) (reference mvLevelSigma2,
        src/ORBextractor.cc:431-441)."""
        return jnp.power(jnp.float32(scale * scale), self.level.astype(jnp.float32))

    def inv_sigma2(self, scale: float = 1.2):
        return 1.0 / self.sigma2(scale)


def undistort(cam: Camera, feats: FrameFeatures) -> FrameFeatures:
    """Undistort raw keypoint coordinates once per frame
    (reference Frame::UndistortKeyPoints, src/Frame.cc:404-434)."""
    und = projection.undistort_points(cam, feats.xy_raw)
    return feats.replace(xy=jnp.where(feats.valid[:, None], und, 0.0))
