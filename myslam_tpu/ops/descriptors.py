"""Rotation-steered binary (ORB-style) descriptors, batched.

TPU-native replacement for computeOrbDescriptor
(reference src/ORBextractor.cc:110-149): 256 intensity comparisons of a
point-pair pattern rotated by the keypoint angle, sampled from the blurred
level image, packed into 8 uint32 lanes (the reference packs 32 uint8,
src/ORBextractor.cc:144-148 — u32 lanes make XOR+popcount matching wider).

Pattern: the reference embeds OpenCV's learned bit_pattern_31_
(src/ORBextractor.cc:152-411). We deliberately do NOT copy that table —
this framework defines its own seeded pattern with the same statistics
(Gaussian-distributed pairs, sigma = patch/5 per the original BRIEF paper),
generated once at import. Descriptors are therefore NOT bit-compatible with
OpenCV ORB (they don't need to be: matching is always descriptor-to-
descriptor within this framework), but have the same length, invariances
and matching behavior. `trained_pattern` supports loading a learned pattern
later.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

N_BITS = 256
HALF_PATCH = 15
# Sample window: rotated pattern coords stay within +/-15 after clamping;
# patch gather uses a 37x37 window to leave rotation headroom before clamp.
GATHER_HALF = 18
GATHER = 2 * GATHER_HALF + 1  # 37


def _make_pattern(seed: int = 7) -> np.ndarray:
    """[256, 4] (x1, y1, x2, y2) pattern, Gaussian sigma = patch/5, clipped
    to the 31x31 patch like BRIEF (Calonder et al.); fixed seed so every
    process generates identical descriptors."""
    rng = np.random.default_rng(seed)
    sigma = (2 * HALF_PATCH + 1) / 5.0
    pts = rng.normal(0.0, sigma, size=(N_BITS, 4))
    pts = np.clip(np.round(pts), -HALF_PATCH, HALF_PATCH).astype(np.int32)
    # Avoid degenerate pairs (identical endpoints).
    same = (pts[:, 0] == pts[:, 2]) & (pts[:, 1] == pts[:, 3])
    pts[same, 2] = np.clip(pts[same, 2] + 1, -HALF_PATCH, HALF_PATCH)
    pts[same, 3] = np.clip(pts[same, 3] - 1, -HALF_PATCH, HALF_PATCH)
    return pts


_PATTERN = jnp.asarray(_make_pattern(), dtype=jnp.float32)  # [256, 4]

_BIT_WEIGHTS = jnp.asarray((1 << np.arange(32)).astype(np.uint32))


@jax.jit
def orb_descriptors(img_blur, xy, angle, valid):
    """Compute descriptors for all keypoints of one pyramid level.

    Args:
      img_blur: [H, W] blurred level image (reference blurs with 7x7 sigma=2
                before descriptor sampling, src/ORBextractor.cc:1086-1092).
      xy: [N, 2] keypoint (x, y) in level coords.
      angle: [N] orientation radians.
      valid: [N] bool.
    Returns: desc [N, 8] uint32.
    """
    H, W = img_blur.shape
    pad = jnp.pad(img_blur, GATHER_HALF, mode="edge")
    xi = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, H - 1)

    cos_a = jnp.cos(angle)
    sin_a = jnp.sin(angle)

    def per_kp(x, y, c, s):
        patch = jax.lax.dynamic_slice(pad, (y, x), (GATHER, GATHER))
        flat = patch.reshape(-1)
        # Rotate pattern points: same rounding as the reference's GET_VALUE
        # (src/ORBextractor.cc:119-121: cvRound(x cos - y sin), ...).
        px1, py1, px2, py2 = (_PATTERN[:, 0], _PATTERN[:, 1],
                              _PATTERN[:, 2], _PATTERN[:, 3])

        def rot(px, py):
            rx = jnp.round(px * c - py * s)
            ry = jnp.round(px * s + py * c)
            rx = jnp.clip(rx, -GATHER_HALF, GATHER_HALF) + GATHER_HALF
            ry = jnp.clip(ry, -GATHER_HALF, GATHER_HALF) + GATHER_HALF
            return (ry * GATHER + rx).astype(jnp.int32)

        v1 = jnp.take(flat, rot(px1, py1))
        v2 = jnp.take(flat, rot(px2, py2))
        bits = (v1 < v2).astype(jnp.uint32)  # [256]
        lanes = bits.reshape(8, 32)
        return jnp.sum(lanes * _BIT_WEIGHTS[None, :], axis=1, dtype=jnp.uint32)

    desc = jax.vmap(per_kp)(xi, yi, cos_a, sin_a)
    return jnp.where(valid[:, None], desc, jnp.zeros_like(desc))
