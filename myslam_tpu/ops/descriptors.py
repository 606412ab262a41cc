"""Rotation-steered binary (ORB-style) descriptors, batched and gather-free.

TPU-native replacement for computeOrbDescriptor
(reference src/ORBextractor.cc:110-149): 256 intensity comparisons of a
point-pair pattern rotated by the keypoint angle, sampled from the blurred
level image, packed into 8 uint32 lanes.

Sampling strategy (no gathers — see ops/indexing.py for why):
- a [N, 43, 43] patch per keypoint via one-hot einsums (ops/patches.py);
- the keypoint angle is quantized to ANGLE_BINS bins (ORB's own rotation
  granularity is 12 deg; 64 bins = 5.6 deg keeps the sampling error under
  a pixel at patch radius);
- per bin, the 512 rotated+rounded pattern offsets are a fixed selection
  of patch pixels, applied to ALL keypoints as one one-hot einsum, then
  each keypoint picks its bin's result with a tiny one-hot contraction.
- bit packing is two f32 matmuls against 2^k weights split into u16
  halves (sums stay < 2^16, exact in f32), recombined in uint32.

Pattern: the reference embeds OpenCV's learned bit_pattern_31_
(src/ORBextractor.cc:152-411). We deliberately do NOT copy that table —
this framework defines its own seeded pattern with the same statistics
(Gaussian pairs, sigma = patch/5 per the BRIEF paper). Descriptors are
NOT bit-compatible with OpenCV ORB (matching is always within this
framework) but have the same length and invariances.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

N_BITS = 256
HALF_PATCH = 15
# rotated pattern coords reach +-15*sqrt(2) ~ 21.2; half=21 with rounding
# clamps only the extreme corners (same effect as the reference's cvRound
# on a 31x31 window edge)
PATCH_HALF = 21
PATCH_S = 2 * PATCH_HALF + 1  # 43
ANGLE_BINS = 64


def _make_pattern(seed: int = 7) -> np.ndarray:
    """[256, 4] (x1, y1, x2, y2), Gaussian sigma = patch/5, clipped to the
    31x31 patch like BRIEF; fixed seed so every process generates identical
    descriptors."""
    rng = np.random.default_rng(seed)
    sigma = (2 * HALF_PATCH + 1) / 5.0
    pts = rng.normal(0.0, sigma, size=(N_BITS, 4))
    pts = np.clip(np.round(pts), -HALF_PATCH, HALF_PATCH).astype(np.int32)
    same = (pts[:, 0] == pts[:, 2]) & (pts[:, 1] == pts[:, 3])
    pts[same, 2] = np.clip(pts[same, 2] + 1, -HALF_PATCH, HALF_PATCH)
    pts[same, 3] = np.clip(pts[same, 3] - 1, -HALF_PATCH, HALF_PATCH)
    return pts


def _binned_indices() -> np.ndarray:
    """[ANGLE_BINS, 512] flat patch index of every rotated pattern endpoint
    (first 256 = endpoint 1, last 256 = endpoint 2). Same rounding as the
    reference's GET_VALUE (cvRound(px cos - py sin), ...)."""
    pat = _make_pattern().astype(np.float64)
    out = np.zeros((ANGLE_BINS, 2 * N_BITS), np.int32)
    for b in range(ANGLE_BINS):
        a = 2 * np.pi * b / ANGLE_BINS
        c, s = np.cos(a), np.sin(a)
        for e in range(2):
            px = pat[:, 2 * e]
            py = pat[:, 2 * e + 1]
            rx = np.clip(np.round(px * c - py * s), -PATCH_HALF, PATCH_HALF)
            ry = np.clip(np.round(px * s + py * c), -PATCH_HALF, PATCH_HALF)
            out[b, e * N_BITS : (e + 1) * N_BITS] = (
                (ry + PATCH_HALF) * PATCH_S + (rx + PATCH_HALF)).astype(np.int32)
    return out


_BIN_IDX = jnp.asarray(_binned_indices())          # [B, 512]
_PACK_LO = jnp.asarray((1 << np.arange(16)).astype(np.float32))
_PACK_HI = _PACK_LO  # same weights; applied to the upper 16 bits


@jax.jit
def orb_descriptors_from_patches(patches, angle, valid):
    """patches [N, 43, 43] f32 (blurred level image), angle [N] radians,
    valid [N] -> desc [N, 8] uint32."""
    n = patches.shape[0]

    two_pi = 2.0 * jnp.pi
    bins = jnp.round(jnp.mod(angle, two_pi) / two_pi * ANGLE_BINS)
    bins = jnp.mod(bins, ANGLE_BINS).astype(jnp.int32)

    # Per-keypoint sampling, factored hi/lo. The earlier all-bins form
    # (sample every keypoint under every bin, then select the bin) cost
    # 64x the needed work — ~420 GFLOP and a [64,512,B,N] layout at
    # level 0 of a 16-frame chunk, ~25 ms of the traced extraction. Here:
    # one [N,64]@[64,512] one-hot lookup of each keypoint's OWN index
    # row (exact in f32: indices < 1849 << 2^24), then row/col one-hot
    # contractions against the [43,43] patch — ~0.4 GFLOP.
    oh_bins = (bins[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (n, ANGLE_BINS), 1)).astype(jnp.float32)
    idx = jnp.dot(oh_bins, _BIN_IDX.astype(jnp.float32),
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    idx = idx.astype(jnp.int32)                            # [N, 512]
    hi = idx // PATCH_S                                    # patch row
    lo = idx - hi * PATCH_S                                # patch col
    rr = jax.lax.broadcasted_iota(jnp.int32, (n, 2 * N_BITS, PATCH_S), 2)
    # bf16 single-pass (see ops/patches.py): one-hot selectors are exact
    # and the data is intensity-scale; each sum has exactly one non-zero
    # term, so the result matches the all-bins form bit for bit
    oh_hi = (rr == hi[:, :, None]).astype(jnp.float32)     # [N, 512, 43]
    tmp = jnp.einsum("nsr,nrc->nsc", oh_hi, patches,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.DEFAULT)
    oh_lo = (rr == lo[:, :, None]).astype(jnp.float32)
    Vn = jnp.sum(tmp * oh_lo, axis=-1)                     # [N, 512]

    bits = (Vn[:, :N_BITS] < Vn[:, N_BITS:]).astype(jnp.float32)  # [N, 256]
    lanes = bits.reshape(n, 8, 32)
    # 0/1 lanes x power-of-two weights: exact in bf16 (f32 accumulate)
    lo = jnp.dot(lanes[:, :, :16], _PACK_LO,
                 preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.DEFAULT)
    hi = jnp.dot(lanes[:, :, 16:], _PACK_HI,
                 preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.DEFAULT)
    desc = (lo.astype(jnp.uint32)
            | (hi.astype(jnp.uint32) << jnp.uint32(16)))
    return jnp.where(valid[:, None], desc, jnp.zeros_like(desc))


@jax.jit
def orb_descriptors(img_blur, xy, angle, valid):
    """Standalone convenience: extract patches then compute descriptors.

    Args:
      img_blur: [H, W] blurred level image (reference blurs with 7x7
                sigma=2 first, src/ORBextractor.cc:1086-1092).
      xy: [N, 2] keypoint (x, y) in level coords.
      angle: [N] orientation radians; valid: [N] bool.
    Returns: desc [N, 8] uint32.
    """
    from . import patches as patches_mod
    p = patches_mod.extract_patches(img_blur, xy, PATCH_HALF)
    return orb_descriptors_from_patches(p, angle, valid)
