"""Stereo correspondence + RGB-D depth association kernels.

TPU-native replacement for Frame::ComputeStereoMatches (reference
src/Frame.cc:466-641) and Frame::ComputeStereoFromRGBD
(src/Frame.cc:643-664). The reference walks a per-row candidate table and
refines each match with a scalar SAD loop; here the whole frame is one
masked [L, R] Hamming tile (coarse stage) followed by a batched
strip-correlation SAD with parabola sub-pixel interpolation (fine stage)
— no data-dependent loops, fixed shapes throughout.

Deviation from the reference: the SAD refinement correlates 11x11 windows
on the LEVEL-0 images for every keypoint instead of on each keypoint's
octave image (src/Frame.cc:540-589 scales coordinates into the octave).
Level-0 windows measure disparity at full resolution — finer, not
coarser, for high-octave keypoints — and keep the batch a single static
shape.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import hamming
from . import indexing
from . import patches as patches_mod

TH_ORB = 75.0        # (TH_HIGH + TH_LOW) / 2 (src/Frame.cc:478)
SAD_HALF = 5         # 11x11 SAD window (w=5, src/Frame.cc:542)
SAD_SLIDE = 5        # +-5 px horizontal search (L=5, src/Frame.cc:552)


@partial(jax.jit, static_argnames=("scale",))
def _coarse_match(featsL, featsR, bf, min_z, scale: float):
    """Masked-tile Hamming matching (the candidate search of
    src/Frame.cc:466-539). Returns (best right index [L], coarse ok [L])."""
    d = hamming.hamming_matrix(featsL.desc, featsR.desc)  # [L, R] f32

    yL = featsL.xy_raw[:, 1][:, None]
    yR = featsR.xy_raw[:, 1][None, :]
    # row compatibility: |yL - yR| <= 2 * scale^octaveR (src/Frame.cc:497)
    r_band = 2.0 * jnp.power(jnp.float32(scale),
                             featsR.level.astype(jnp.float32))[None, :]
    row_ok = jnp.abs(yL - yR) <= r_band

    # octave band: levelR in [levelL - 1, levelL + 1] (src/Frame.cc:519)
    lvl_ok = jnp.abs(featsL.level[:, None] - featsR.level[None, :]) <= 1

    # disparity range (minD=0, maxD=bf/minZ; src/Frame.cc:484-485)
    disp = featsL.xy_raw[:, 0][:, None] - featsR.xy_raw[:, 0][None, :]
    max_d = bf / jnp.maximum(min_z, 1e-6)
    disp_ok = (disp >= -1.0) & (disp <= max_d)

    cand = (row_ok & lvl_ok & disp_ok
            & featsL.valid[:, None] & featsR.valid[None, :])
    d_masked = jnp.where(cand, d, jnp.inf)
    best = jnp.argmin(d_masked, axis=1)                   # [L]
    best_d = jnp.min(d_masked, axis=1)
    ok = (best_d <= TH_ORB) & featsL.valid
    return best, ok


@jax.jit
def _sad_refine(imgL, imgR, xyL, uR0, ok):
    """Batched sub-pixel refinement (src/Frame.cc:540-589): correlate the
    11x11 left window against 11 horizontal placements in the right image,
    parabola-fit the minimum. Returns (u_right [L], sad [L], ok [L])."""
    n = xyL.shape[0]
    H2 = SAD_HALF + SAD_SLIDE

    pL = patches_mod.extract_patches(imgL, xyL, SAD_HALF)        # [N,11,11]
    pL = pL - pL[:, SAD_HALF, SAD_HALF][:, None, None]           # center-sub
    xyR = jnp.stack([uR0, xyL[:, 1]], axis=1)
    strip = patches_mod.extract_patches(imgR, xyR, H2)           # [N,21,21]
    strip = strip[:, SAD_SLIDE:SAD_SLIDE + 2 * SAD_HALF + 1, :]  # [N,11,21]

    sads = []
    for s in range(2 * SAD_SLIDE + 1):
        win = strip[:, :, s:s + 2 * SAD_HALF + 1]                # [N,11,11]
        win = win - win[:, SAD_HALF, SAD_HALF][:, None, None]
        sads.append(jnp.sum(jnp.abs(win - pL), axis=(1, 2)))
    sad = jnp.stack(sads, axis=1)                                # [N,11]

    best = jnp.argmin(sad, axis=1)                               # [N]
    interior = (best > 0) & (best < 2 * SAD_SLIDE)
    b = jnp.clip(best, 1, 2 * SAD_SLIDE - 1)
    idx = jnp.arange(n)
    d0, d1, d2 = sad[idx, b - 1], sad[idx, b], sad[idx, b + 1]
    denom = d0 + d2 - 2.0 * d1
    delta = jnp.where(jnp.abs(denom) > 1e-6,
                      (d0 - d2) / (2.0 * jnp.maximum(denom, 1e-6)), 0.0)
    sub_ok = (jnp.abs(delta) <= 1.0) & (denom > 0)   # parabola minimum
    u_right = uR0 + (b.astype(jnp.float32) - SAD_SLIDE) + delta
    return u_right, d1, ok & interior & sub_ok


@partial(jax.jit, static_argnames=("scale",))
def match_stereo(featsL, featsR, imgL, imgR, bf, min_z,
                 scale: float = 1.2):
    """Associate left features with right-image columns.

    Args:
      featsL / featsR: FrameFeatures from the rectified left/right images.
      imgL / imgR: [H, W] f32 level-0 images (SAD refinement).
      bf: stereo baseline times fx (reference mbf).
      min_z: closest admissible depth (reference uses the baseline mb,
        src/Frame.cc:485).

    Returns (u_right [L] f32 with -1 where unmatched, depth [L] f32 with
    -1 where unmatched), matching mvuRight/mvDepth semantics
    (include/Frame.h:139-143).
    """
    best, ok = _coarse_match(featsL, featsR, bf, min_z, scale)
    uR0 = indexing.mm_gather(featsR.xy_raw, best)[:, 0]
    u_right, sad, ok = _sad_refine(imgL, imgR, featsL.xy_raw, uR0, ok)

    disp = featsL.xy_raw[:, 0] - u_right
    max_d = bf / jnp.maximum(min_z, 1e-6)
    # clamp near-zero disparity like the reference (src/Frame.cc:596-599)
    tiny = (disp <= 0.0) & (disp >= -1.0)
    disp = jnp.where(tiny, 0.01, disp)
    u_right = jnp.where(tiny, featsL.xy_raw[:, 0] - 0.01, u_right)
    ok = ok & (disp > 0.0) & (disp < max_d)

    # median-SAD outlier cut: drop matches with SAD > 1.5 * 1.4 * median
    # (src/Frame.cc:608-627)
    big = jnp.float32(3.4e38)
    sad_sorted = jnp.sort(jnp.where(ok, sad, big))
    n_ok = jnp.sum(ok.astype(jnp.int32))
    med = sad_sorted[jnp.clip((n_ok - 1) // 2, 0, sad.shape[0] - 1)]
    ok = ok & (sad <= 1.5 * 1.4 * med)

    u_right = jnp.where(ok, u_right, -1.0)
    depth = jnp.where(ok, bf / jnp.maximum(disp, 1e-6), -1.0)
    return u_right, depth


@jax.jit
def stereo_from_depth(feats, depth_img, bf, depth_factor=1.0):
    """RGB-D association (Frame::ComputeStereoFromRGBD,
    src/Frame.cc:643-664): sample the depth map at each raw keypoint and
    synthesize the virtual right coordinate u_r = u_undist - bf / d.

    depth_img: [H, W] f32 raw depth; depth_factor divides raw values into
    meters (reference mDepthMapFactor, src/Tracking.cc:146-151).
    Returns (u_right [N], depth [N]) with -1 where depth is missing.
    """
    # 1x1 "patches" = a gather executed as one-hot einsums (ops/patches.py)
    d = patches_mod.extract_patches(depth_img, feats.xy_raw, 0)[:, 0, 0]
    d = d * (1.0 / depth_factor)
    ok = (d > 0) & feats.valid
    u_right = jnp.where(ok, feats.xy[:, 0] - bf / jnp.maximum(d, 1e-6), -1.0)
    return u_right, jnp.where(ok, d, -1.0)
