"""ORB feature extraction pipeline — the per-frame compute hot spot.

TPU-native replacement for ORBextractor::operator()
(reference src/ORBextractor.cc:1045-1107):
  pyramid -> dense FAST score + 3x3 NMS -> spatially-uniform top-N per level
  -> intensity-centroid orientation -> 7x7 blur -> steered binary descriptors
  -> concatenated fixed-capacity FrameFeatures (coords scaled to level 0,
     reference src/ORBextractor.cc:1099-1105).

Everything is one jitted program with static shapes per (H, W, config);
level loops are unrolled at trace time.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import descriptors, fast, image, orientation, selection
from .frame import FrameFeatures

EDGE_MARGIN = 16  # reference keeps keypoints EDGE_THRESHOLD-3 = 16 px off the
                  # border (src/ORBextractor.cc:779-789)


def level_budgets(n_features: int, n_levels: int, scale: float):
    """Geometric per-level feature budget (reference ctor,
    src/ORBextractor.cc:443-457): n_l ~ n * (1-1/s) / (1-(1/s)^L) * (1/s)^l,
    remainder added to the coarsest level."""
    inv = 1.0 / scale
    first = n_features * (1 - inv) / (1 - inv**n_levels)
    budgets = []
    acc = 0
    for l in range(n_levels - 1):
        b = int(round(first * inv**l))
        budgets.append(b)
        acc += b
    budgets.append(max(n_features - acc, 0))
    return tuple(budgets)


class ORBExtractor:
    """Config-bound extractor; call with a [H, W] float32 grayscale image.

    Matches the reference config surface (Examples/Monocular/slam_cfg/
    config.yaml:28-42): nFeatures, scaleFactor, nLevels, iniThFAST,
    minThFAST.
    """

    def __init__(self, height: int, width: int, n_features: int = 2000,
                 n_levels: int = 8, scale: float = 1.2,
                 ini_th_fast: float = 20.0, min_th_fast: float = 7.0,
                 capacity: int | None = None):
        self.height, self.width = height, width
        self.n_features = n_features
        self.n_levels = n_levels
        self.scale = scale
        self.ini_th = float(ini_th_fast)
        self.min_th = float(min_th_fast)
        self.shapes = image.pyramid_shapes(height, width, n_levels, scale)
        self.budgets = level_budgets(n_features, n_levels, scale)
        total = sum(self.budgets)
        # Pad capacity to a lane-friendly multiple of 128.
        self.capacity = capacity or -(-total // 128) * 128
        self.level_scales = tuple(scale**l for l in range(n_levels))
        self._extract = jax.jit(self._build())

    def _build(self):
        budgets = self.budgets
        n_levels = self.n_levels
        scale = self.scale
        min_th = self.min_th
        ini_th = self.ini_th
        capacity = self.capacity
        level_scales = self.level_scales

        def extract(img):
            from ..ops import patches as patches_mod

            pyr = image.build_pyramid(img, n_levels, scale)
            xs, ys_, lv, ang, resp, desc, val = [], [], [], [], [], [], []
            ph = descriptors.PATCH_HALF
            ic_lo = ph - orientation.HALF_PATCH
            ic_hi = ph + orientation.HALF_PATCH + 1
            for l in range(n_levels):
                lvl = pyr[l]
                score = fast.nms_3x3(fast.fast_score(lvl, border=EDGE_MARGIN))
                score = jnp.where(score > min_th, score, 0.0)
                xy, r, v = selection.select_uniform(
                    score, budgets[l], high_th=ini_th)
                # one 43x43 patch per keypoint from the raw level image
                # (IC angle uses its 31x31 center) and one from the blurred
                # image (descriptor sampling) — both gather-free einsums
                raw_p = patches_mod.extract_patches(lvl, xy, ph)
                a = orientation.ic_angles_from_patches(
                    raw_p[:, ic_lo:ic_hi, ic_lo:ic_hi])
                a = jnp.where(v, a, 0.0)
                blur = image.gaussian_blur(lvl)
                blur_p = patches_mod.extract_patches(blur, xy, ph)
                d = descriptors.orb_descriptors_from_patches(blur_p, a, v)
                s = jnp.float32(level_scales[l])
                xs.append(xy[:, 0] * s)
                ys_.append(xy[:, 1] * s)
                lv.append(jnp.full((budgets[l],), l, dtype=jnp.int32))
                ang.append(a)
                resp.append(r)
                desc.append(d)
                val.append(v)

            def cat(parts, pad_val=0):
                out = jnp.concatenate(parts, axis=0)
                pad = capacity - out.shape[0]
                if pad > 0:
                    pad_shape = (pad,) + out.shape[1:]
                    out = jnp.concatenate(
                        [out, jnp.full(pad_shape, pad_val, dtype=out.dtype)],
                        axis=0)
                return out

            xy_raw = jnp.stack([cat(xs), cat(ys_)], axis=-1)
            return FrameFeatures(
                xy=xy_raw,  # caller undistorts via features.frame.undistort
                xy_raw=xy_raw,
                level=cat(lv),
                angle=cat(ang),
                response=cat(resp),
                desc=cat(desc),
                valid=cat(val, pad_val=False),
            )

        return extract

    def __call__(self, img) -> FrameFeatures:
        return self._extract(img)
