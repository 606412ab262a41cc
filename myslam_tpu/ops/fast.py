"""FAST-9/16 corner detection as a dense, fully-vectorized score map.

TPU-native replacement for the cv::FAST calls in
ORBextractor::ComputeKeyPointsOctTree (reference src/ORBextractor.cc:811-818).
Instead of per-cell sparse detection + quadtree, we compute a dense corner
SCORE for every pixel in one shot (16 shifted views of the image, VPU
elementwise math), 3x3 non-max suppress, and let ops/selection.py do the
spatially-uniform top-N. The score is the classic "maximum threshold for
which the pixel is still a corner" margin (same semantics as OpenCV's FAST
score used by the reference for quadtree retention,
src/ORBextractor.cc:741-760).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3 — the standard FAST-16 ring, clockwise.
CIRCLE_OFFSETS = np.array(
    [
        (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3),
        (0, -3), (-1, -3), (-2, -2), (-3, -1),
        (-3, 0), (-3, 1), (-2, 2), (-1, 3),
    ],
    dtype=np.int32,
)  # (dy, dx)

ARC_LEN = 9  # FAST-9: contiguous arc of 9 of the 16 ring pixels


def _ring_diffs(img):
    """[16, H, W] differences ring_pixel - center, computed via padded slices
    (static shifts compile to cheap XLA slices, no gathers)."""
    H, W = img.shape
    pad = jnp.pad(img, 3, mode="edge")
    views = [
        jax.lax.dynamic_slice(pad, (3 + dy, 3 + dx), (H, W))
        for (dy, dx) in CIRCLE_OFFSETS
    ]
    ring = jnp.stack(views, axis=0)
    return ring - img[None]


@partial(jax.jit, static_argnames=("border",))
def fast_score(img, border: int = 16):
    """Dense FAST-9 corner score [H, W], zero outside the `border` margin.

    score(p) = max over the 32 candidate arcs (16 bright + 16 dark) of the
    arc's weakest margin: for a bright arc min_k(ring_k - center), for a dark
    arc min_k(center - ring_k). A pixel is a FAST corner at threshold t iff
    score > t — so one dense score map serves both the reference's high (20)
    and low (7) thresholds (src/ORBextractor.cc:811-818) at once.
    """
    d = _ring_diffs(img)  # [16, H, W]
    # Wrap-around for circular arcs.
    d_ext = jnp.concatenate([d, d[: ARC_LEN - 1]], axis=0)  # [24, H, W]

    def arc_min(x):
        # Min over sliding windows of length ARC_LEN along axis 0 via
        # log-step pairwise mins: window 9 = min(win8(x), shift8(win1)).
        w = x
        # build window-of-8 with 3 halvings
        for s in (1, 2, 4):
            w = jnp.minimum(w[: w.shape[0] - s], w[s:])
        # w now = min over windows of 8; extend to 9
        w = jnp.minimum(w[:-1], x[8 : 8 + w.shape[0] - 1])
        return w  # [16, H, W]

    bright = arc_min(d_ext)        # min over arc of (ring - center)
    dark = arc_min(-d_ext)         # min over arc of (center - ring)
    score = jnp.maximum(jnp.max(bright, axis=0), jnp.max(dark, axis=0))
    score = jnp.maximum(score, 0.0)

    if border > 0:
        H, W = img.shape
        ys = jnp.arange(H)
        xs = jnp.arange(W)
        mask = (
            (ys[:, None] >= border) & (ys[:, None] < H - border)
            & (xs[None, :] >= border) & (xs[None, :] < W - border)
        )
        score = jnp.where(mask, score, 0.0)
    return score


@jax.jit
def nms_3x3(score):
    """Keep only local maxima in 3x3 neighborhoods (cv::FAST
    nonmaxSuppression=true behavior, used at src/ORBextractor.cc:811)."""
    neg_inf = jnp.finfo(score.dtype).min
    pad = jnp.pad(score, 1, mode="constant", constant_values=neg_inf)
    H, W = score.shape
    m = score
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            m = jnp.maximum(m, jax.lax.dynamic_slice(pad, (1 + dy, 1 + dx), (H, W)))
    # Strict > against neighbors breaks plateau ties toward... nothing;
    # use >= with a tiny index-based tiebreak-free rule: keep if >= all
    # neighbors AND > 0.
    return jnp.where((score >= m) & (score > 0.0), score, 0.0)
