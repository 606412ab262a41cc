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
    """List of 16 [H, W] differences ring_pixel - center, via padded slices
    (static shifts compile to cheap XLA slices, no gathers).

    A Python LIST, deliberately not a stacked [16, H, W] array: stacking
    introduces a materialized axis that stops XLA fusing the downstream
    min/max tree once the op is vmapped over a frame chunk — measured 6.5x
    per-frame slowdown at batch 16 from [B,24,H,W] f32 intermediates
    (~470 MB each) round-tripping HBM. As a list every op stays an
    elementwise [H, W] (or [B, H, W]) fusion candidate."""
    H, W = img.shape
    pad = jnp.pad(img, 3, mode="edge")
    return [
        jax.lax.slice(pad, (3 + dy, 3 + dx), (3 + dy + H, 3 + dx + W)) - img
        for (dy, dx) in CIRCLE_OFFSETS
    ]


def _arc_mins(d):
    """All 16 cyclic window-of-9 minima of a list of 16 arrays, via a
    shared log-step tree (16x4 pairwise mins, all fusable elementwise)."""
    n = len(d)
    m2 = [jnp.minimum(d[k], d[(k + 1) % n]) for k in range(n)]
    m4 = [jnp.minimum(m2[k], m2[(k + 2) % n]) for k in range(n)]
    m8 = [jnp.minimum(m4[k], m4[(k + 4) % n]) for k in range(n)]
    return [jnp.minimum(m8[k], d[(k + 8) % n]) for k in range(n)]


@partial(jax.jit, static_argnames=("border",))
def fast_score(img, border: int = 16):
    """Dense FAST-9 corner score [H, W], zero outside the `border` margin.

    score(p) = max over the 32 candidate arcs (16 bright + 16 dark) of the
    arc's weakest margin: for a bright arc min_k(ring_k - center), for a dark
    arc min_k(center - ring_k). A pixel is a FAST corner at threshold t iff
    score > t — so one dense score map serves both the reference's high (20)
    and low (7) thresholds (src/ORBextractor.cc:811-818) at once.
    """
    d = _ring_diffs(img)  # list of 16 [H, W]
    bright = _arc_mins(d)                       # min over arc of (ring - c)
    dark = _arc_mins([-x for x in d])           # min over arc of (c - ring)

    def tree_max(xs):
        while len(xs) > 1:
            xs = [jnp.maximum(a, b) for a, b in zip(xs[::2], xs[1::2])] + (
                [xs[-1]] if len(xs) % 2 else [])
        return xs[0]

    score = tree_max(bright + dark)
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
