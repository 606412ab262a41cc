"""Data association as masked [Q, C] Hamming distance tiles.

TPU-native replacement for ORBmatcher (reference src/ORBmatcher.cc, 1665
lines of per-keypoint loops over bucket grids / BoW nodes). Every variant
here is the same dense program: one XOR+popcount distance tile over all
query x candidate descriptors, a candidate mask encoding the variant's
geometric gate (search window, epipolar band, frustum + scale band), a
masked best-2 reduction with the ratio test, a one-to-one resolution pass,
and a rotation-histogram consistency filter. No data-dependent shapes
anywhere: matches are (index, mask) arrays of static size.

Thresholds mirror the reference: TH_HIGH=100, TH_LOW=50, HISTO_LENGTH=30
(src/ORBmatcher.cc:37-39), ratio tests per call site.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geom import epipolar, projection, se3
from ..geom.projection import Camera
from ..ops import hamming, indexing

TH_HIGH = 100
TH_LOW = 50
HISTO_LENGTH = 30
BIG = hamming.MAX_DIST + 1


def masked_best2(dist, cand_mask):
    """Best/second-best distance + best index along axis -1, with invalid
    candidates pushed beyond any real distance.

    Two min/argmin reductions instead of top_k: XLA lowers top_k to a
    FULL SORT of the [Q, C] tile on TPU (dominant cost in the per-frame
    matchers); masked min-reductions are linear passes."""
    d = jnp.where(cand_mask, dist, BIG)
    idx = jnp.argmin(d, axis=-1)
    b1 = jnp.min(d, axis=-1)
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, d.ndim - 1)
    d2 = jnp.where(cols == idx[..., None], BIG, d)
    b2 = jnp.min(d2, axis=-1)
    return b1, b2, idx


def one_to_one(idx, dist, ok, n_cand):
    """Resolve duplicate candidate assignments: keep only the lowest-distance
    query per candidate (ties broken by query index). The reference gets this
    by overwriting vnMatches21 / erasing previous matches
    (src/ORBmatcher.cc:467-480). Scatter-free: a [Q, Q] same-candidate
    comparison — a query survives iff no other accepted query with the same
    candidate has a strictly smaller (dist, q) key."""
    q = idx.shape[0]
    key = dist.astype(jnp.float32) * q + jnp.arange(q, dtype=jnp.float32)
    key = jnp.where(ok, key, jnp.float32(3e18))
    same = idx[:, None] == idx[None, :]
    better = same & (key[None, :] < key[:, None])
    beaten = jnp.any(better & ok[None, :], axis=1)
    return ok & ~beaten


def rotation_consistency(angle_q, angle_c_matched, ok):
    """Keep only matches whose query-candidate angle difference falls in the
    3 most populated of 30 orientation bins (ORBmatcher::ComputeThreeMaxima,
    src/ORBmatcher.cc:1601-1642, applied wherever mbCheckOrientation)."""
    two_pi = 2.0 * jnp.pi
    rot = jnp.mod(angle_q - angle_c_matched, two_pi)
    b = jnp.clip((rot * (HISTO_LENGTH / two_pi)).astype(jnp.int32), 0,
                 HISTO_LENGTH - 1)
    # scatter-free histogram + gather-free bin lookup via one-hot compares
    oh = (b[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (b.shape[0], HISTO_LENGTH), 1))        # [N, 30]
    hist = jnp.sum(oh & ok[:, None], axis=0).astype(jnp.int32)
    top3_v, top3_i = jax.lax.top_k(hist, 3)
    # Reference drops bins 2/3 when much smaller than bin 1 (<0.1x).
    keep_bin = (
        (hist > 0)
        & (hist[:, None] >= 0.1 * top3_v[0]).any(axis=1)
        & (jnp.arange(HISTO_LENGTH)[:, None] == top3_i[None, :]).any(axis=1)
    )
    keep = jnp.any(oh & keep_bin[None, :], axis=1)
    return ok & keep


def predict_scale(dist, max_dist, scale: float = 1.2, n_levels: int = 8):
    """Pyramid level a point should appear at given its distance and the
    scale-invariance band (MapPoint::PredictScale, src/MapPoint.cc:385-417)."""
    ratio = jnp.maximum(max_dist / jnp.maximum(dist, 1e-9), 1e-9)
    lvl = jnp.ceil(jnp.log(ratio) / jnp.log(scale)).astype(jnp.int32)
    return jnp.clip(lvl, 0, n_levels - 1)


@partial(jax.jit, static_argnames=("window", "check_rotation"))
def search_for_initialization(f1, f2, window: int = 100, ratio: float = 0.9,
                              check_rotation: bool = True):
    """Level-0 windowed matching for two-view bootstrap
    (ORBmatcher::SearchForInitialization, src/ORBmatcher.cc:405-520).

    Args: f1, f2 FrameFeatures. Returns (idx2 [N1], ok [N1]).
    """
    d = hamming.hamming_matrix(f1.desc, f2.desc)
    dx = f1.xy[:, None, 0] - f2.xy[None, :, 0]
    dy = f1.xy[:, None, 1] - f2.xy[None, :, 1]
    cand = (
        (dx * dx + dy * dy <= float(window) ** 2)
        & (f1.level[:, None] == 0) & (f2.level[None, :] == 0)
        & f1.valid[:, None] & f2.valid[None, :]
    )
    b1, b2, idx = masked_best2(d, cand)
    ok = (b1 <= TH_LOW) & (b1.astype(jnp.float32) < ratio * b2.astype(jnp.float32))
    ok = ok & f1.valid
    ok = one_to_one(idx, b1, ok, f2.capacity)
    if check_rotation:
        ok = rotation_consistency(
            f1.angle, indexing.mm_gather(f2.angle[:, None], idx)[:, 0], ok)
    return idx, ok


@partial(jax.jit, static_argnames=("scale", "n_levels", "check_rotation"))
def search_by_projection_frame(cam: Camera, Tcw, feats, prev_xyz, prev_desc,
                               prev_level, prev_angle, prev_valid, th: float,
                               scale: float = 1.2, n_levels: int = 8,
                               check_rotation: bool = True,
                               th_desc: int = TH_HIGH):
    """Motion-model matching: project last frame's 3D points into the current
    frame with the predicted pose, search a window of th * scale^level around
    each projection at levels [l-1, l+1]
    (ORBmatcher::SearchByProjection(Frame&, Frame&, th),
    src/ORBmatcher.cc:1328-1470 — forward/backward level window collapsed to
    the +/-1 band, which is what the mono path exercises).

    Returns (point_idx_per_feature view): idx [P] best feature per point,
    ok [P]. Caller maps point->feature associations.
    """
    p_cam = se3.transform(Tcw, prev_xyz)
    uv, _ = projection.project(cam, p_cam)
    depth_ok = p_cam[:, 2] > 0.0
    xmin, xmax, ymin, ymax = projection.image_bounds(cam)
    in_img = (
        (uv[:, 0] >= xmin) & (uv[:, 0] < xmax)
        & (uv[:, 1] >= ymin) & (uv[:, 1] < ymax)
    )
    p_ok = prev_valid & depth_ok & in_img

    d = hamming.hamming_matrix(prev_desc, feats.desc)  # [P, F]
    radius = th * jnp.power(jnp.float32(scale), prev_level.astype(jnp.float32))
    dx = uv[:, None, 0] - feats.xy[None, :, 0]
    dy = uv[:, None, 1] - feats.xy[None, :, 1]
    lvl_ok = jnp.abs(feats.level[None, :] - prev_level[:, None]) <= 1
    cand = (
        (dx * dx + dy * dy <= (radius[:, None]) ** 2)
        & lvl_ok & feats.valid[None, :] & p_ok[:, None]
    )
    b1, _, idx = masked_best2(d, cand)
    ok = (b1 <= th_desc) & p_ok
    ok = one_to_one(idx, b1, ok, feats.capacity)
    if check_rotation:
        ok = rotation_consistency(
            prev_angle,
            indexing.mm_gather(feats.angle[:, None], idx)[:, 0], ok)
    return idx, ok


@partial(jax.jit, static_argnames=("scale", "n_levels"))
def search_by_projection_map(cam: Camera, Tcw, feats, pt_xyz, pt_desc,
                             pt_normal, pt_min_dist, pt_max_dist, pt_valid,
                             th: float, ratio: float = 0.8,
                             scale: float = 1.2, n_levels: int = 8):
    """Local-map point search: frustum + view-angle + scale-band gating, then
    windowed descriptor match with ratio test
    (Frame::isInFrustum src/Frame.cc:269-325 +
    ORBmatcher::SearchByProjection(Frame&, vector<MapPoint*>&, th),
    src/ORBmatcher.cc:45-129; base radius 4.0 (2.5 if view cos>0.998) scaled
    by the predicted level, src/ORBmatcher.cc:72-82,131-137).

    Returns (idx [P] feature index, ok [P], pred_level [P]).
    """
    bounds = projection.image_bounds(cam)
    vis, uv, dist, view_cos = projection.in_frustum(
        cam, Tcw, pt_xyz, pt_normal, pt_min_dist, pt_max_dist, bounds)
    p_ok = pt_valid & vis
    lvl = predict_scale(dist, pt_max_dist, scale, n_levels)

    base_r = jnp.where(view_cos > 0.998, 2.5, 4.0)
    radius = th * base_r * jnp.power(jnp.float32(scale), lvl.astype(jnp.float32))

    d = hamming.hamming_matrix(pt_desc, feats.desc)
    dx = uv[:, None, 0] - feats.xy[None, :, 0]
    dy = uv[:, None, 1] - feats.xy[None, :, 1]
    lvl_ok = (feats.level[None, :] >= lvl[:, None] - 1) & (
        feats.level[None, :] <= lvl[:, None] + 1)
    cand = (
        (dx * dx + dy * dy <= radius[:, None] ** 2)
        & lvl_ok & feats.valid[None, :] & p_ok[:, None]
    )
    b1, b2, idx = masked_best2(d, cand)
    # Reference applies the ratio test only when best/second-best share a
    # level (src/ORBmatcher.cc:113-116); always applying it is strictly more
    # conservative and avoids a second gather.
    ok = (
        (b1 <= TH_HIGH)
        & (b1.astype(jnp.float32) <= ratio * b2.astype(jnp.float32))
        & p_ok
    )
    ok = one_to_one(idx, b1, ok, feats.capacity)
    return idx, ok, lvl


@partial(jax.jit, static_argnames=("scale", "n_levels", "check_rotation"))
def search_for_triangulation(cam: Camera, f1, Tcw1, f2, Tcw2,
                             unmatched1, unmatched2,
                             scale: float = 1.2, n_levels: int = 8,
                             check_rotation: bool = True):
    """Epipolar-constrained matching between two keyframes for new-point
    triangulation (ORBmatcher::SearchForTriangulation,
    src/ORBmatcher.cc:657-823): candidates must lie near the epipolar line of
    the query in the other image (chi2 < 3.84 sigma2, CheckDistEpipolarLine
    src/ORBmatcher.cc:140-157) and away from the epipole.

    unmatched1/2: bool masks of features not yet associated to a map point.
    Returns (idx2 [N1], ok [N1]).
    """
    F12 = epipolar.fundamental_from_poses(cam, Tcw1, Tcw2)
    # Epipole of camera 1 in image 2.
    C1 = se3.camera_center(Tcw1)
    e_cam = se3.transform(Tcw2, C1[None])[0]
    e_uv, _ = projection.project(cam, e_cam[None])
    e_uv = e_uv[0]

    d = hamming.hamming_matrix(f1.desc, f2.desc)
    # pairwise distances: expand to [N1, 1, 2] x [1, N2, 2] -> [N1, N2]
    # (epipolar_dist_sq broadcasts; flat inputs would give the diagonal only)
    ep_d2 = epipolar.epipolar_dist_sq(
        F12, f1.xy[:, None, :], f2.xy[None, :, :])
    sigma2_2 = jnp.power(jnp.float32(scale * scale),
                         f2.level.astype(jnp.float32))
    ep_ok = ep_d2 < 3.84 * sigma2_2[None, :]
    # epipole exclusion: candidate too close to the epipole. Reference gate
    # is dist^2 < 100 * scaleFactor^level (src/ORBmatcher.cc:687-690) — a
    # 10 px radius at level 0, NOT a 100 px radius.
    de = f2.xy - e_uv[None, :]
    far_from_epipole = (de[:, 0] ** 2 + de[:, 1] ** 2) >= (
        100.0 * jnp.power(jnp.float32(scale), f2.level.astype(jnp.float32)))

    cand = (
        ep_ok & far_from_epipole[None, :]
        & f1.valid[:, None] & f2.valid[None, :]
        & unmatched1[:, None] & unmatched2[None, :]
    )
    b1, _, idx = masked_best2(d, cand)
    ok = (b1 <= TH_LOW) & f1.valid & unmatched1
    ok = one_to_one(idx, b1, ok, f2.capacity)
    if check_rotation:
        ok = rotation_consistency(
            f1.angle, indexing.mm_gather(f2.angle[:, None], idx)[:, 0], ok)
    return idx, ok


@partial(jax.jit, static_argnames=("scale", "n_levels"))
def search_by_projection_sim3(cam: Camera, Scw_R, Scw_t, Scw_s, feats,
                              pt_xyz, pt_desc, pt_normal, pt_min_dist,
                              pt_max_dist, pt_valid, th: float = 10.0,
                              scale: float = 1.2, n_levels: int = 8,
                              th_desc: int = TH_LOW,
                              view_cos_th: float = 0.5):
    """Loop-closing variant: project map points through a Sim3 world->camera
    transform (ORBmatcher::SearchByProjection(KeyFrame*, cv::Mat Scw, ...),
    src/ORBmatcher.cc:290-403, which normalizes Scw to the SE3 (R, t/s) at
    :303-307 so all distance checks stay in world units).
    Returns (idx [P], ok [P])."""
    t_n = Scw_t / jnp.maximum(Scw_s, 1e-9)
    p_cam = pt_xyz @ Scw_R.T + t_n[None, :]
    depth = p_cam[:, 2]
    uv, _ = projection.project(cam, p_cam)
    xmin, xmax, ymin, ymax = projection.image_bounds(cam)
    in_img = (
        (uv[:, 0] >= xmin) & (uv[:, 0] < xmax)
        & (uv[:, 1] >= ymin) & (uv[:, 1] < ymax)
    )
    Ow = -(Scw_R.T @ t_n)
    po = pt_xyz - Ow[None, :]
    dist = jnp.linalg.norm(po, axis=-1)
    d_ok = (dist >= pt_min_dist) & (dist <= pt_max_dist)
    vcos = jnp.sum(po * pt_normal, axis=-1) / (
        jnp.maximum(dist, 1e-9)
        * jnp.maximum(jnp.linalg.norm(pt_normal, axis=-1), 1e-9))
    # view_cos_th < -1 disables the angle gate (SearchBySim3 has none,
    # src/ORBmatcher.cc:1102-1326)
    p_ok = pt_valid & (depth > 0) & in_img & d_ok & (vcos > view_cos_th)

    lvl = predict_scale(dist, pt_max_dist, scale, n_levels)
    radius = th * jnp.power(jnp.float32(scale), lvl.astype(jnp.float32))

    d = hamming.hamming_matrix(pt_desc, feats.desc)
    dx = uv[:, None, 0] - feats.xy[None, :, 0]
    dy = uv[:, None, 1] - feats.xy[None, :, 1]
    lvl_ok = (feats.level[None, :] >= lvl[:, None] - 1) & (
        feats.level[None, :] <= lvl[:, None] + 1)
    cand = (
        (dx * dx + dy * dy <= radius[:, None] ** 2)
        & lvl_ok & feats.valid[None, :] & p_ok[:, None]
    )
    b1, _, idx = masked_best2(d, cand)
    ok = (b1 <= th_desc) & p_ok
    ok = one_to_one(idx, b1, ok, feats.capacity)
    return idx, ok
