"""Monocular two-view bootstrap: batched H/F RANSAC + reconstruction.

TPU-native replacement for Initializer (reference src/Initializer.cc):
instead of two CPU threads iterating 200 RANSAC rounds each
(src/Initializer.cc:104-109), ALL hypotheses for BOTH models are sampled,
fitted (normalized DLT via batched eigh) and chi2-scored in one program —
a [S, N] evaluation tile per model. Model selection and reconstruction
follow the reference's rules:

- symmetric-transfer chi2 scoring with th 5.991 (H) / 3.841+5.991 (F)
  (src/Initializer.cc:305-468)
- RH = SH / (SH + SF) > 0.40 chooses the homography
  (src/Initializer.cc:112-117)
- F path: E = K^T F K, 4-way (R|t) cheirality disambiguation with
  parallax / depth / reprojection gates (ReconstructF + CheckRT,
  src/Initializer.cc:470-570, 798-907)
- H path: Faugeras-style 8-motion decomposition (ReconstructH,
  src/Initializer.cc:572-732), same CheckRT selection.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom import epipolar, se3, triangulation
from ..geom.projection import Camera

CHI2_F = 3.841       # 1-dof inlier gate for epipolar distance
CHI2_H = 5.991       # 2-dof gate for transfer error
SCORE_TH = 5.991     # score offset (reference uses thScore for both models)
SIGMA = 1.0
MIN_PARALLAX_DEG = 1.0
MIN_TRIANGULATED = 50


class InitResult(NamedTuple):
    ok: jnp.ndarray          # scalar bool
    used_h: jnp.ndarray      # scalar bool — homography model chosen
    T21: jnp.ndarray         # [3, 4] pose of frame 2 w.r.t. frame 1 (Tc2w)
    points: jnp.ndarray      # [N, 3] triangulated points in frame-1 coords
    tri_ok: jnp.ndarray      # [N] bool
    n_good: jnp.ndarray      # scalar int
    score_h: jnp.ndarray
    score_f: jnp.ndarray


def _sample_minimal_sets(key, valid, n_hyp, set_size):
    """[S, set_size] indices drawn from valid entries (with replacement
    across hypotheses; the reference precomputes 200 8-point sets from the
    match list, src/Initializer.cc:74-101)."""
    logits = jnp.where(valid, 0.0, -jnp.inf)
    return jax.random.categorical(
        key, logits[None, :], shape=(n_hyp, set_size))


def _score_f(F, x1, x2, valid):
    """Symmetric epipolar-transfer score (CheckFundamental,
    src/Initializer.cc:390-468). F is F21 (x2^T F21 x1 = 0, the reference's
    convention); x1/x2 [N,2]; valid [N]. Returns (score [S], inliers [S, N]).

    epipolar_dist_sq(F, a, b) = dist of b to the line F^T a, so:
      x1 to the line of x2:  F^T a with a=x2  -> pass F21 directly
      x2 to the line of x1:  needs F21 a=x1   -> pass F21^T
    """
    Fb = F[:, None]            # [S, 1, 3, 3]
    x1b, x2b = x1[None], x2[None]
    d12 = epipolar.epipolar_dist_sq(Fb, x2b, x1b)
    d21 = epipolar.epipolar_dist_sq(jnp.swapaxes(Fb, -1, -2), x1b, x2b)
    inv_s2 = 1.0 / (SIGMA * SIGMA)
    c1, c2 = d12 * inv_s2, d21 * inv_s2
    in1, in2 = c1 < CHI2_F, c2 < CHI2_F
    sc = jnp.where(in1, SCORE_TH - c1, 0.0) + jnp.where(in2, SCORE_TH - c2, 0.0)
    sc = jnp.where(valid, sc, 0.0)
    return jnp.sum(sc, axis=-1), in1 & in2 & valid


def _transfer_err(H, xa, xb):
    """Squared transfer error |H xa - xb|^2 in pixels."""
    x, y = xa[..., 0], xa[..., 1]
    w = H[..., 2, 0] * x + H[..., 2, 1] * y + H[..., 2, 2]
    w = jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    u = (H[..., 0, 0] * x + H[..., 0, 1] * y + H[..., 0, 2]) / w
    v = (H[..., 1, 0] * x + H[..., 1, 1] * y + H[..., 1, 2]) / w
    return (u - xb[..., 0]) ** 2 + (v - xb[..., 1]) ** 2


def _score_h(H21, x1, x2, valid):
    """Symmetric transfer score (CheckHomography, src/Initializer.cc:305-388).
    H21 [S,3,3]; x1/x2 [N,2]; valid [N]. Returns (score [S], inliers [S, N])."""
    H12 = jnp.linalg.inv(H21)
    inv_s2 = 1.0 / (SIGMA * SIGMA)
    c1 = _transfer_err(H12[:, None], x2[None], x1[None]) * inv_s2
    c2 = _transfer_err(H21[:, None], x1[None], x2[None]) * inv_s2
    in1, in2 = c1 < CHI2_H, c2 < CHI2_H
    sc = jnp.where(in1, SCORE_TH - c1, 0.0) + jnp.where(in2, SCORE_TH - c2, 0.0)
    sc = jnp.where(valid, sc, 0.0)
    return jnp.sum(sc, axis=-1), in1 & in2 & valid


def _check_rt(cam: Camera, R, t, x1, x2, inliers):
    """Cheirality + quality check of one (R, t) motion candidate
    (Initializer::CheckRT, src/Initializer.cc:798-907).

    Returns (n_good, parallax_deg, points [N, 3], good [N])."""
    T1 = se3.identity()
    T2 = se3.make(R, t)
    P1 = triangulation.projection_matrix(cam, T1)
    P2 = triangulation.projection_matrix(cam, T2)
    pts = jax.vmap(lambda a, b: triangulation.triangulate_dlt(P1, P2, a, b))(
        x1, x2)
    finite = jnp.all(jnp.isfinite(pts), axis=-1)

    O2 = se3.camera_center(T2)
    n1 = pts
    n2 = pts - O2[None, :]
    d1 = jnp.linalg.norm(n1, axis=-1)
    d2 = jnp.linalg.norm(n2, axis=-1)
    cos_par = jnp.sum(n1 * n2, axis=-1) / jnp.maximum(d1 * d2, 1e-12)

    z1 = pts[:, 2]
    z2 = (pts @ R.T + t[None, :])[:, 2]
    pos_depth = (z1 > 0) & (z2 > 0)
    # reference only enforces depth when parallax is measurable (<0.99998)
    has_parallax = cos_par < 0.99998

    e1, _ = triangulation.reprojection_error_sq(cam, T1, pts, x1)
    e2, _ = triangulation.reprojection_error_sq(cam, T2, pts, x2)
    th2 = 4.0 * SIGMA * SIGMA
    good = (
        inliers & finite & has_parallax & pos_depth
        & (e1 < th2) & (e2 < th2)
    )
    n_good = jnp.sum(good)
    # parallax of the ~50th best point (reference takes element
    # min(50, size)-1 of the sorted list, src/Initializer.cc:897-903)
    par = jnp.where(good, cos_par, 1.0)
    k = 50
    topk_neg = jax.lax.top_k(-par, k)[0]  # most-parallax (smallest cos) first
    idx = jnp.minimum(n_good, k) - 1
    cos_sel = -topk_neg[jnp.maximum(idx, 0)]
    par_deg = jnp.degrees(jnp.arccos(jnp.clip(cos_sel, -1.0, 1.0)))
    par_deg = jnp.where(n_good > 0, par_deg, 0.0)
    return n_good, par_deg, pts, good


def _reconstruct_from_motions(cam, Rs, ts, x1, x2, inlier_rows, n_inliers):
    """Pick the winning motion among candidates by CheckRT count, with the
    reference's acceptance rules (clear winner, parallax, min count —
    src/Initializer.cc:530-569). inlier_rows is [C, N]: per-candidate inlier
    masks (all-False rows disable padded candidate slots)."""
    n_good, par, pts, good = jax.vmap(
        lambda R, t, inl: _check_rt(cam, R, t, x1, x2, inl))(
            Rs, ts, inlier_rows)
    best = jnp.argmax(n_good)
    max_good = n_good[best]
    n_similar = jnp.sum(n_good > 0.7 * max_good)
    min_good = jnp.maximum(
        jnp.asarray(MIN_TRIANGULATED), (0.9 * n_inliers).astype(jnp.int32))
    ok = (
        (max_good >= min_good)
        & (n_similar == 1)
        & (par[best] > MIN_PARALLAX_DEG)
    )
    T21 = se3.make(Rs[best], ts[best])
    return ok, T21, pts[best], good[best], max_good


def _motions_from_f(cam, F):
    E = cam.K.T @ F @ cam.K
    R1, R2, t = epipolar.decompose_essential(E)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _motions_from_h(cam, H21):
    """Faugeras SVD decomposition of a calibrated homography into 8 candidate
    motions (Initializer::ReconstructH, src/Initializer.cc:572-732; Faugeras
    & Lustman 1988). Degenerate (pure-rotation) cases yield duplicate
    candidates, which CheckRT then scores."""
    A = jnp.linalg.inv(cam.K) @ H21 @ cam.K
    U, w, Vt = jnp.linalg.svd(A)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = w[0], w[1], w[2]

    eps = 1e-8
    den1 = jnp.maximum(d1 * d1 - d3 * d3, eps)
    # d' = d2 case
    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / den1, 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / den1, 0.0))
    x1s = jnp.array([1.0, 1.0, -1.0, -1.0]) * aux1
    x3s = jnp.array([1.0, -1.0, 1.0, -1.0]) * aux3

    # case d' > 0
    sin_t = jnp.sqrt(jnp.maximum(
        (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum(
            (d1 + d3) * d2, eps)
    cos_t = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, eps)
    stheta = jnp.array([1.0, -1.0, -1.0, 1.0]) * sin_t

    def rot_pos(st):
        return jnp.array([
            [cos_t, 0.0, -st],
            [0.0, 1.0, 0.0],
            [st, 0.0, cos_t],
        ])

    Rp_pos = jax.vmap(rot_pos)(stheta)
    tp_pos = jax.vmap(
        lambda x1v, x3v: (d1 - d3) * jnp.array([x1v, 0.0, -x3v]))(x1s, x3s)

    # case d' < 0
    sin_p = jnp.sqrt(jnp.maximum(
        (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum(
            (d1 - d3) * d2, eps)
    cos_p = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, eps)
    sphi = jnp.array([1.0, -1.0, -1.0, 1.0]) * sin_p

    def rot_neg(sp):
        return jnp.array([
            [cos_p, 0.0, sp],
            [0.0, -1.0, 0.0],
            [sp, 0.0, -cos_p],
        ])

    Rn_neg = jax.vmap(rot_neg)(sphi)
    tn_neg = jax.vmap(
        lambda x1v, x3v: (d1 + d3) * jnp.array([x1v, 0.0, x3v]))(x1s, x3s)

    Rp = jnp.concatenate([Rp_pos, Rn_neg])   # [8, 3, 3]
    tp = jnp.concatenate([tp_pos, tn_neg])   # [8, 3]
    R = s * jax.vmap(lambda Rpp: U @ Rpp @ Vt)(Rp)
    t = jax.vmap(lambda tpp: U @ tpp)(tp)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    return R, t


@partial(jax.jit, static_argnames=("n_hyp",))
def initialize_two_view(cam: Camera, x1, x2, valid, key,
                        n_hyp: int = 256) -> InitResult:
    """Full two-view bootstrap on matched (undistorted) pixel coords.

    Args:
      x1, x2: [N, 2] matched keypoint coords (frame 1, frame 2).
      valid:  [N] bool match mask.
      key:    PRNG key (the reference seeds its RANSAC with 0 for
              reproducibility, src/Initializer.cc:80 — pass a fixed key for
              the same effect).
    """
    n1, T1 = epipolar.normalize_points(x1, valid)
    n2, T2 = epipolar.normalize_points(x2, valid)

    kf, kh = jax.random.split(key)
    idx_f = _sample_minimal_sets(kf, valid, n_hyp, 8)
    idx_h = _sample_minimal_sets(kh, valid, n_hyp, 4)

    # --- fundamental hypotheses ---
    Fn = jax.vmap(lambda i: epipolar.fundamental_8pt(n1[i], n2[i]))(idx_f)
    F = jnp.swapaxes(T2, -1, -2)[None] @ Fn @ T1[None]
    f_scores, f_inl = _score_f(F, x1, x2, valid)
    fb = jnp.argmax(f_scores)
    SF, F_best, f_in = f_scores[fb], F[fb], f_inl[fb]

    # --- homography hypotheses ---
    Hn = jax.vmap(lambda i: epipolar.homography_dlt(n1[i], n2[i]))(idx_h)
    H = jnp.linalg.inv(T2)[None] @ Hn @ T1[None]
    h_scores, h_inl = _score_h(H, x1, x2, valid)
    hb = jnp.argmax(h_scores)
    SH, H_best, h_in = h_scores[hb], H[hb], h_inl[hb]

    rh = SH / jnp.maximum(SH + SF, 1e-9)
    use_h = rh > 0.40

    Rs_f, ts_f = _motions_from_f(cam, F_best)
    Rs_h, ts_h = _motions_from_h(cam, H_best)
    # Evaluate an 8-candidate bank either way; F's 4 motions are padded to 8
    # with all-False inlier rows so the padded slots can never win or break
    # the clear-winner uniqueness check.
    Rs = jnp.where(use_h, Rs_h, jnp.concatenate([Rs_f, Rs_f]))
    ts = jnp.where(use_h, ts_h, jnp.concatenate([ts_f, ts_f]))
    inl = jnp.where(use_h, h_in, f_in)
    row_on = jnp.where(
        use_h, jnp.ones((8,), bool),
        jnp.arange(8) < 4)
    inlier_rows = inl[None, :] & row_on[:, None]
    n_inl = jnp.sum(inl)

    ok, T21, pts, good, n_good = _reconstruct_from_motions(
        cam, Rs, ts, x1, x2, inlier_rows, n_inl)
    return InitResult(
        ok=ok, used_h=use_h, T21=T21, points=pts, tri_ok=good,
        n_good=n_good, score_h=SH, score_f=SF)
