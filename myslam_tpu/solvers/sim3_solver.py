"""Batched Horn closed-form Sim3 RANSAC for loop closing.

TPU-native replacement for Sim3Solver (reference src/Sim3Solver.cc): the
relative similarity between two keyframes' matched 3D point sets is solved
closed-form on 3-point minimal sets (Horn 1987 quaternion method +
optional scale, src/Sim3Solver.cc:226-338), all hypotheses at once, scored
by mutual reprojection into both cameras (src/Sim3Solver.cc:340-365).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom.projection import Camera


class Sim3Result(NamedTuple):
    ok: jnp.ndarray
    R12: jnp.ndarray       # [3, 3] rotation of frame-2 coords into frame-1
    t12: jnp.ndarray       # [3]
    s12: jnp.ndarray       # scalar scale
    inliers: jnp.ndarray   # [N] bool
    n_inliers: jnp.ndarray


def horn_sim3(p1, p2, fix_scale: bool = False):
    """Closed-form similarity aligning p2 -> p1 for [..., M, 3] point sets.

    Horn's quaternion method: max eigenvector of the symmetric 4x4 N matrix
    built from the cross-covariance (the reference builds the same N and
    power-iterates via cv::eigen, src/Sim3Solver.cc:250-296). eigh is exact
    and batched here.

    Returns (R [...,3,3], t [...,3], s [...]).
    """
    c1 = jnp.mean(p1, axis=-2, keepdims=True)
    c2 = jnp.mean(p2, axis=-2, keepdims=True)
    q1 = p1 - c1
    q2 = p2 - c2
    M = jnp.einsum("...mi,...mj->...ij", q2, q1)  # cross-covariance 2->1
    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    N = jnp.stack([
        jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
        jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
        jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
        jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
    ], axis=-2)
    _, vecs = jnp.linalg.eigh(N)
    q = vecs[..., :, -1]  # max eigenvalue eigenvector, (w, x, y, z)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)
    q2r = jnp.einsum("...ij,...mj->...mi", R, q2)
    if fix_scale:
        s = jnp.ones(p1.shape[:-2], p1.dtype)
    else:
        # s = sum(q1 . R q2) / sum(|q2|^2) (the reference's dot/norm ratio,
        # src/Sim3Solver.cc:310-321)
        num = jnp.sum(q1 * q2r, axis=(-1, -2))
        den = jnp.maximum(jnp.sum(q2 * q2, axis=(-1, -2)), 1e-12)
        s = num / den
    t = c1[..., 0, :] - s[..., None] * jnp.einsum(
        "...ij,...j->...i", R, c2[..., 0, :])
    return R, t, s


def _project(cam: Camera, p):
    z = jnp.maximum(p[..., 2], 1e-9)
    return jnp.stack([
        cam.fx * p[..., 0] / z + cam.cx,
        cam.fy * p[..., 1] / z + cam.cy,
    ], axis=-1)


@partial(jax.jit, static_argnames=("n_hyp", "fix_scale"))
def solve_sim3(cam1: Camera, cam2: Camera, p1_cam, p2_cam, uv1, uv2,
               max_err1, max_err2, valid, key, n_hyp: int = 128,
               fix_scale: bool = False, min_inliers: int = 20) -> Sim3Result:
    """RANSAC Sim3 between two keyframes' matched camera-frame points.

    Args:
      p1_cam/p2_cam: [N, 3] matched point positions in each camera frame
        (the reference transforms map points into camera coords first,
        src/Sim3Solver.cc:66-100).
      uv1/uv2: [N, 2] observed pixels in each frame.
      max_err1/max_err2: [N] squared-pixel gates (9.210 * sigma2 of the
        octave, src/Sim3Solver.cc:106-115).
      fix_scale: True for stereo/RGB-D (s = 1).
    """
    logits = jnp.where(valid, 0.0, -jnp.inf)
    idx = jax.random.categorical(key, logits[None, :], shape=(n_hyp, 3))
    R, t, s = horn_sim3(p1_cam[idx], p2_cam[idx], fix_scale)  # [S,...]

    def score(Rh, th, sh):
        # project p2 into camera 1 via Sim3, p1 into camera 2 via inverse
        p2_in1 = sh * jnp.einsum("ij,nj->ni", Rh, p2_cam) + th[None]
        p1_in2 = (1.0 / jnp.maximum(sh, 1e-12)) * jnp.einsum(
            "ji,nj->ni", Rh, p1_cam - th[None])
        e1 = jnp.sum((_project(cam1, p2_in1) - uv1) ** 2, axis=-1)
        e2 = jnp.sum((_project(cam2, p1_in2) - uv2) ** 2, axis=-1)
        inl = valid & (e1 < max_err1) & (e2 < max_err2)
        return jnp.sum(inl), inl

    n_inl, inls = jax.vmap(score)(R, t, s)
    best = jnp.argmax(n_inl)
    n_best = n_inl[best]

    # Re-fit on all inliers of the best hypothesis (consensus refit).
    w = inls[best].astype(p1_cam.dtype)
    n_eff = jnp.maximum(jnp.sum(w), 3.0)
    c1 = jnp.sum(p1_cam * w[:, None], axis=0) / n_eff
    c2 = jnp.sum(p2_cam * w[:, None], axis=0) / n_eff
    # weighted Horn: zero out non-inliers around the weighted centroids
    q1 = (p1_cam - c1[None]) * w[:, None]
    q2 = (p2_cam - c2[None]) * w[:, None]
    Rr, tr, sr = horn_sim3(q1[None], q2[None], fix_scale)
    Rr, sr = Rr[0], sr[0]
    tr = c1 - sr * (Rr @ c2)

    ok = n_best >= min_inliers
    R_out = jnp.where(ok, Rr, R[best])
    return Sim3Result(ok=ok, R12=R_out, t12=jnp.where(ok, tr, t[best]),
                      s12=jnp.where(ok, sr, s[best]),
                      inliers=inls[best], n_inliers=n_best)
