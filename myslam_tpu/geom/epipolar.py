"""Epipolar geometry: fundamental/essential/homography utilities.

Batched replacements for the reference's per-pair math: ComputeF12
(src/LocalMapping.cc:538-555), CheckDistEpipolarLine
(src/ORBmatcher.cc:140-157), normalized 8-point / 4-point DLT model fits
(src/Initializer.cc:226-303) and essential-matrix decomposition
(src/Initializer.cc:909-930).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import se3
from .projection import Camera


def fundamental_from_poses(cam: Camera, Tcw1, Tcw2):
    """F12 such that x1^T F12 x2 = 0 for pixel correspondences, from the two
    world->camera poses (reference LocalMapping::ComputeF12,
    src/LocalMapping.cc:538-555)."""
    R1, t1 = se3.rotation(Tcw1), se3.translation(Tcw1)
    R2, t2 = se3.rotation(Tcw2), se3.translation(Tcw2)
    R12 = R1 @ jnp.swapaxes(R2, -1, -2)
    t12 = t1 - jnp.einsum("...ij,...j->...i", R12, t2)
    E = se3.hat(t12) @ R12
    K = cam.K
    K_inv = jnp.linalg.inv(K)
    return jnp.swapaxes(K_inv, -1, -2) @ E @ K_inv


def epipolar_dist_sq(F12, x1, x2):
    """Squared distance of x2 [..., 2] to the epipolar line of x1 [..., 2]
    (reference ORBmatcher::CheckDistEpipolarLine, src/ORBmatcher.cc:140-157)."""
    a = x1[..., 0] * F12[..., 0, 0] + x1[..., 1] * F12[..., 1, 0] + F12[..., 2, 0]
    b = x1[..., 0] * F12[..., 0, 1] + x1[..., 1] * F12[..., 1, 1] + F12[..., 2, 1]
    c = x1[..., 0] * F12[..., 0, 2] + x1[..., 1] * F12[..., 1, 2] + F12[..., 2, 2]
    num = a * x2[..., 0] + b * x2[..., 1] + c
    den = a * a + b * b
    return num * num / jnp.maximum(den, 1e-12)


def normalize_points(pts, valid=None):
    """Isotropic point normalization (reference Initializer::Normalize,
    src/Initializer.cc:749-779 uses mean absolute deviation scaling).

    Returns (normalized [N, 2], T [3, 3]) with x_norm = T @ x_homog.
    """
    if valid is None:
        valid = jnp.ones(pts.shape[:-1], dtype=bool)
    w = valid.astype(pts.dtype)
    n = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
    mean = jnp.sum(pts * w[..., None], axis=-2, keepdims=True) / n[..., None]
    dev = jnp.abs(pts - mean) * w[..., None]
    mean_dev = jnp.sum(dev, axis=-2) / n  # [..., 2]
    s = 1.0 / jnp.maximum(mean_dev, 1e-9)
    normed = (pts - mean) * s[..., None, :]
    sx, sy = s[..., 0], s[..., 1]
    mx, my = mean[..., 0, 0], mean[..., 0, 1]
    zeros = jnp.zeros_like(sx)
    ones = jnp.ones_like(sx)
    T = jnp.stack(
        [
            jnp.stack([sx, zeros, -mx * sx], axis=-1),
            jnp.stack([zeros, sy, -my * sy], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return normed, T


def _smallest_right_singular(A):
    """Right singular vector of smallest singular value via eigh(A^T A)."""
    AtA = jnp.swapaxes(A, -1, -2) @ A
    _, vecs = jnp.linalg.eigh(AtA)
    return vecs[..., :, 0]


def fundamental_8pt(x1, x2, w=None):
    """(Weighted) 8-point fundamental from [..., N>=8, 2] correspondences in
    normalized coords; rank-2 enforcement via SVD
    (reference Initializer::ComputeF21, src/Initializer.cc:264-303)."""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    ones = jnp.ones_like(u1)
    # Constraint rows: x2^T F x1 = 0 with row = [u2u1, u2v1, u2, v2u1, v2v1, v2, u1, v1, 1]
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], axis=-1
    )
    if w is not None:
        A = A * w[..., None]
    f = _smallest_right_singular(A)
    F = f.reshape(f.shape[:-1] + (3, 3))
    # Enforce rank 2.
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[..., 2].set(0.0)
    return U @ (S[..., None] * Vt)


def homography_dlt(x1, x2, w=None):
    """(Weighted) DLT homography H21 (x2 ~ H x1) from [..., N>=4, 2]
    correspondences (reference Initializer::ComputeH21,
    src/Initializer.cc:226-262)."""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    zeros = jnp.zeros_like(u1)
    ones = jnp.ones_like(u1)
    rows_a = jnp.stack(
        [zeros, zeros, zeros, -u1, -v1, -ones, v2 * u1, v2 * v1, v2], axis=-1
    )
    rows_b = jnp.stack(
        [u1, v1, ones, zeros, zeros, zeros, -u2 * u1, -u2 * v1, -u2], axis=-1
    )
    A = jnp.concatenate([rows_a, rows_b], axis=-2)
    if w is not None:
        ww = jnp.concatenate([w, w], axis=-1)
        A = A * ww[..., None]
    h = _smallest_right_singular(A)
    return h.reshape(h.shape[:-1] + (3, 3))


def decompose_essential(E):
    """E -> (R1, R2, t) candidate motions (reference
    Initializer::DecomposeE, src/Initializer.cc:909-930)."""
    U, _, Vt = jnp.linalg.svd(E)
    # Ensure proper rotations.
    det_u = jnp.linalg.det(U)
    det_v = jnp.linalg.det(Vt)
    U = U * jnp.where(det_u < 0, -1.0, 1.0)[..., None, None]
    Vt = Vt * jnp.where(det_v < 0, -1.0, 1.0)[..., None, None]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                  dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    return R1, R2, t
