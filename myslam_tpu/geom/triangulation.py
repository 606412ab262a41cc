"""Batched two-view triangulation.

Replaces the reference's per-point cv::SVD triangulation
(Initializer::Triangulate, src/Initializer.cc:734-747, and the inline SVD in
LocalMapping::CreateNewMapPoints, src/LocalMapping.cc:299-310) with one
batched linear solve over all candidate matches at once.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import se3
from .projection import Camera, project


def projection_matrix(cam: Camera, Tcw):
    """K @ [R | t] -> [..., 3, 4]."""
    return jnp.einsum("ij,...jk->...ik", cam.K, Tcw)


def triangulate_dlt(P1, P2, x1, x2):
    """Linear (DLT) triangulation.

    Args:
      P1, P2: [3, 4] (or broadcastable [..., 3, 4]) projection matrices.
      x1, x2: [..., 2] pixel observations in the two views.
    Returns:
      xyz [..., 3] world points (homogeneous solution dehomogenized; points at
      infinity come back with huge magnitude — callers gate on depth/parallax
      as the reference does, src/LocalMapping.cc:311-376).
    """
    # Rows of A: x*p3 - p1, y*p3 - p2 for each view.
    def rows(P, x):
        p1, p2, p3 = P[..., 0, :], P[..., 1, :], P[..., 2, :]
        return (
            x[..., 0, None] * p3 - p1,
            x[..., 1, None] * p3 - p2,
        )

    r1, r2 = rows(P1, x1)
    r3, r4 = rows(P2, x2)
    A = jnp.stack([r1, r2, r3, r4], axis=-2)  # [..., 4, 4]
    # Null vector of A = eigenvector of A^T A with smallest eigenvalue.
    # 4x4 symmetric eigendecomposition is batched and cheap on TPU.
    AtA = jnp.swapaxes(A, -1, -2) @ A
    _, vecs = jnp.linalg.eigh(AtA)
    h = vecs[..., :, 0]  # smallest eigenvalue first for eigh
    w = h[..., 3]
    safe_w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return h[..., :3] / safe_w[..., None]


def parallax_cos(Tcw1, Tcw2, xyz):
    """Cosine of the ray parallax angle at each triangulated point [..., 3]
    between the two camera centers (reference src/LocalMapping.cc:286-297)."""
    c1 = se3.camera_center(Tcw1)
    c2 = se3.camera_center(Tcw2)
    r1 = xyz - c1
    r2 = xyz - c2
    n1 = jnp.linalg.norm(r1, axis=-1)
    n2 = jnp.linalg.norm(r2, axis=-1)
    return jnp.sum(r1 * r2, axis=-1) / jnp.maximum(n1 * n2, 1e-12)


def reprojection_error_sq(cam: Camera, Tcw, xyz, uv_obs):
    """Squared pixel reprojection error [...] with negative-depth flag."""
    uv, z = project(cam, se3.transform(Tcw, xyz))
    err = jnp.sum((uv - uv_obs) ** 2, axis=-1)
    return err, z
