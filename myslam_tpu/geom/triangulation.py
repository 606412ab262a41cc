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
    # Inhomogeneous DLT: fix the homogeneous coordinate w=1 and solve the
    # 4x3 least-squares B X = -c in closed form (adjugate 3x3 inverse).
    # Unlike the homogeneous eigen-null-vector (upstream uses cv::SVD,
    # src/LocalMapping.cc:302-310), this is pure elementwise math — batched
    # small eigendecompositions serialize on TPU. Points near infinity get
    # a near-singular normal matrix and come back huge; callers gate on
    # depth/parallax exactly as the reference does.
    B = A[..., :3]                                   # [..., 4, 3]
    c = A[..., 3]                                    # [..., 4]
    BtB = jnp.swapaxes(B, -1, -2) @ B                # [..., 3, 3]
    Btc = jnp.einsum("...ij,...i->...j", B, c)
    a, b_, cc = BtB[..., 0, 0], BtB[..., 0, 1], BtB[..., 0, 2]
    d, e, f = BtB[..., 1, 0], BtB[..., 1, 1], BtB[..., 1, 2]
    g, h_, i = BtB[..., 2, 0], BtB[..., 2, 1], BtB[..., 2, 2]
    A00 = e * i - f * h_
    A01 = -(d * i - f * g)
    A02 = d * h_ - e * g
    det = a * A00 + b_ * A01 + cc * A02
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    adj = jnp.stack([
        jnp.stack([A00, -(b_ * i - cc * h_), (b_ * f - cc * e)], axis=-1),
        jnp.stack([A01, (a * i - cc * g), -(a * f - cc * d)], axis=-1),
        jnp.stack([A02, -(a * h_ - b_ * g), (a * e - b_ * d)], axis=-1),
    ], axis=-2)
    return -inv_det[..., None] * jnp.einsum("...ij,...j->...i", adj, Btc)


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
