"""Shared residual/Jacobian kernels for the reprojection optimizers.

Analytic Jacobians of the monocular projection edge, matching g2o's
EdgeSE3ProjectXYZ / EdgeSE3ProjectXYZOnlyPose linearization (reference:
Thirdparty/g2o/g2o/types/types_six_dof_expmap.h:59-206, .cpp:180-240) but
evaluated for ALL edges at once as one batched array program.

Conventions:
  e = uv_obs - pi(T X)          (2-vector residual, pixels)
  pose tangent xi = (omega, upsilon), left-multiplicative update exp(xi)*T
  chi2 = inv_sigma2 * |e|^2     (isotropic per-octave information, reference
                                  src/Optimizer.cc:300 mvInvLevelSigma2)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geom import se3
from ..geom.projection import Camera


def project_residual(cam: Camera, Tcw, xyz_w, uv_obs):
    """Residual e [..., 2] and camera-frame point p [..., 3]."""
    p = se3.transform(Tcw, xyz_w)
    z = jnp.where(jnp.abs(p[..., 2]) < 1e-9, 1e-9, p[..., 2])
    u = cam.fx * p[..., 0] / z + cam.cx
    v = cam.fy * p[..., 1] / z + cam.cy
    e = uv_obs - jnp.stack([u, v], axis=-1)
    return e, p


def dproj_dp(cam: Camera, p):
    """Jacobian of pi at camera-frame point p: [..., 2, 3]."""
    x, y = p[..., 0], p[..., 1]
    z = jnp.where(jnp.abs(p[..., 2]) < 1e-9, 1e-9, p[..., 2])
    inv_z = 1.0 / z
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(x)
    row_u = jnp.stack([cam.fx * inv_z, zeros, -cam.fx * x * inv_z2], axis=-1)
    row_v = jnp.stack([zeros, cam.fy * inv_z, -cam.fy * y * inv_z2], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)


def pose_point_jacobians(cam: Camera, Tcw, xyz_w, uv_obs, *, want_point=True):
    """Batched residual + Jacobians.

    Returns:
      e  [..., 2]   residual
      Jp [..., 2, 6] d e / d pose-tangent (omega, upsilon)
      Jl [..., 2, 3] d e / d world point (or None)
      z  [...]       camera-frame depth (for cheirality gating)
    """
    e, p = project_residual(cam, Tcw, xyz_w, uv_obs)
    A = dproj_dp(cam, p)  # [..., 2, 3]
    # dp/d omega = -hat(p), dp/d upsilon = I  (left-mult update)
    # => de/d omega = A @ hat(p); de/d upsilon = -A
    Ahat = A @ se3.hat(p)
    Jp = jnp.concatenate([Ahat, -A], axis=-1)  # [..., 2, 6]
    Jl = None
    if want_point:
        R = se3.rotation(Tcw)
        Jl = -(A @ R)  # dp/dX = R
    return e, Jp, Jl, p[..., 2]


def stereo_point_jacobians(cam: Camera, Tcw, xyz_w, uvr_obs, bf, *,
                           want_point=True):
    """Batched stereo projection edge (g2o EdgeStereoSE3ProjectXYZ /
    ...OnlyPose, Thirdparty/g2o/g2o/types/types_six_dof_expmap.h:111-206):
    residual is (u, v, u_r) with the virtual right column
    u_r = u - bf / z. For monocular observations the caller masks the
    third residual row (zero weight), which reduces the edge exactly to
    the 2D one.

    Args:
      uvr_obs: [..., 3] observed (u, v, u_right).
      bf: stereo baseline times fx.
    Returns (e [..., 3], Jp [..., 3, 6], Jl [..., 3, 3] or None, z [...]).
    """
    p = se3.transform(Tcw, xyz_w)
    z = jnp.where(jnp.abs(p[..., 2]) < 1e-9, 1e-9, p[..., 2])
    u = cam.fx * p[..., 0] / z + cam.cx
    v = cam.fy * p[..., 1] / z + cam.cy
    ur = u - bf / z
    e = uvr_obs - jnp.stack([u, v, ur], axis=-1)

    A2 = dproj_dp(cam, p)                                # [..., 2, 3]
    # d u_r / dp = d u / dp + bf/z^2 * e_z
    inv_z2 = 1.0 / (z * z)
    row_ur = A2[..., 0, :] + jnp.stack(
        [jnp.zeros_like(z), jnp.zeros_like(z), bf * inv_z2], axis=-1)
    A = jnp.concatenate([A2, row_ur[..., None, :]], axis=-2)  # [..., 3, 3]

    Ahat = A @ se3.hat(p)
    Jp = jnp.concatenate([Ahat, -A], axis=-1)            # [..., 3, 6]
    Jl = None
    if want_point:
        R = se3.rotation(Tcw)
        Jl = -(A @ R)
    return e, Jp, Jl, p[..., 2]


def huber_weight(chi2, delta_sq):
    """Robust reweighting factor rho'(chi2) for the Huber kernel with
    threshold delta^2 (g2o RobustKernelHuber,
    Thirdparty/g2o/g2o/core/robust_kernel_impl.cpp:40-60): w = 1 inside,
    delta/sqrt(chi2) outside."""
    safe = jnp.maximum(chi2, 1e-12)
    return jnp.where(chi2 <= delta_sq, 1.0, jnp.sqrt(delta_sq / safe))
