"""SE(3) Lie-group operations on [..., 3, 4] rigid transforms.

TPU-native replacement for the reference's g2o SE3Quat type
(reference: Thirdparty/g2o/g2o/types/se3quat.h:1-306). Poses are stored as
row-major [R | t] matrices of shape [..., 3, 4] (world->camera `Tcw` by
convention elsewhere in the codebase); tangent vectors are [..., 6] laid out
as (omega, upsilon) = (rotation, translation), matching the g2o convention
so that optimizer update rules transfer directly.

Every function broadcasts over arbitrary leading batch dimensions — batched
pose-graph and bundle-adjustment code calls these directly without vmap.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def identity(dtype=jnp.float32):
    return jnp.concatenate(
        [jnp.eye(3, dtype=dtype), jnp.zeros((3, 1), dtype=dtype)], axis=-1
    )


def rotation(T):
    """[..., 3, 3] rotation block."""
    return T[..., :3, :3]


def translation(T):
    """[..., 3] translation."""
    return T[..., :3, 3]


def make(R, t):
    """Assemble [..., 3, 4] from rotation [..., 3, 3] and translation [..., 3]."""
    return jnp.concatenate([R, t[..., None]], axis=-1)


def hat(w):
    """Skew-symmetric matrix [..., 3, 3] of vectors [..., 3]."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def _sinc_coeffs(theta_sq):
    """Taylor-safe (A, B, C) coefficients for Rodrigues / V-matrix.

    A = sin(t)/t,  B = (1-cos(t))/t^2,  C = (1 - A)/t^2.

    Uses the double-where pattern (guard the denominator BEFORE dividing) so
    reverse-mode autodiff stays NaN-free at theta = 0 — the untaken branch is
    still differentiated and 0-cotangent * inf-derivative would poison grads.
    """
    small = theta_sq < 1e-8
    theta_sq_safe = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(theta_sq_safe)
    A = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta_sq / 24.0,
                  (1.0 - jnp.cos(theta)) / theta_sq_safe)
    C = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0,
                  (1.0 - A) / theta_sq_safe)
    return A, B, C


def exp_so3(w):
    """Rodrigues: so(3) vector [..., 3] -> rotation matrix [..., 3, 3]."""
    theta_sq = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_coeffs(theta_sq)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * W2


def log_so3(R):
    """Rotation matrix [..., 3, 3] -> so(3) vector [..., 3].

    Quaternion-based (valid for all angles in [0, pi]) and autodiff-safe at
    the identity via the double-where pattern: pose-graph optimization
    differentiates through log on edges whose residual is exactly zero
    (e.g. spanning-tree edges measured from current estimates,
    reference src/Optimizer.cc:867-902), so the gradient must be finite there.
    """
    q = to_quaternion(R)
    # Enforce qw >= 0 so theta in [0, pi].
    q = q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    qv, qw = q[..., :3], q[..., 3]
    n_sq = jnp.sum(qv * qv, axis=-1)
    small = n_sq < 1e-10
    n_sq_safe = jnp.where(small, 1.0, n_sq)  # keeps untaken branch NaN-free
    n = jnp.sqrt(n_sq_safe)
    # w = f * qv with f = 2*atan2(n, qw)/n ; series: 2/qw * (1 - n^2/(3 qw^2))
    f_large = 2.0 * jnp.arctan2(n, qw) / n
    f_small = 2.0 / qw * (1.0 - n_sq / (3.0 * qw * qw))
    f = jnp.where(small, f_small, f_large)
    return f[..., None] * qv


def _left_jacobian(w):
    """SO(3) left Jacobian V used in the se(3) exponential translation part."""
    theta_sq = jnp.sum(w * w, axis=-1)
    _, B, C = _sinc_coeffs(theta_sq)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + B[..., None, None] * W + C[..., None, None] * W2


def exp(xi):
    """se(3) tangent [..., 6] (omega, upsilon) -> transform [..., 3, 4]."""
    w, u = xi[..., :3], xi[..., 3:]
    R = exp_so3(w)
    V = _left_jacobian(w)
    t = jnp.einsum("...ij,...j->...i", V, u)
    return make(R, t)


def log(T):
    """Transform [..., 3, 4] -> se(3) tangent [..., 6] (omega, upsilon)."""
    R, t = rotation(T), translation(T)
    w = log_so3(R)
    V = _left_jacobian(w)
    u = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([w, u], axis=-1)


def compose(Ta, Tb):
    """Ta * Tb for [..., 3, 4] transforms."""
    Ra, ta = rotation(Ta), translation(Ta)
    Rb, tb = rotation(Tb), translation(Tb)
    R = Ra @ Rb
    t = jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return make(R, t)


def inverse(T):
    R, t = rotation(T), translation(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return make(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def transform(T, pts):
    """Apply [..., 3, 4] to points [..., 3] (broadcasting)."""
    R, t = rotation(T), translation(T)
    return jnp.einsum("...ij,...j->...i", R, pts) + t


def retract(T, xi):
    """Left-multiplicative update exp(xi) * T — the g2o VertexSE3Expmap oplus
    (reference: Thirdparty/g2o/g2o/types/types_six_dof_expmap.h:59-106 uses
    T <- exp(update) * T)."""
    return compose(exp(xi), T)


def camera_center(Tcw):
    """Camera center in world coordinates: -R^T t (reference KeyFrame::GetCameraCenter,
    src/KeyFrame.cc:86-121)."""
    R, t = rotation(Tcw), translation(Tcw)
    return -jnp.einsum("...ji,...j->...i", R, t)


def to_quaternion(R):
    """Rotation matrix [..., 3, 3] -> unit quaternion [..., 4] (x, y, z, w),
    TUM trajectory-file convention. Shepperd's method, branch-free."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically best by largest pivot.
    qw_w = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) * 0.5
    q_w = jnp.stack(
        [(m21 - m12), (m02 - m20), (m10 - m01), 4.0 * qw_w * qw_w], axis=-1
    ) / (4.0 * qw_w[..., None])

    qx_x = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 0.5
    q_x = jnp.stack(
        [4.0 * qx_x * qx_x, (m01 + m10), (m02 + m20), (m21 - m12)], axis=-1
    ) / (4.0 * qx_x[..., None])

    qy_y = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) * 0.5
    q_y = jnp.stack(
        [(m01 + m10), 4.0 * qy_y * qy_y, (m12 + m21), (m02 - m20)], axis=-1
    ) / (4.0 * qy_y[..., None])

    qz_z = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) * 0.5
    q_z = jnp.stack(
        [(m02 + m20), (m12 + m21), 4.0 * qz_z * qz_z, (m10 - m01)], axis=-1
    ) / (4.0 * qz_z[..., None])

    cand = jnp.stack([q_w, q_x, q_y, q_z], axis=-2)  # [..., 4, 4]
    pivots = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)[
        ..., 0, :
    ]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def from_quaternion(q):
    """Unit quaternion [..., 4] (x, y, z, w) -> rotation matrix [..., 3, 3]."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def orthonormalize(R):
    """Project [..., 3, 3] back onto SO(3) via SVD (drift control after many
    incremental updates)."""
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.concatenate(
        [jnp.ones_like(R[..., :2, 0]), det[..., None]], axis=-1
    )
    return (U * D[..., None, :]) @ Vt


def renormalize(T):
    """Snap the rotation block of [..., 3, 4] back onto SO(3) via a
    quaternion round-trip (cheaper than SVD; exact enough for drift
    control).

    This is NOT optional hygiene: incremental f32 updates leave a small
    non-orthogonal component in R, and the tracking motion model
    (velocity = Tcw * last^-1, prediction = velocity * Tcw) DOUBLES that
    defect every frame — exponential growth (x2.4/frame measured) that no
    exp-retraction optimizer can remove, since left-multiplying by
    rotations preserves the shear. The reference is immune only because
    g2o re-builds R from a unit quaternion at every vertex update
    (Thirdparty/g2o/g2o/types/se3quat.h: SE3Quat stores _r as
    Eigen::Quaterniond and normalizes it in the constructor and oplus).
    Call this wherever a pose crosses a per-frame feedback loop.
    """
    R = from_quaternion(to_quaternion(rotation(T)))
    return make(R, translation(T))
