"""Sim(3) similarity transforms for loop closing and essential-graph optimization.

TPU-native replacement for g2o's Sim3 type (reference:
Thirdparty/g2o/g2o/types/sim3.h:1-307). A Sim3 S = (s, R, t) acts on points as
x -> s * R x + t. Stored as a pytree tuple (R [..., 3, 3], t [..., 3],
s [...]) so scale stays an explicit array (mono SLAM optimizes it; stereo
fixes it — reference src/Optimizer.cc:789-791).

Tangent layout [..., 7] = (omega, upsilon, sigma) with sigma = log-scale,
matching g2o's VertexSim3Expmap update ordering
(Thirdparty/g2o/g2o/types/types_seven_dof_expmap.h:48-110).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import se3

_EPS = 1e-8


def identity(dtype=jnp.float32):
    return (
        jnp.eye(3, dtype=dtype),
        jnp.zeros((3,), dtype=dtype),
        jnp.ones((), dtype=dtype),
    )


def make(R, t, s):
    return (R, t, s)


def from_se3(T, s=None):
    R, t = se3.rotation(T), se3.translation(T)
    if s is None:
        s = jnp.ones(T.shape[:-2], dtype=T.dtype)
    return (R, t, s)


def to_se3(S):
    """Recover SE3 as [R | t/s] — the reference's convention when writing a
    corrected Sim3 back into a keyframe pose (src/LoopClosing.cc:488-494,
    src/Optimizer.cc:970-980)."""
    R, t, s = S
    return se3.make(R, t / s[..., None])


def compose(Sa, Sb):
    """Sa * Sb: x -> sa Ra (sb Rb x + tb) + ta."""
    Ra, ta, sa = Sa
    Rb, tb, sb = Sb
    R = Ra @ Rb
    t = sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return (R, t, sa * sb)


def inverse(S):
    R, t, s = S
    Rt = jnp.swapaxes(R, -1, -2)
    inv_s = 1.0 / s
    return (Rt, -inv_s[..., None] * jnp.einsum("...ij,...j->...i", Rt, t), inv_s)


def transform(S, pts):
    R, t, s = S
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, pts) + t


def _w_matrix(w, sigma):
    """The Sim(3) 'W' matrix with t = W @ upsilon in the exponential.

    Closed form W = C*I + A*hat(w) + B*hat(w)^2 (Strasdat's thesis, as used by
    g2o's Sim3 ctor — Thirdparty/g2o/g2o/types/sim3.h:40-100), with Taylor-safe
    branches for small rotation angle theta and small log-scale sigma:
        C = (s-1)/sigma
        A = (a*sigma + (1-b)*theta) / (theta * c)
        B = (C - ((b-1)*sigma + a*theta)/c) / theta^2
    where s = e^sigma, a = s*sin(theta), b = s*cos(theta), c = theta^2+sigma^2.
    """
    dtype = w.dtype
    s = jnp.exp(sigma)
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta_sq + _EPS)
    sigma_sq = sigma * sigma
    small_theta = theta_sq < 1e-10
    small_sigma = jnp.abs(sigma) < 1e-5

    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    a = s * sin_t
    b = s * cos_t
    c = theta_sq + sigma_sq

    safe = lambda x, cond: jnp.where(cond, 1.0, x)

    C = jnp.where(small_sigma, 1.0 + sigma * 0.5 + sigma_sq / 6.0,
                  (s - 1.0) / safe(sigma, small_sigma))

    A_gen = (a * sigma + (1.0 - b) * theta) / safe(theta * c, small_theta | small_sigma & small_theta)
    A_small_sigma = (1.0 - cos_t) / safe(theta_sq, small_theta)
    A_small_theta = ((sigma - 1.0) * s + 1.0) / safe(sigma_sq, small_sigma)
    A_both = jnp.full_like(sigma, 0.5)
    A = jnp.where(small_theta & small_sigma, A_both,
                  jnp.where(small_theta, A_small_theta,
                            jnp.where(small_sigma, A_small_sigma, A_gen)))

    B_gen = (C - ((b - 1.0) * sigma + a * theta) / safe(c, small_theta & small_sigma)) \
        / safe(theta_sq, small_theta)
    B_small_sigma = (theta - sin_t) / safe(theta_sq * theta, small_theta)
    B_small_theta = ((0.5 * sigma_sq - sigma + 1.0) * s - 1.0) / safe(sigma_sq * sigma, small_sigma)
    B_both = jnp.full_like(sigma, 1.0 / 6.0)
    B = jnp.where(small_theta & small_sigma, B_both,
                  jnp.where(small_theta, B_small_theta,
                            jnp.where(small_sigma, B_small_sigma, B_gen)))

    W = se3.hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), W.shape)
    return C[..., None, None] * eye + A[..., None, None] * W + B[..., None, None] * W2


def exp(xi):
    """sim(3) tangent [..., 7] (omega, upsilon, sigma) -> Sim3."""
    w, u, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = se3.exp_so3(w)
    s = jnp.exp(sigma)
    Wmat = _w_matrix(w, sigma)
    t = jnp.einsum("...ij,...j->...i", Wmat, u)
    return (R, t, s)


def log(S):
    """Sim3 -> tangent [..., 7]; inverse of exp via solving W u = t."""
    R, t, s = S
    w = se3.log_so3(R)
    sigma = jnp.log(s)
    Wmat = _w_matrix(w, sigma)
    u = jnp.linalg.solve(Wmat, t[..., None])[..., 0]
    return jnp.concatenate([w, u, sigma[..., None]], axis=-1)


def retract(S, xi):
    """Left-multiplicative update exp(xi) * S (g2o VertexSim3Expmap oplus)."""
    return compose(exp(xi), S)


def stack(Ss):
    """Stack a list of Sim3 pytrees along a new leading axis."""
    Rs, ts, ss = zip(*Ss)
    return (jnp.stack(Rs), jnp.stack(ts), jnp.stack(ss))


def index(S, i):
    R, t, s = S
    return (R[i], t[i], s[i])
