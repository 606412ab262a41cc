"""Pose-only optimization: the per-frame motion refinement.

TPU-native replacement for Optimizer::PoseOptimization (reference
src/Optimizer.cc:239-451): a single SE3 vertex with unary monocular
projection edges, 4 rounds x 10 LM iterations, chi-square inlier/outlier
relabeling at 5.991 between rounds, Huber kernel dropped from round 2 on.

The whole thing is one jitted function over fixed-size arrays — runs 2-3x
per tracked frame, so it is on the tracking critical path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geom import se3
from ..geom.projection import Camera
from .residuals import huber_weight, pose_point_jacobians

CHI2_MONO = 5.991  # 95% quantile of chi^2_2 (reference src/Optimizer.cc:337)


def _edge_chi2(cam, Tcw, xyz_w, uv, inv_sigma2):
    e, p = None, None
    e, Jp, _, z = pose_point_jacobians(cam, Tcw, xyz_w, uv, want_point=False)
    chi2 = inv_sigma2 * jnp.sum(e * e, axis=-1)
    return chi2, e, Jp, z


def _lm_rounds(cam, Tcw, xyz_w, uv, inv_sigma2, active, n_iters, use_huber):
    """n_iters LM iterations on the active edge set. Returns refined pose."""
    delta_sq = CHI2_MONO

    def total_chi2(T):
        e, _, _, _ = pose_point_jacobians(cam, T, xyz_w, uv, want_point=False)
        chi2 = inv_sigma2 * jnp.sum(e * e, axis=-1)
        if use_huber:
            # Huber cost: chi2 inside, 2*delta*sqrt(chi2)-delta^2 outside.
            rho = jnp.where(
                chi2 <= delta_sq,
                chi2,
                2.0 * jnp.sqrt(delta_sq * jnp.maximum(chi2, 1e-12)) - delta_sq,
            )
        else:
            rho = chi2
        return jnp.sum(jnp.where(active, rho, 0.0))

    def step(carry, _):
        T, lam = carry
        e, Jp, _, _ = pose_point_jacobians(cam, T, xyz_w, uv, want_point=False)
        chi2 = inv_sigma2 * jnp.sum(e * e, axis=-1)
        w = inv_sigma2
        if use_huber:
            w = w * huber_weight(chi2, delta_sq)
        w = jnp.where(active, w, 0.0)
        H = jnp.einsum("nij,nik,n->jk", Jp, Jp, w)
        b = -jnp.einsum("nij,ni,n->j", Jp, e, w)
        # Marquardt damping on the diagonal.
        H_damped = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6)
        delta = jnp.linalg.solve(H_damped, b)
        T_new = se3.retract(T, delta)
        improved = total_chi2(T_new) < total_chi2(T)
        T_next = jax.tree.map(lambda a, b: jnp.where(improved, a, b), T_new, T)
        lam_next = jnp.where(improved, lam * 0.5, lam * 4.0)
        lam_next = jnp.clip(lam_next, 1e-10, 1e6)
        return (T_next, lam_next), None

    (T_out, _), _ = jax.lax.scan(step, (Tcw, jnp.float32(1e-4)), None,
                                 length=n_iters)
    return T_out


@partial(jax.jit, static_argnames=("rounds", "iters_per_round"))
def optimize_pose(cam: Camera, Tcw0, xyz_w, uv, inv_sigma2, valid,
                  rounds: int = 4, iters_per_round: int = 10,
                  active0=None):
    """Refine a camera pose against fixed 3D points.

    Args:
      Tcw0: [3, 4] initial world->camera pose.
      xyz_w: [N, 3] matched map-point positions (fixed).
      uv: [N, 2] observed (undistorted) keypoint positions.
      inv_sigma2: [N] per-observation information (1/sigma^2 of the octave).
      valid: [N] bool — real matches (padding is False). Relabeling each
        round is against this full set, so matches outside the initial
        active set can be RECLAIMED (the reference's level-0/1 edge moves).
      active0: [N] bool — optional initial active subset (e.g. RANSAC
        inliers); defaults to valid.
      rounds/iters_per_round: 4 x 10 like the reference
        (src/Optimizer.cc:367-379).

    Returns:
      (Tcw [3,4], inlier [N] bool, n_inliers i32)

    Round r re-labels edges by chi2 <= 5.991 computed at the current pose and
    optimizes only currently-inlier edges; the Huber kernel is active for
    rounds 0-1 and dropped after (reference src/Optimizer.cc:412-424 removes
    the kernel at it==2). Outliers can be reclaimed by later rounds, like the
    reference's level-0/level-1 edge moves.
    """
    inlier = valid if active0 is None else (valid & active0)
    Tcw = Tcw0
    for r in range(rounds):
        use_huber = r < 2
        Tcw = _lm_rounds(cam, Tcw, xyz_w, uv, inv_sigma2, inlier,
                         iters_per_round, use_huber)
        chi2, _, _, z = _edge_chi2(cam, Tcw, xyz_w, uv, inv_sigma2)
        inlier = valid & (chi2 <= CHI2_MONO) & (z > 0)
    return Tcw, inlier, jnp.sum(inlier.astype(jnp.int32))
