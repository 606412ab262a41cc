"""Pose-only optimization: the per-frame motion refinement.

TPU-native replacement for Optimizer::PoseOptimization (reference
src/Optimizer.cc:239-451): a single SE3 vertex with unary projection
edges — monocular (2D, chi2 gate 5.991) and stereo (3D with the virtual
right column, chi2 gate 7.815, src/Optimizer.cc:338,440) — 4 rounds x 10
LM iterations, chi-square inlier/outlier relabeling between rounds, Huber
kernel dropped from round 2 on.

Internally every edge is a 3-row residual (u, v, u_r); monocular edges
mask the third row to zero weight, which reduces them exactly to the 2D
edge. The whole thing is one jitted function over fixed-size arrays —
runs 2-3x per tracked frame, so it is on the tracking critical path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geom import se3
from ..geom.projection import Camera
from .residuals import huber_weight, stereo_point_jacobians

CHI2_MONO = 5.991    # 95% quantile of chi^2_2 (reference src/Optimizer.cc:337)
CHI2_STEREO = 7.815  # 95% quantile of chi^2_3 (reference src/Optimizer.cc:338)


def _edges(cam, Tcw, xyz_w, uvr, stereo_mask, bf):
    """3-row residuals with the mono third row masked off."""
    e, Jp, _, z = stereo_point_jacobians(cam, Tcw, xyz_w, uvr, bf,
                                         want_point=False)
    ones = jnp.ones_like(stereo_mask, dtype=jnp.float32)
    row_mask = jnp.stack(
        [ones, ones, stereo_mask.astype(jnp.float32)], axis=-1)  # [N, 3]
    e = e * row_mask
    Jp = Jp * row_mask[..., None]
    return e, Jp, z


def _lm_rounds(cam, Tcw, xyz_w, uvr, stereo_mask, bf, inv_sigma2, active,
               delta_sq, n_iters, use_huber):
    """n_iters LM iterations on the active edge set. Returns refined pose."""

    def robust_cost(chi2):
        if use_huber:
            # Huber cost: chi2 inside, 2*delta*sqrt(chi2)-delta^2 outside.
            rho = jnp.where(
                chi2 <= delta_sq,
                chi2,
                2.0 * jnp.sqrt(delta_sq * jnp.maximum(chi2, 1e-12))
                - delta_sq,
            )
        else:
            rho = chi2
        return jnp.sum(jnp.where(active, rho, 0.0))

    def total_chi2(T):
        e, _, _ = _edges(cam, T, xyz_w, uvr, stereo_mask, bf)
        return robust_cost(inv_sigma2 * jnp.sum(e * e, axis=-1))

    def step(carry, _):
        T, lam = carry
        e, Jp, _ = _edges(cam, T, xyz_w, uvr, stereo_mask, bf)
        chi2 = inv_sigma2 * jnp.sum(e * e, axis=-1)
        cost_cur = robust_cost(chi2)  # reuse: no second edge eval at T
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
        improved = total_chi2(T_new) < cost_cur
        T_next = jax.tree.map(lambda a, b: jnp.where(improved, a, b), T_new, T)
        lam_next = jnp.where(improved, lam * 0.5, lam * 4.0)
        lam_next = jnp.clip(lam_next, 1e-10, 1e6)
        return (T_next, lam_next), None

    (T_out, _), _ = jax.lax.scan(step, (Tcw, jnp.float32(1e-4)), None,
                                 length=n_iters)
    return T_out


def _valley_escape(cam, Tcw, xyz_w, uvr, stereo_mask, bf, inv_sigma2,
                   active, delta_sq, iters: int):
    """Escape spurious minima along the weak direction of the pose Hessian.

    The stereo/mono projection cost has a low-curvature valley (classically
    pitch vs y-translation for forward-facing scenes) that can hold a
    SECOND local minimum millimeters from the true one — observed even on
    noise-free synthetic stereo problems, where plain GN/LM (ours and
    g2o's, which also uses the PSD Gauss-Newton Hessian) converges to a
    pose ~7 mm off with no escape. Remedy: after converging, re-optimize
    from the converged pose nudged along +-v_min (the weakest eigenvector
    of H) at two amplitudes, and keep the lowest-cost result. All starts
    run batched under vmap — the pose problem is tiny, so this costs a
    fraction of a frame.
    """
    e, Jp, _ = _edges(cam, Tcw, xyz_w, uvr, stereo_mask, bf)
    w = jnp.where(active, inv_sigma2, 0.0)
    H = jnp.einsum("nij,nik,n->jk", Jp, Jp, w) + 1e-6 * jnp.eye(6)
    evals, evecs = jnp.linalg.eigh(H)
    # nudges along the THREE weakest eigendirections, two amplitudes each
    # (observed spurious minima sit along low-curvature directions, not
    # necessarily the single weakest — e.g. a pure z-translation mode)
    lam = jnp.maximum(evals[:3], 1e-3)                    # [3]
    V = evecs[:, :3].T                                    # [3, 6]
    s1 = jnp.sqrt(2.0 * 50.0 / lam)[:, None] * V          # [3, 6]
    s2 = jnp.sqrt(2.0 * 400.0 / lam)[:, None] * V
    deltas = jnp.concatenate(
        [jnp.zeros((1, 6)), s1, -s1, s2, -s2], axis=0)    # [13, 6]
    starts = jax.vmap(lambda d: se3.retract(Tcw, d))(deltas)

    def run(T0):
        T = _lm_rounds(cam, T0, xyz_w, uvr, stereo_mask, bf, inv_sigma2,
                       active, delta_sq, iters, False)
        e2, _, z2 = _edges(cam, T, xyz_w, uvr, stereo_mask, bf)
        chi2 = inv_sigma2 * jnp.sum(e2 * e2, axis=-1)
        # compare on the robust (Huber) cost over the active set so one
        # diverged edge cannot veto a better basin
        gate = delta_sq
        rho = jnp.where(chi2 <= gate, chi2,
                        2.0 * jnp.sqrt(gate * jnp.maximum(chi2, 1e-12))
                        - gate)
        cost = jnp.sum(jnp.where(active & (z2 > 0), rho, gate))
        return T, cost

    Ts, costs = jax.vmap(run)(starts)
    best = jnp.argmin(costs)
    return Ts[best]


@partial(jax.jit, static_argnames=("rounds", "iters_per_round",
                                   "escape_valley"))
def optimize_pose(cam: Camera, Tcw0, xyz_w, uv, inv_sigma2, valid,
                  rounds: int = 4, iters_per_round: int = 10,
                  active0=None, u_right=None, bf=0.0,
                  escape_valley: bool = True):
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
      u_right: [N] f32 observed right-image columns (>= 0 = stereo edge,
        < 0 or None = monocular edge).
      bf: stereo baseline times fx.
      rounds/iters_per_round: 4 x 10 like the reference
        (src/Optimizer.cc:367-379).

    Returns:
      (Tcw [3,4], inlier [N] bool, n_inliers i32)

    Round r re-labels edges by chi2 <= threshold (5.991 mono / 7.815
    stereo) computed at the current pose and optimizes only
    currently-inlier edges; the Huber kernel is active for rounds 0-1 and
    dropped after (reference src/Optimizer.cc:412-424 removes the kernel
    at it==2). Outliers can be reclaimed by later rounds, like the
    reference's level-0/level-1 edge moves.
    """
    n = uv.shape[0]
    if u_right is None:
        u_right = jnp.full(n, -1.0, jnp.float32)
    stereo_mask = u_right >= 0
    uvr = jnp.concatenate([uv, jnp.maximum(u_right, 0.0)[:, None]], axis=-1)
    chi2_th = jnp.where(stereo_mask, CHI2_STEREO, CHI2_MONO)
    delta_sq = chi2_th  # Huber delta^2 matches the gate (Optimizer.cc:302)

    inlier = valid if active0 is None else (valid & active0)
    # snap the start pose onto SO(3): the caller's motion-model feedback
    # loop amplifies any non-orthogonal component exponentially (see
    # se3.renormalize), and retraction-based LM cannot remove it.
    Tcw = se3.renormalize(Tcw0)
    for r in range(rounds):
        use_huber = r < 2
        Tcw = _lm_rounds(cam, Tcw, xyz_w, uvr, stereo_mask, bf, inv_sigma2,
                         inlier, delta_sq, iters_per_round, use_huber)
        if escape_valley and r == 1:
            Tcw = _valley_escape(cam, Tcw, xyz_w, uvr, stereo_mask, bf,
                                 inv_sigma2, inlier, delta_sq,
                                 iters_per_round)
        e, _, z = _edges(cam, Tcw, xyz_w, uvr, stereo_mask, bf)
        chi2 = inv_sigma2 * jnp.sum(e * e, axis=-1)
        inlier = valid & (chi2 <= chi2_th) & (z > 0)
    return Tcw, inlier, jnp.sum(inlier.astype(jnp.int32))
