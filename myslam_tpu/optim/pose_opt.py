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


def _chol_solve6(H, b):
    """Solve the damped-SPD 6x6 system H x = b by fully unrolled Cholesky.

    jnp.linalg.solve lowers to an LU custom call with a pivoting loop —
    serial scalar work the TPU pays ~10us for, 40x per pose optimization.
    The unrolled Cholesky is pure elementwise arithmetic XLA fuses into
    the surrounding kernel (and it vmaps cleanly for the multi-start
    escape). H must be symmetric positive definite (guaranteed by the
    Marquardt-damped Gauss-Newton Hessian plus the 1e-9 floor)."""
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        s = H[..., i, i]
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        L[i][i] = jnp.sqrt(jnp.maximum(s, 1e-20))
        inv_d = 1.0 / L[i][i]
        for j in range(i + 1, 6):
            s = H[..., j, i]
            for k in range(i):
                s = s - L[j][k] * L[i][k]
            L[j][i] = s * inv_d
    # forward substitution L y = b
    y = [None] * 6
    for i in range(6):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


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


def _pose_rows(cam, Tcw, xyz_w, uvr, stereo_mask, bf):
    """Per-edge scalar components ([N] vectors) of the 3-row pose edge.

    Same linearization as _edges, expanded to scalar columns: [N,3,6]
    Jacobian tensors have 3x6 minor dims that pad to full (8,128) TPU
    tiles, and their batch-of-tiny-matmul contractions lower to layout
    copies — component [N] vectors tile perfectly (see optim/ba.py
    component-major kernels for the profile evidence).

    Returns (rows, z): rows is a list of 3 dicts {r: [N], Jp: 6x [N]}.
    """
    r00, r01, r02, t0 = Tcw[0, 0], Tcw[0, 1], Tcw[0, 2], Tcw[0, 3]
    r10, r11, r12, t1 = Tcw[1, 0], Tcw[1, 1], Tcw[1, 2], Tcw[1, 3]
    r20, r21, r22, t2 = Tcw[2, 0], Tcw[2, 1], Tcw[2, 2], Tcw[2, 3]
    X0, X1, X2 = xyz_w[:, 0], xyz_w[:, 1], xyz_w[:, 2]
    px = r00 * X0 + r01 * X1 + r02 * X2 + t0
    py = r10 * X0 + r11 * X1 + r12 * X2 + t1
    pz = r20 * X0 + r21 * X1 + r22 * X2 + t2
    # z floor 1e-3 (not 1e-9): unmatched edges gather xyz=0 and sit at the
    # camera plane; fx/z at z=1e-9 squares to inf in f32, and inf * (zero
    # weight) = NaN freezes the LM accept test. Such edges are always
    # masked by `active`/chi2 gates, so the distortion is irrelevant.
    z = jnp.where(jnp.abs(pz) < 1e-3, 1e-3, pz)
    inv_z = 1.0 / z
    inv_z2 = inv_z * inv_z
    u = cam.fx * px * inv_z + cam.cx
    v = cam.fy * py * inv_z + cam.cy
    a = cam.fx * inv_z
    b = cam.fy * inv_z
    c = -cam.fx * px * inv_z2
    d = -cam.fy * py * inv_z2
    g = c + bf * inv_z2
    ur = u - bf * inv_z

    def row(A0, A1, A2, res):
        return dict(r=res,
                    Jp=[A1 * pz - A2 * py,
                        A2 * px - A0 * pz,
                        A0 * py - A1 * px,
                        -A0, -A1, -A2])

    m = stereo_mask.astype(jnp.float32)
    r3 = row(a, 0.0, g, uvr[:, 2] - ur)
    rows = [row(a, 0.0, c, uvr[:, 0] - u),
            row(0.0, b, d, uvr[:, 1] - v),
            dict(r=r3["r"] * m, Jp=[j * m for j in r3["Jp"]])]
    return rows, pz


def _pose_chi2(cam, Tcw, xyz_w, uvr, stereo_mask, bf, inv_sigma2):
    rows, z = _pose_rows(cam, Tcw, xyz_w, uvr, stereo_mask, bf)
    return inv_sigma2 * sum(r["r"] * r["r"] for r in rows), z


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
        chi2, _ = _pose_chi2(cam, T, xyz_w, uvr, stereo_mask, bf,
                             inv_sigma2)
        return robust_cost(chi2)

    def step(carry, _):
        T, lam = carry
        rows, _ = _pose_rows(cam, T, xyz_w, uvr, stereo_mask, bf)
        chi2 = inv_sigma2 * sum(r["r"] * r["r"] for r in rows)
        cost_cur = robust_cost(chi2)  # reuse: no second edge eval at T
        w = inv_sigma2
        if use_huber:
            w = w * huber_weight(chi2, delta_sq)
        w = jnp.where(active, w, 0.0)
        # 42 fused elementwise-column reductions = H(36) | b(6) — no
        # [N,3,6] tensors (see _pose_rows docstring). Each column is
        # REDUCED before stacking: stacking the [N] columns first
        # materializes a [42, N] (or [13, 42, N] under the escape vmap)
        # tensor whose concatenate alone cost 0.26 ms/LM-iteration on
        # chip (xplane trace); per-column sums fuse into the column math.
        # w folded into the first factor (0 * huge stays 0, not NaN)
        wJp = [[w * j for j in r["Jp"]] for r in rows]
        cols = []
        for ai in range(6):
            for bi in range(6):
                cols.append(sum(wj[ai] * r["Jp"][bi]
                                for wj, r in zip(wJp, rows)))
        for ai in range(6):
            cols.append(-sum(wj[ai] * r["r"] for wj, r in zip(wJp, rows)))
        sums = jnp.stack([c.sum(-1) for c in cols], axis=0)  # [42]
        H = sums[:36].reshape(6, 6)
        b = sums[36:42]
        # Marquardt damping on the diagonal.
        H_damped = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6)
        delta = _chol_solve6(H_damped, b)
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
    rows, _ = _pose_rows(cam, Tcw, xyz_w, uvr, stereo_mask, bf)
    w = jnp.where(active, inv_sigma2, 0.0)
    wJp = [[w * j for j in r["Jp"]] for r in rows]
    H = jnp.stack(
        [sum(wj[ai] * r["Jp"][bi] for wj, r in zip(wJp, rows)).sum(-1)
         for ai in range(6) for bi in range(6)], axis=0
    ).reshape(6, 6) + 1e-6 * jnp.eye(6)
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
        chi2, z2 = _pose_chi2(cam, T, xyz_w, uvr, stereo_mask, bf,
                              inv_sigma2)
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
        chi2, z = _pose_chi2(cam, Tcw, xyz_w, uvr, stereo_mask, bf,
                             inv_sigma2)
        inlier = valid & (chi2 <= chi2_th) & (z > 0)
    return Tcw, inlier, jnp.sum(inlier.astype(jnp.int32))
