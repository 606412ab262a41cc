"""Bundle adjustment as batched Gauss-Newton/LM with an explicit Schur complement.

TPU-native replacement for g2o's BlockSolver_6_3 pipeline used by
Optimizer::LocalBundleAdjustment / GlobalBundleAdjustemnt (reference
src/Optimizer.cc:41-237, 453-778; Schur machinery in
Thirdparty/g2o/g2o/core/block_solver.hpp:354-447).

Design: the problem is a fixed-shape edge list. Each LM iteration
  1. evaluates residuals + analytic Jacobians for all edges at once,
  2. segment-sums per-edge outer products into block-diagonal Hpp [K,6,6]
     and Hll [P,3,3],
  3. inverts the 3x3 landmark blocks in batch,
  4. forms the dense reduced pose system S = Hpp - Hpl Hll^-1 Hlp via one
     einsum over the pose-landmark incidence tensor (MXU work),
  5. solves S (6K x 6K) densely, back-substitutes landmark updates,
  6. accepts/rejects the step LM-style.

Dense S is exact — no CG truncation — and cheap at SLAM scales (local BA
is tens of poses; global BA on TUM-sized maps is a few hundred). The
incidence tensor A [K,6,P,3] costs K*P*72 bytes; callers compact the
problem to active keyframes/points before calling (the slam layer does).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom import se3
from ..geom.projection import Camera
from ..ops import indexing
from .residuals import (huber_weight, pose_point_jacobians,
                        stereo_point_jacobians)

CHI2_MONO = 5.991
CHI2_STEREO = 7.815    # chi^2_3 gate for stereo edges (src/Optimizer.cc:575)
HUBER_MONO_SQ = 5.991  # delta = sqrt(5.991) (reference src/Optimizer.cc:302)


class BAProblem(NamedTuple):
    """Fixed-shape bundle adjustment problem.

    kf_pose:  [K, 3, 4] world->camera poses.
    pt_xyz:   [P, 3] landmark positions.
    edge_kf:  [E] i32 pose index per edge.
    edge_pt:  [E] i32 landmark index per edge.
    edge_uv:  [E, 2] observations.
    edge_inv_sigma2: [E].
    edge_valid: [E] bool (padding/outliers False).
    kf_fixed: [K] bool — poses held constant (first KF, boundary KFs;
              reference src/Optimizer.cc:73-76, 522-534).
    edge_ur:  [E] f32 or None — observed right column per edge (>= 0 =
              stereo edge with the 3D residual of g2o
              EdgeStereoSE3ProjectXYZ; < 0 = monocular edge).
    bf:       stereo baseline times fx (scalar; only read when edge_ur is
              given).
    """

    kf_pose: jnp.ndarray
    pt_xyz: jnp.ndarray
    edge_kf: jnp.ndarray
    edge_pt: jnp.ndarray
    edge_uv: jnp.ndarray
    edge_inv_sigma2: jnp.ndarray
    edge_valid: jnp.ndarray
    kf_fixed: jnp.ndarray
    edge_ur: jnp.ndarray = None
    bf: float = 0.0


def _gather_pose_point(prob: BAProblem, o_group: int):
    """Per-edge pose/point values.

    o_group = 0: generic gathers (arbitrary edge lists, e.g. sharded BA).
    o_group = O > 0: the STRUCTURED layout local BA emits — edges are
    point-major with exactly O consecutive edges per landmark
    (edge_pt = repeat(arange(P), O)). Then the point "gather" is a free
    broadcast and the pose gather a one-hot matmul — no TPU gather ops
    anywhere in the LM loop (gathers/scatters are serial-fallback slow on
    TPU; see ops/indexing.py).
    """
    if o_group:
        K = prob.kf_pose.shape[0]
        P = prob.pt_xyz.shape[0]
        Tcw = indexing.mm_gather(
            prob.kf_pose.reshape(K, 12), prob.edge_kf).reshape(-1, 3, 4)
        xyz = jnp.broadcast_to(
            prob.pt_xyz[:, None, :], (P, o_group, 3)).reshape(-1, 3)
    else:
        Tcw = prob.kf_pose[prob.edge_kf]
        xyz = prob.pt_xyz[prob.edge_pt]
    return Tcw, xyz


def _edge_residuals(cam, prob: BAProblem, want_point=True, o_group: int = 0):
    """(e, Jp, Jl, z) with stereo third rows masked for mono edges; shapes
    are [E,2,*] for all-mono problems and [E,3,*] when edge_ur is given."""
    Tcw, xyz = _gather_pose_point(prob, o_group)
    if prob.edge_ur is None:
        return pose_point_jacobians(cam, Tcw, xyz, prob.edge_uv,
                                    want_point=want_point)
    stereo = prob.edge_ur >= 0
    uvr = jnp.concatenate(
        [prob.edge_uv, jnp.maximum(prob.edge_ur, 0.0)[:, None]], axis=-1)
    e, Jp, Jl, z = stereo_point_jacobians(cam, Tcw, xyz, uvr, prob.bf,
                                          want_point=want_point)
    ones = jnp.ones_like(stereo, dtype=jnp.float32)
    row_mask = jnp.stack([ones, ones, stereo.astype(jnp.float32)], axis=-1)
    e = e * row_mask
    Jp = Jp * row_mask[..., None]
    if Jl is not None:
        Jl = Jl * row_mask[..., None]
    return e, Jp, Jl, z


def _chi2_gate(prob: BAProblem):
    """Per-edge chi2 threshold / Huber delta^2 (5.991 mono, 7.815 stereo)."""
    if prob.edge_ur is None:
        return HUBER_MONO_SQ
    return jnp.where(prob.edge_ur >= 0, CHI2_STEREO, CHI2_MONO)


def _edge_terms(cam, prob: BAProblem, use_huber: bool, o_group: int = 0):
    """Residuals, Jacobians and robust weights for every edge."""
    e, Jp, Jl, z = _edge_residuals(cam, prob, o_group=o_group)
    chi2 = prob.edge_inv_sigma2 * jnp.sum(e * e, axis=-1)
    w = prob.edge_inv_sigma2
    if use_huber:
        w = w * huber_weight(chi2, _chi2_gate(prob))
    w = jnp.where(prob.edge_valid, w, 0.0)
    return e, Jp, Jl, z, chi2, w


def _robust_cost(cam, prob: BAProblem, use_huber: bool, o_group: int = 0):
    if o_group:
        return _structured_cost(cam, prob, use_huber, o_group)
    e, _, _, z = _edge_residuals(cam, prob, want_point=False,
                                 o_group=o_group)
    chi2 = prob.edge_inv_sigma2 * jnp.sum(e * e, axis=-1)
    if use_huber:
        gate = _chi2_gate(prob)
        rho = jnp.where(
            chi2 <= gate,
            chi2,
            2.0 * jnp.sqrt(gate * jnp.maximum(chi2, 1e-12)) - gate,
        )
    else:
        rho = chi2
    return jnp.sum(jnp.where(prob.edge_valid, rho, 0.0))


# ---------------------------------------------------------------------------
# Component-major structured kernels
#
# The xplane profile of the LM loop showed [E,2,6]/[E,3,3]-shaped per-edge
# tensors dominating each iteration: their tiny minor dims (2x6, 3x3) pad to
# full (8,128) TPU tiles (20-40x wasted bandwidth) and the batch-of-tiny-
# matmul einsums lower to layout-copy + convolution chains. The structured
# point-major path below keeps every per-edge quantity as an [E] f32 vector
# (perfectly tiled), assembles all per-edge Hessian/gradient entries in ONE
# fused elementwise pass producing a flat [E, C] panel, and reduces it with
# two well-shaped contractions: a fat [K,E]@[E,C] matmul for pose blocks and
# a [P,O,C] minor-axis sum for landmark blocks.
# ---------------------------------------------------------------------------


def _structured_rows(cam, prob: BAProblem, o_group: int):
    """Per-edge scalar components for the structured point-major layout.

    Returns (rows, z) where each row is a dict of [E] f32 vectors:
      r:  residual,  Jp: list of 6 pose-Jacobian columns,
      Jl: list of 3 landmark-Jacobian columns.
    Row sparsity is expressed with Python-level 0.0 literals so XLA
    constant-folds the dead products away.
    """
    K = prob.kf_pose.shape[0]
    P = prob.pt_xyz.shape[0]
    T12 = indexing.mm_gather(prob.kf_pose.reshape(K, 12), prob.edge_kf)
    X = jnp.broadcast_to(
        prob.pt_xyz[:, None, :], (P, o_group, 3)).reshape(-1, 3)
    r00, r01, r02, t0 = T12[:, 0], T12[:, 1], T12[:, 2], T12[:, 3]
    r10, r11, r12, t1 = T12[:, 4], T12[:, 5], T12[:, 6], T12[:, 7]
    r20, r21, r22, t2 = T12[:, 8], T12[:, 9], T12[:, 10], T12[:, 11]
    X0, X1, X2 = X[:, 0], X[:, 1], X[:, 2]
    px = r00 * X0 + r01 * X1 + r02 * X2 + t0
    py = r10 * X0 + r11 * X1 + r12 * X2 + t1
    pz = r20 * X0 + r21 * X1 + r22 * X2 + t2
    # z floor 1e-3 (not 1e-9): padded/unmatched edges can sit at the camera
    # plane, and fx/z at z=1e-9 squares to inf in f32 — inf * (zero weight)
    # is NaN and freezes LM. Edges this close are always outliers (masked
    # by edge_valid / the chi2 gates), so the gradient distortion is moot.
    z = jnp.where(jnp.abs(pz) < 1e-3, 1e-3, pz)
    inv_z = 1.0 / z
    inv_z2 = inv_z * inv_z
    u = cam.fx * px * inv_z + cam.cx
    v = cam.fy * py * inv_z + cam.cy
    a = cam.fx * inv_z
    b = cam.fy * inv_z
    c = -cam.fx * px * inv_z2
    d = -cam.fy * py * inv_z2

    def row(A0, A1, A2, res):
        # Jp = [A @ hat(p) | -A] (left-mult tangent), Jl = -(A @ R) — the
        # same linearization as residuals.pose_point_jacobians, expanded to
        # scalar columns.
        return dict(
            r=res,
            Jp=[A1 * pz - A2 * py,
                A2 * px - A0 * pz,
                A0 * py - A1 * px,
                -A0, -A1, -A2],
            Jl=[-(A0 * r00 + A1 * r10 + A2 * r20),
                -(A0 * r01 + A1 * r11 + A2 * r21),
                -(A0 * r02 + A1 * r12 + A2 * r22)],
        )

    rows = [row(a, 0.0, c, prob.edge_uv[:, 0] - u),
            row(0.0, b, d, prob.edge_uv[:, 1] - v)]
    if prob.edge_ur is not None:
        # virtual right column u_r = u - bf/z (g2o EdgeStereoSE3ProjectXYZ);
        # the row is masked out for monocular edges.
        g = c + prob.bf * inv_z2
        ur = u - prob.bf * inv_z
        r3 = row(a, 0.0, g, jnp.maximum(prob.edge_ur, 0.0) - ur)
        m = (prob.edge_ur >= 0).astype(jnp.float32)
        r3 = dict(r=r3["r"] * m, Jp=[j * m for j in r3["Jp"]],
                  Jl=[j * m for j in r3["Jl"]])
        rows.append(r3)
    return rows, pz


def _structured_chi2_w(prob: BAProblem, rows, use_huber: bool):
    chi2 = prob.edge_inv_sigma2 * sum(r["r"] * r["r"] for r in rows)
    w = prob.edge_inv_sigma2
    if use_huber:
        w = w * huber_weight(chi2, _chi2_gate(prob))
    w = jnp.where(prob.edge_valid, w, 0.0)
    return chi2, w


def _structured_cost(cam, prob: BAProblem, use_huber: bool, o_group: int):
    """Total robust cost, component form (one fused pass + one reduce)."""
    rows, _ = _structured_rows(cam, prob, o_group)
    chi2 = prob.edge_inv_sigma2 * sum(r["r"] * r["r"] for r in rows)
    if use_huber:
        gate = _chi2_gate(prob)
        rho = jnp.where(
            chi2 <= gate, chi2,
            2.0 * jnp.sqrt(gate * jnp.maximum(chi2, 1e-12)) - gate)
    else:
        rho = chi2
    return jnp.sum(jnp.where(prob.edge_valid, rho, 0.0))


def _inv3x3_cols(H, lam):
    """Damped closed-form inverse of [P] batched symmetric 3x3 blocks given
    as 9 component columns (i*3+j). Returns 9 inverse columns."""
    dxx = H[0] + lam * H[0] + 1e-8
    dyy = H[4] + lam * H[4] + 1e-8
    dzz = H[8] + lam * H[8] + 1e-8
    xy, xz, yz = H[1], H[2], H[5]
    A = dyy * dzz - yz * yz
    B = xz * yz - xy * dzz
    C = xy * yz - xz * dyy
    det = dxx * A + xy * B + xz * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    ixx = A * inv_det
    ixy = B * inv_det
    ixz = C * inv_det
    iyy = (dxx * dzz - xz * xz) * inv_det
    iyz = (xy * xz - dxx * yz) * inv_det
    izz = (dxx * dyy - xy * xy) * inv_det
    return [ixx, ixy, ixz, ixy, iyy, iyz, ixz, iyz, izz]


def _structured_schur_parts(cam, prob: BAProblem, lam, use_huber: bool,
                            O: int):
    """Component-major assembly of the damped Schur system, split so a
    sharded caller (parallel/dist_ba.py) can psum the cross-shard parts.

    Returns (reduce_parts, local):
      reduce_parts: dict with 'pose_part' [42, K] (Hpp|bp panel) and
        'S_red' [6K, 6K], 'b_corr' [6K] — ADDITIVE across point shards;
        sum them (psum on a mesh) before _structured_schur_solve.
      local: (Hinv 9x[P], bl_c 3x[P], A_T 3x[6K, P]) — stays shard-local
        for the landmark back-substitution (_structured_backsub).

    Single-device callers pass the parts straight through (the sums over
    one shard are the totals)."""
    K = prob.kf_pose.shape[0]
    P = prob.pt_xyz.shape[0]
    rows, _ = _structured_rows(cam, prob, O)
    chi2, w = _structured_chi2_w(prob, rows, use_huber)

    # one fused elementwise panel: [54, E] = Hpp(36) | bp(6) | Hll(9) | bl(3)
    # — component-major (axis 0) so each stacked column is a contiguous
    # tile-aligned [E] block (a minor-axis stack lowers to an 18-way
    # tiny-chunk concatenate costing ~0.3 ms/iter, measured)
    # weight folded into the FIRST factor: w is zero for invalid edges
    # whose other factor can be huge, and 0 * huge must stay 0, not NaN
    wJp = [[w * j for j in r["Jp"]] for r in rows]
    wJl = [[w * j for j in r["Jl"]] for r in rows]
    cols = []
    for ai in range(6):
        for bi in range(6):
            cols.append(sum(wj[ai] * r["Jp"][bi]
                            for wj, r in zip(wJp, rows)))
    for ai in range(6):
        cols.append(-sum(wj[ai] * r["r"] for wj, r in zip(wJp, rows)))
    for i in range(3):
        for j in range(3):
            cols.append(sum(wj[i] * r["Jl"][j]
                            for wj, r in zip(wJl, rows)))
    for i in range(3):
        cols.append(-sum(wj[i] * r["r"] for wj, r in zip(wJl, rows)))
    comp = jnp.stack(cols, axis=0)                      # [54, E]

    onek = indexing.onehot(prob.edge_kf, K)             # [E, K]
    pose_part = jnp.einsum("ce,ek->ck", comp[:42], onek,
                           preferred_element_type=jnp.float32)  # [42, K]

    pt_part = comp[42:].reshape(12, P, O).sum(-1)        # [12, P]
    Hll_c = [pt_part[i] for i in range(9)]
    bl_c = [pt_part[9 + i] for i in range(3)]            # 3 x [P]
    Hinv = _inv3x3_cols(Hll_c, lam)                      # 9 x [P]

    # A_i [96, P]: per-edge Hpl columns (flat [E,18] panel, i-major) folded
    # onto (pose, landmark) blocks by ONE batched contraction over the O
    # axis. (A broadcast [E,K,6] + reshape + reduce formulation materializes
    # a transposed layout and costs ~2.2 ms/iter — measured; this einsum
    # lowers to a clean batched matmul at ~0.15 ms.)
    Hpl_panel = jnp.stack(
        [sum(wj[ai] * r["Jl"][i] for wj, r in zip(wJp, rows))
         for i in range(3) for ai in range(6)], axis=0)   # [18, E]
    A_kcp = jnp.einsum("cpo,pok->kcp",
                       Hpl_panel.reshape(18, P, O),
                       onek.reshape(P, O, K),
                       preferred_element_type=jnp.float32)  # [K, 18, P]
    A_T = [A_kcp[:, 6 * i:6 * (i + 1), :].reshape(K * 6, P)
           for i in range(3)]                               # 3 x [96, P]

    # reduced system S = Hpp_d(block diag) - sum_ij A_i Hinv_ij A_j^T
    def hin(i, j):
        return Hinv[i * 3 + j]

    S_red = jnp.zeros((K * 6, K * 6))
    for i in range(3):
        S_red = S_red + jnp.einsum(
            "ap,bp->ab", A_T[i] * hin(i, i)[None, :], A_T[i],
            preferred_element_type=jnp.float32)
        for j in range(i + 1, 3):
            M = jnp.einsum("ap,bp->ab", A_T[i] * hin(i, j)[None, :], A_T[j],
                           preferred_element_type=jnp.float32)
            S_red = S_red + M + M.T

    # rhs correction: A Hinv bl (additive over point shards)
    u_j = [sum(hin(j, i) * bl_c[i] for i in range(3)) for j in range(3)]
    b_corr = sum(jnp.einsum("ap,p->a", A_T[j], u_j[j],
                            preferred_element_type=jnp.float32)
                 for j in range(3))

    reduce_parts = {"pose_part": pose_part, "S_red": S_red,
                    "b_corr": b_corr}
    return reduce_parts, (Hinv, bl_c, A_T)


def _structured_schur_solve(reduce_parts, kf_fixed, lam):
    """Solve the reduced pose system from (already summed) parts.
    Returns dpose [K, 6]; replicated work — every shard can run it on the
    psum'd parts and get the identical answer."""
    pose_part = reduce_parts["pose_part"]
    S_red = reduce_parts["S_red"]
    b_corr = reduce_parts["b_corr"]
    K = pose_part.shape[1]
    Hpp = pose_part[:36].reshape(6, 6, K).transpose(2, 0, 1)
    bp = pose_part[36:42].T                              # [K, 6]

    eyeK = jnp.eye(6, dtype=Hpp.dtype)
    Hpp_d = Hpp + lam * (Hpp * eyeK) + 1e-8 * eyeK
    S = (-S_red).reshape(K, 6, K, 6)
    S = S + jnp.eye(K)[:, None, :, None] * Hpp_d[:, :, None, :]

    # clamp fixed poses: identity rows/cols, zero rhs
    free = (~kf_fixed).astype(S.dtype)
    S = S * free[:, None, None, None] * free[None, None, :, None]
    S = S + (jnp.eye(K) * kf_fixed.astype(S.dtype)
             )[:, None, :, None] * eyeK[None, :, None, :]

    b_red = bp.reshape(K * 6) - b_corr
    b_red = (b_red.reshape(K, 6) * free[:, None]).reshape(K * 6)

    S_mat = S.reshape(K * 6, K * 6)
    return jnp.linalg.solve(
        S_mat + 1e-8 * jnp.eye(K * 6, dtype=S.dtype), b_red).reshape(K, 6)


def _structured_backsub(local, dpose):
    """Landmark back-substitution dl = Hinv (bl - A^T dpose) on the
    SHARD-LOCAL landmark columns. Returns dpt [P_local, 3]."""
    Hinv, bl_c, A_T = local

    def hin(i, j):
        return Hinv[i * 3 + j]

    dpf = dpose.reshape(-1)
    v_j = [bl_c[j] - jnp.einsum("ap,a->p", A_T[j], dpf,
                                preferred_element_type=jnp.float32)
           for j in range(3)]
    return jnp.stack(
        [sum(hin(i, j) * v_j[j] for j in range(3)) for i in range(3)],
        axis=-1)


def _solve_one_lm_step_structured(cam, prob: BAProblem, lam,
                                  use_huber: bool, O: int):
    """Component-major build-and-solve of the damped Schur system."""
    reduce_parts, local = _structured_schur_parts(cam, prob, lam,
                                                  use_huber, O)
    dpose = _structured_schur_solve(reduce_parts, prob.kf_fixed, lam)
    dpt = _structured_backsub(local, dpose)
    return dpose, dpt


def _inv3x3(M):
    """Batched closed-form 3x3 inverse via adjugate (faster than LU on TPU),
    with a tiny Tikhonov floor for empty landmark blocks."""
    M = M + 1e-8 * jnp.eye(3, dtype=M.dtype)
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), (b * f - c * e)], axis=-1),
            jnp.stack([B, (a * i - c * g), -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), (a * e - b * d)], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def _solve_one_lm_step(cam, prob: BAProblem, lam, use_huber: bool,
                       o_group: int = 0):
    """Build and solve the damped Schur system; return (dpose [K,6], dpt [P,3])."""
    if o_group:
        return _solve_one_lm_step_structured(cam, prob, lam, use_huber,
                                             o_group)
    K = prob.kf_pose.shape[0]
    P = prob.pt_xyz.shape[0]
    e, Jp, Jl, z, chi2, w = _edge_terms(cam, prob, use_huber, o_group)

    # Per-edge weighted blocks.
    wJp = Jp * w[:, None, None]
    Hpp_e = jnp.einsum("nij,nik->njk", wJp, Jp)      # [E,6,6]
    Hll_e = jnp.einsum("nij,nik->njk", Jl * w[:, None, None], Jl)  # [E,3,3]
    Hpl_e = jnp.einsum("nij,nik->njk", wJp, Jl)      # [E,6,3]
    bp_e = -jnp.einsum("nij,ni->nj", wJp, e)          # [E,6]
    bl_e = -jnp.einsum("nij,ni->nj", Jl * w[:, None, None], e)  # [E,3]

    if o_group:
        # structured point-major assembly: landmark blocks are a reshape-
        # sum, pose blocks a one-hot matmul — scatter-free (TPU scatters
        # serialize; ops/indexing.py)
        O = o_group
        onek = indexing.onehot(prob.edge_kf, K)       # [E, K]
        Hll = Hll_e.reshape(P, O, 3, 3).sum(1)
        bl = bl_e.reshape(P, O, 3).sum(1)
        Hpp = jnp.einsum("ek,eij->kij", onek, Hpp_e)
        bp = jnp.einsum("ek,ei->ki", onek, bp_e)
    else:
        Hpp = jnp.zeros((K, 6, 6)).at[prob.edge_kf].add(Hpp_e)
        Hll = jnp.zeros((P, 3, 3)).at[prob.edge_pt].add(Hll_e)
        bp = jnp.zeros((K, 6)).at[prob.edge_kf].add(bp_e)
        bl = jnp.zeros((P, 3)).at[prob.edge_pt].add(bl_e)

    # Marquardt damping.
    eyeK = jnp.eye(6, dtype=Hpp.dtype)
    eyeP = jnp.eye(3, dtype=Hll.dtype)
    Hpp_d = Hpp + lam * (Hpp * eyeK) + 1e-8 * eyeK
    Hll_d = Hll + lam * (Hll * eyeP) + 1e-8 * eyeP

    Hll_inv = _inv3x3(Hll_d)  # [P,3,3]

    # Incidence tensor A[k,a,p,i] = sum_{edges (k,p)} Hpl_e[a,i].
    if o_group:
        A = jnp.einsum("pok,poai->kapi",
                       onek.reshape(P, o_group, K),
                       Hpl_e.reshape(P, o_group, 6, 3))
    else:
        A = jnp.zeros((K, 6, P, 3)).at[
            prob.edge_kf, :, prob.edge_pt, :].add(Hpl_e)

    # Reduced system S = Hpp_d - A Hll^-1 A^T  (block form).
    AW = jnp.einsum("kapi,pij->kapj", A, Hll_inv)
    S_red = jnp.einsum("kapj,lbpj->kalb", AW, A)  # [K,6,K,6]
    S = -S_red
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hpp_d)
    b_red = bp - jnp.einsum("kapj,pj->ka", AW, bl)

    # Clamp fixed poses: identity rows/cols, zero rhs.
    free = (~prob.kf_fixed).astype(S.dtype)
    S = S * free[:, None, None, None] * free[None, None, :, None]
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(
        prob.kf_fixed[:, None, None].astype(S.dtype) * eyeK
    )
    b_red = b_red * free[:, None]

    S_mat = S.reshape(K * 6, K * 6)
    dpose = jnp.linalg.solve(
        S_mat + 1e-8 * jnp.eye(K * 6, dtype=S.dtype), b_red.reshape(K * 6)
    ).reshape(K, 6)

    # Back-substitute landmarks: dl = Hll^-1 (bl - A^T dpose).
    At_dp = jnp.einsum("kapi,ka->pi", A, dpose)
    dpt = jnp.einsum("pij,pj->pi", Hll_inv, bl - At_dp)
    return dpose, dpt


def _apply_step(prob: BAProblem, dpose, dpt):
    new_pose = se3.retract(prob.kf_pose, dpose)
    new_pose = jnp.where(prob.kf_fixed[:, None, None], prob.kf_pose, new_pose)
    return prob._replace(kf_pose=new_pose, pt_xyz=prob.pt_xyz + dpt)


@partial(jax.jit, static_argnames=("iters", "use_huber", "o_group"))
def refine_points_only(cam: Camera, prob: BAProblem, iters: int = 3,
                       use_huber: bool = True, o_group: int = 0):
    """Point-only Gauss-Newton with poses fixed: independent damped 3x3
    solves per landmark, all in one batch. Used as a pre-phase of
    bundle_adjust — freshly triangulated landmarks enter far from their
    optimum, where the joint LM's accept/reject step can wedge (one bad
    landmark rejects a step that helps 2000 others). Per-point updates are
    accepted per-point, so bad landmarks converge independently."""
    P = prob.pt_xyz.shape[0]

    def psum(vals, pt_idx, shape):
        """Per-point segment sum (reshape when structured, scatter else)."""
        if o_group:
            return vals.reshape((P, o_group) + vals.shape[1:]).sum(1)
        return jnp.zeros(shape).at[pt_idx].add(vals)

    def step_structured(prob_c, _):
        # component-major (see _solve_one_lm_step_structured): one fused
        # [E, 13] panel, one [P, O, 13] minor-axis sum, closed-form 3x3
        # solves on [P] component columns.
        rows, _ = _structured_rows(cam, prob_c, o_group)
        chi2, w = _structured_chi2_w(prob_c, rows, use_huber)
        # w folded into the first factor (0 * huge stays 0, not NaN)
        wJl = [[w * j for j in r["Jl"]] for r in rows]
        cols = []
        for i in range(3):
            for j in range(3):
                cols.append(sum(wj[i] * r["Jl"][j]
                                for wj, r in zip(wJl, rows)))
        for i in range(3):
            cols.append(-sum(wj[i] * r["r"] for wj, r in zip(wJl, rows)))
        cols.append(jnp.where(prob_c.edge_valid, chi2, 0.0))
        comp = jnp.stack(cols, axis=0)                  # [13, E]
        pt = comp.reshape(13, P, o_group).sum(-1)       # [13, P]
        Hinv = _inv3x3_cols([pt[i] for i in range(9)], 0.0)
        bl = [pt[9 + j] for j in range(3)]
        dpt = jnp.stack(
            [sum(Hinv[i * 3 + j] * bl[j] for j in range(3))
             for i in range(3)], axis=-1)
        cand = prob_c._replace(pt_xyz=prob_c.pt_xyz + dpt)
        # accept per point: compare per-point chi2 sums
        c_new, z_new = edge_chi2_depth(cam, cand, o_group)
        old_p = pt[12]
        new_p = (jnp.where(prob_c.edge_valid,
                           jnp.where(z_new > 0, c_new, 1e12), 0.0)
                 .reshape(P, o_group).sum(1))
        take = (new_p < old_p)[:, None]
        return prob_c._replace(
            pt_xyz=jnp.where(take, cand.pt_xyz, prob_c.pt_xyz)), None

    def step(prob_c, _):
        if o_group:
            return step_structured(prob_c, _)
        e, Jp, Jl, z, chi2, w = _edge_terms(cam, prob_c, use_huber, o_group)
        wJl = Jl * w[:, None, None]
        Hll = psum(jnp.einsum("nij,nik->njk", wJl, Jl),
                   prob_c.edge_pt, (P, 3, 3))
        bl = psum(-jnp.einsum("nij,ni->nj", wJl, e),
                  prob_c.edge_pt, (P, 3))
        dpt = jnp.einsum("pij,pj->pi", _inv3x3(Hll), bl)
        cand = prob_c._replace(pt_xyz=prob_c.pt_xyz + dpt)
        # accept per point: compare per-point chi2 sums (chi2 at the
        # current estimate is already in hand from _edge_terms)
        c_new, z_new = edge_chi2_depth(cam, cand, o_group)
        val = prob_c.edge_valid
        old_p = psum(jnp.where(val, chi2, 0.0), prob_c.edge_pt, (P,))
        new_p = psum(jnp.where(val, jnp.where(z_new > 0, c_new, 1e12), 0.0),
                     prob_c.edge_pt, (P,))
        take = (new_p < old_p)[:, None]
        return prob_c._replace(
            pt_xyz=jnp.where(take, cand.pt_xyz, prob_c.pt_xyz)), None

    prob_out, _ = jax.lax.scan(step, prob, None, length=iters)
    return prob_out


@partial(jax.jit, static_argnames=("iters", "use_huber", "o_group"))
def run_lm(cam: Camera, prob: BAProblem, iters: int, use_huber: bool = True,
           lam0: float = 1e-4, o_group: int = 0):
    """LM loop with accept/reject, fixed iteration count (jit-friendly)."""

    def step(carry, _):
        prob_c, lam, cost_c = carry
        dpose, dpt = _solve_one_lm_step(cam, prob_c, lam, use_huber,
                                        o_group)
        cand = _apply_step(prob_c, dpose, dpt)
        cost_n = _robust_cost(cam, cand, use_huber, o_group)
        improved = cost_n < cost_c  # current cost carried, not recomputed
        prob_n = jax.tree.map(
            lambda a, b: jnp.where(improved, a, b), cand, prob_c
        )
        lam_n = jnp.clip(
            jnp.where(improved, lam * 0.5, lam * 4.0), 1e-10, 1e8
        )
        return (prob_n, lam_n, jnp.where(improved, cost_n, cost_c)), None

    cost0 = _robust_cost(cam, prob, use_huber, o_group)
    (prob_out, _, _), _ = jax.lax.scan(
        step, (prob, jnp.float32(lam0), cost0), None, length=iters
    )
    return prob_out


def edge_chi2_depth(cam: Camera, prob: BAProblem, o_group: int = 0):
    """Per-edge chi2 and camera-frame depth at the current estimate."""
    if o_group:
        rows, z = _structured_rows(cam, prob, o_group)
        chi2 = prob.edge_inv_sigma2 * sum(r["r"] * r["r"] for r in rows)
        return chi2, z
    e, _, _, z = _edge_residuals(cam, prob, want_point=False,
                                 o_group=o_group)
    chi2 = prob.edge_inv_sigma2 * jnp.sum(e * e, axis=-1)
    return chi2, z


@partial(jax.jit, static_argnames=("iters1", "iters2", "o_group"))
def bundle_adjust(cam: Camera, prob: BAProblem, iters1: int = 5,
                  iters2: int = 10, o_group: int = 0):
    """Two-phase BA mirroring Optimizer::LocalBundleAdjustment
    (src/Optimizer.cc:659-707): optimize `iters1` with Huber, drop edges
    with chi2 > 5.991 or non-positive depth, optimize `iters2` more without
    the robust kernel, then flag final outliers.

    Returns (problem with refined poses/points, final edge_inlier mask).

    Two deliberate deviations from the reference's gating, needed because a
    freshly-warped monocular bundle has HIGH-chi2 edges that are exactly the
    constraints that straighten it (SURVEY.md §7 "hard parts" #3):
    - the mid-phase drop threshold is loosened (4x) so slow-converging
      edges survive into phase 2 instead of being deleted at iteration 5;
    - the final inlier mask is computed against ALL originally-valid edges
      (reclaiming), so an edge excluded mid-way but consistent with the
      refined solution is kept as an observation.
    """
    valid0 = prob.edge_valid
    gate = _chi2_gate(prob)  # 5.991 mono / 7.815 stereo, per edge
    prob = refine_points_only(cam, prob, 2, use_huber=True,
                              o_group=o_group)
    prob = run_lm(cam, prob, iters1, use_huber=True, o_group=o_group)
    prob = refine_points_only(cam, prob, 1, use_huber=True,
                              o_group=o_group)
    chi2, z = edge_chi2_depth(cam, prob, o_group)
    keep = valid0 & (chi2 <= 4.0 * gate) & (z > 0)
    prob = prob._replace(edge_valid=keep)
    prob = run_lm(cam, prob, iters2, use_huber=False, o_group=o_group)
    prob = refine_points_only(cam, prob, 1, use_huber=False,
                              o_group=o_group)
    chi2, z = edge_chi2_depth(cam, prob, o_group)
    inlier = valid0 & (chi2 <= gate) & (z > 0)
    # keep written-back poses exactly on SO(3) (see se3.renormalize)
    prob = prob._replace(kf_pose=se3.renormalize(prob.kf_pose))
    return prob._replace(edge_valid=valid0), inlier


@partial(jax.jit, static_argnames=("iters",))
def global_bundle_adjust(cam: Camera, prob: BAProblem, iters: int = 20):
    """GlobalBundleAdjustemnt equivalent (src/Optimizer.cc:41-54): single
    phase, Huber kernel on, all KFs but the first free (caller sets
    kf_fixed)."""
    prob = run_lm(cam, prob, iters, use_huber=True)
    return prob._replace(kf_pose=se3.renormalize(prob.kf_pose))
