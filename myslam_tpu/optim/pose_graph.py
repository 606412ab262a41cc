"""Sim(3) pose-graph ("essential graph") optimization.

TPU-native replacement for Optimizer::OptimizeEssentialGraph (reference
src/Optimizer.cc:781-1044), which g2o solves with BlockSolver_7_3 over
EdgeSim3 relative-pose edges (Thirdparty/g2o/g2o/types/types_seven_dof_expmap.h:48-161).

Graph layout here: one fixed-shape edge list over Sim3 vertices.
  residual r = log( S_ji_meas * S_iw * S_jw^-1 )   [7]
matching g2o EdgeSim3::computeError (error = C * v1 * v2^-1, logged).
Jacobians come from forward-mode autodiff through the sim3 exp/log chain —
g2o uses numeric differentiation for this edge (it defines no
linearizeOplus), so autodiff is strictly more accurate.

The Hessian is assembled dense [7K x 7K]; at SLAM scales (K = a few
hundred keyframes) this is a small MXU problem and avoids sparse
bookkeeping entirely.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom import sim3


class PoseGraphProblem(NamedTuple):
    """Siw vertices + relative Sim3 edge list.

    R, t, s:   [K,3,3], [K,3], [K] — current Sim3 world->camera estimates.
    edge_i:    [M] i32 first vertex per edge.
    edge_j:    [M] i32 second vertex per edge.
    meas_*:    measurement S_ji per edge ([M,3,3], [M,3], [M]).
    edge_valid:[M] bool.
    fixed:     [K] bool — held constant (the loop KF,
               reference src/Optimizer.cc:820-843).
    scale_fixed: bool-like scalar; when true, scale updates are zeroed
               (stereo/RGB-D bFixScale, src/Optimizer.cc:789-791).
    """

    R: jnp.ndarray
    t: jnp.ndarray
    s: jnp.ndarray
    edge_i: jnp.ndarray
    edge_j: jnp.ndarray
    meas_R: jnp.ndarray
    meas_t: jnp.ndarray
    meas_s: jnp.ndarray
    edge_valid: jnp.ndarray
    fixed: jnp.ndarray


def _edge_residual(Si, Sj, Sji):
    """r = log(Sji * Si * Sj^-1) for single Sim3 pytrees."""
    return sim3.log(sim3.compose(Sji, sim3.compose(Si, sim3.inverse(Sj))))


def _residual_and_jac(prob: PoseGraphProblem):
    """Batched residuals [M,7] and Jacobians wrt both endpoint tangents
    [M,7,7] each."""
    Si = (prob.R[prob.edge_i], prob.t[prob.edge_i], prob.s[prob.edge_i])
    Sj = (prob.R[prob.edge_j], prob.t[prob.edge_j], prob.s[prob.edge_j])
    Sji = (prob.meas_R, prob.meas_t, prob.meas_s)

    def per_edge(si_R, si_t, si_s, sj_R, sj_t, sj_s, m_R, m_t, m_s):
        def f(deltas):
            di, dj = deltas
            Si_p = sim3.retract((si_R, si_t, si_s), di)
            Sj_p = sim3.retract((sj_R, sj_t, sj_s), dj)
            return _edge_residual(Si_p, Sj_p, (m_R, m_t, m_s))

        zero = (jnp.zeros(7), jnp.zeros(7))
        r = f(zero)
        Ji, Jj = jax.jacfwd(f)(zero)
        return r, Ji, Jj

    return jax.vmap(per_edge)(
        Si[0], Si[1], Si[2], Sj[0], Sj[1], Sj[2], Sji[0], Sji[1], Sji[2]
    )


def _cost(prob: PoseGraphProblem):
    r, _, _ = _residual_and_jac(prob)
    return jnp.sum(jnp.where(prob.edge_valid[:, None], r * r, 0.0))


def _cost_only(prob: PoseGraphProblem):
    Si = (prob.R[prob.edge_i], prob.t[prob.edge_i], prob.s[prob.edge_i])
    Sj = (prob.R[prob.edge_j], prob.t[prob.edge_j], prob.s[prob.edge_j])
    Sji = (prob.meas_R, prob.meas_t, prob.meas_s)
    r = jax.vmap(_edge_residual)(Si, Sj, Sji)
    return jnp.sum(jnp.where(prob.edge_valid[:, None], r * r, 0.0))


@partial(jax.jit, static_argnames=("iters", "scale_fixed"))
def optimize_pose_graph(prob: PoseGraphProblem, iters: int = 20,
                        scale_fixed: bool = False):
    """LM on the Sim3 pose graph; identity 7x7 edge information like the
    reference (src/Optimizer.cc:857-866). Returns updated problem."""
    K = prob.R.shape[0]

    def step(carry, _):
        p, lam = carry
        r, Ji, Jj = _residual_and_jac(p)
        w = p.edge_valid.astype(r.dtype)
        rw = r * w[:, None]
        Jiw = Ji * w[:, None, None]
        Jjw = Jj * w[:, None, None]

        H = jnp.zeros((K, 7, K, 7))
        H = H.at[p.edge_i, :, p.edge_i, :].add(
            jnp.einsum("mri,mrj->mij", Jiw, Ji))
        H = H.at[p.edge_j, :, p.edge_j, :].add(
            jnp.einsum("mri,mrj->mij", Jjw, Jj))
        H = H.at[p.edge_i, :, p.edge_j, :].add(
            jnp.einsum("mri,mrj->mij", Jiw, Jj))
        H = H.at[p.edge_j, :, p.edge_i, :].add(
            jnp.einsum("mri,mrj->mij", Jjw, Ji))
        b = jnp.zeros((K, 7))
        b = b.at[p.edge_i].add(-jnp.einsum("mri,mr->mi", Jiw, r))
        b = b.at[p.edge_j].add(-jnp.einsum("mri,mr->mi", Jjw, r))

        free = (~p.fixed).astype(H.dtype)
        H = H * free[:, None, None, None] * free[None, None, :, None]
        eye7 = jnp.eye(7, dtype=H.dtype)
        H = H.at[jnp.arange(K), :, jnp.arange(K), :].add(
            p.fixed[:, None, None].astype(H.dtype) * eye7)
        b = b * free[:, None]

        diag = jnp.einsum("kaka->ka", H)
        H = H.at[jnp.arange(K), :, jnp.arange(K), :].add(
            lam * jnp.vectorize(jnp.diag, signature="(a)->(a,a)")(diag)
            + 1e-8 * eye7
        )
        delta = jnp.linalg.solve(
            H.reshape(K * 7, K * 7), b.reshape(K * 7)
        ).reshape(K, 7)
        if scale_fixed:
            delta = delta.at[:, 6].set(0.0)
        delta = jnp.where(p.fixed[:, None], 0.0, delta)

        R_n, t_n, s_n = sim3.retract((p.R, p.t, p.s), delta)
        cand = p._replace(R=R_n, t=t_n, s=s_n)
        improved = _cost_only(cand) < _cost_only(p)
        p_next = jax.tree.map(lambda a, b_: jnp.where(improved, a, b_), cand, p)
        lam_n = jnp.clip(jnp.where(improved, lam * 0.5, lam * 4.0),
                         1e-10, 1e8)
        return (p_next, lam_n), None

    (p_out, _), _ = jax.lax.scan(step, (prob, jnp.float32(1e-6)), None,
                                 length=iters)
    return p_out


def correct_points(pt_xyz, pt_ref_kf, S_old, S_new):
    """Re-map landmark positions after a pose-graph solve via their reference
    keyframe: x <- S_new_ref^-1 (S_old_ref x)  (reference
    src/Optimizer.cc:1008-1030 corrects each point with its reference KF's
    old/new Sim3 pair).

    S_old/S_new: batched Sim3 (R [K,3,3], t [K,3], s [K]).
    """
    Ro, to, so = S_old
    Rn, tn, sn = S_new
    idx = pt_ref_kf
    S_o = (Ro[idx], to[idx], so[idx])
    S_n_inv = sim3.inverse((Rn[idx], tn[idx], sn[idx]))
    return sim3.transform(S_n_inv, sim3.transform(S_o, pt_xyz))
