"""Batched RANSAC PnP for relocalization.

TPU-native replacement for PnPsolver (reference src/PnPsolver.cc, 1022
lines: EPnP control-point algebra + a resumable RANSAC loop). Here every
hypothesis is solved and scored simultaneously:

- minimal set: 6 correspondences -> DLT projection-matrix fit (12x12 eigh),
  R extracted by SVD orthonormalization, scale/sign fixed by cheirality.
  (The reference uses 4-point EPnP; the 6-point DLT has the same role with
  far simpler batched algebra. Relocalization candidate sets are dozens of
  matches, so the larger minimal set costs negligible inlier probability.)
- scoring: per-point scale-aware chi2 reprojection gate, matching the
  reference's maxError = th2 * sigma2(octave) (src/PnPsolver.cc:139-157).
- refinement: Gauss-Newton pose optimization on the best hypothesis'
  inliers (PnPsolver::Refine -> optim.pose_opt here).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom import se3
from ..geom.projection import Camera
from ..optim import pose_opt

CHI2_TH = 5.991  # 2-dof gate like the reference's RANSAC epsilon


class PnPResult(NamedTuple):
    ok: jnp.ndarray        # scalar bool
    Tcw: jnp.ndarray       # [3, 4]
    inliers: jnp.ndarray   # [N] bool
    n_inliers: jnp.ndarray


def _dlt_pose(xyz, uv_norm):
    """Projection matrix from >=6 3D-2D pairs (normalized camera coords),
    then R via SVD orthonormalization. Returns [3, 4] Tcw."""
    n = xyz.shape[0]
    X = jnp.concatenate([xyz, jnp.ones((n, 1))], axis=1)  # [n, 4]
    z = jnp.zeros((n, 4))
    rows_u = jnp.concatenate([X, z, -uv_norm[:, :1] * X], axis=1)
    rows_v = jnp.concatenate([z, X, -uv_norm[:, 1:2] * X], axis=1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)  # [2n, 12]
    AtA = A.T @ A
    _, vecs = jnp.linalg.eigh(AtA)
    p = vecs[:, 0]
    P = p.reshape(3, 4)
    # The null vector's sign is arbitrary: P[:, :3] = s*R with s possibly
    # negative (det = s^3). Normalize the sign BEFORE polar decomposition —
    # forcing det(+1) afterwards would produce a wrong rotation.
    sign = jnp.sign(jnp.linalg.det(P[:, :3]))
    P = P * jnp.where(sign == 0.0, 1.0, sign)
    U, S, Vt = jnp.linalg.svd(P[:, :3])
    det = jnp.linalg.det(U @ Vt)  # +/-1 residual reflection from noise
    D = jnp.diag(jnp.array([1.0, 1.0, det]))
    R = U @ D @ Vt
    scale = jnp.maximum(jnp.mean(S), 1e-12)
    t = P[:, 3] / scale
    return se3.make(R, t)


@partial(jax.jit, static_argnames=("n_hyp", "refine_iters"))
def solve_pnp(cam: Camera, xyz, uv, inv_sigma2, valid, key,
              n_hyp: int = 512, refine_iters: int = 10) -> PnPResult:
    """RANSAC PnP over [N] 3D-2D matches with per-point octave sigma.

    n_hyp sizing vs the reference's 4-point EPnP (src/PnPsolver.cc:121-258):
    the 6-point DLT minimal set squares away more inlier probability per
    hypothesis (eps^6 vs eps^4), so the batch is sized for the reloc
    regime instead — at 50% outliers P(>=1 clean set) = 1-(1-2^-6)^512
    > 0.999, and at 60% ~0.88. Hypotheses are embarrassingly batched
    (one vmapped 12x12 eigh), so 512 costs the same wall time as 128.

    Args:
      xyz: [N, 3] world points; uv: [N, 2] undistorted pixels.
      inv_sigma2: [N] information weights (1/sigma^2 per octave).
      valid: [N] bool candidate mask.
    """
    n = xyz.shape[0]
    logits = jnp.where(valid, 0.0, -jnp.inf)
    idx = jax.random.categorical(key, logits[None, :], shape=(n_hyp, 6))

    # normalized camera coords for the DLT
    uvn = jnp.stack([
        (uv[:, 0] - cam.cx) / cam.fx,
        (uv[:, 1] - cam.cy) / cam.fy,
    ], axis=1)

    Ts = jax.vmap(lambda i: _dlt_pose(xyz[i], uvn[i]))(idx)  # [S, 3, 4]

    def score(T):
        pc = se3.transform(T, xyz)
        zpos = pc[:, 2] > 0
        u = cam.fx * pc[:, 0] / jnp.maximum(pc[:, 2], 1e-9) + cam.cx
        v = cam.fy * pc[:, 1] / jnp.maximum(pc[:, 2], 1e-9) + cam.cy
        chi2 = ((u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2) * inv_sigma2
        inl = valid & zpos & (chi2 < CHI2_TH)
        # wide gate too: a MINIMAL 6-point fit of noisy inliers can land
        # several pixels off — at high outlier ratios every clean
        # hypothesis may score near-zero under the strict gate while
        # still being the right basin (observed at 50% outliers). The
        # wide count ranks basins; the strict count decides the winner
        # after refinement.
        wide = valid & zpos & (chi2 < 16.0 * CHI2_TH)
        return jnp.sum(inl), jnp.sum(wide), inl

    n_inl, n_wide, inls = jax.vmap(score)(Ts)

    # refine the top-4 hypotheses by wide-gate score (all batched), then
    # keep the refined pose with the most strict inliers
    # (PnPsolver::Refine, src/PnPsolver.cc:260-306, which reruns EPnP on
    # the inlier set; here a full pose optimization with relabeling).
    _, top = jax.lax.top_k(n_wide * 1000 + n_inl, 4)

    def refine(b):
        act = inls[b] | (n_inl[b] == 0)  # empty strict set: start wide open
        return pose_opt.optimize_pose(
            cam, Ts[b], xyz, uv, inv_sigma2, valid,
            rounds=3, iters_per_round=refine_iters, active0=act)

    T_refs, inl_refs, n_refs = jax.vmap(refine)(top)
    bi = jnp.argmax(n_refs)
    T_ref, refined_inl, n_ref = T_refs[bi], inl_refs[bi], n_refs[bi]
    ok = n_ref >= 10
    return PnPResult(ok=ok, Tcw=T_ref, inliers=refined_inl, n_inliers=n_ref)
