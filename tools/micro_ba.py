"""Micro-profile of the local-BA LM iteration internals on device.

Uses the two-length scan trick (run N and 2N iterations, difference
cancels the constant dispatch/link overhead exactly). Inputs are
perturbed ADDITIVELY by a tiny data-dependent carry term — a `x + c*0`
perturbation gets algebraically simplified away by XLA and the whole
piece hoisted out of the scan, producing ~0 readings.

Usage: python tools/micro_ba.py [--cpu] [--iters N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from myslam_tpu.geom.projection import Camera
from myslam_tpu.geom import se3
from myslam_tpu.optim import ba as ba_mod
from myslam_tpu.ops import indexing

ITERS = 24
for i, a in enumerate(sys.argv):
    if a == "--iters":
        ITERS = int(sys.argv[i + 1])


def timed(name, fn):
    """fn(eps_scalar) -> pytree of float arrays. eps is tiny but
    data-dependent; add it to a float input so nothing can be hoisted."""

    def body(carry, _):
        out = fn(carry * 1e-30)
        leaves = jax.tree.leaves(out)
        s = sum(jnp.sum(l).astype(jnp.float32) for l in leaves
                if jnp.issubdtype(l.dtype, jnp.floating))
        return carry * 0.5 + s * 1e-30, None

    runs = {}
    for n in (ITERS, 2 * ITERS):
        runs[n] = jax.jit(
            lambda c, n=n: jax.lax.scan(body, c, None, length=n)[0])
        runs[n](jnp.float32(1e-6)).block_until_ready()
    best = {ITERS: 1e9, 2 * ITERS: 1e9}
    for _ in range(3):
        for n in (ITERS, 2 * ITERS):
            t0 = time.perf_counter()
            runs[n](jnp.float32(1e-6)).block_until_ready()
            best[n] = min(best[n], time.perf_counter() - t0)
    per = (best[2 * ITERS] - best[ITERS]) / ITERS * 1e3
    print(f"{name:38s} {per:8.3f} ms/iter")
    return per


def make_problem(K=16, P=4096, O=8, seed=0):
    rng = np.random.RandomState(seed)
    cam = Camera.create(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                        width=640, height=480)
    pts = rng.uniform(-2, 2, (P, 3)).astype(np.float32)
    pts[:, 2] += 6.0
    poses = []
    for k in range(K):
        t = 0.1 * rng.randn(3).astype(np.float32)
        w = 0.02 * rng.randn(3).astype(np.float32)
        poses.append(np.asarray(se3.retract(jnp.eye(3, 4), jnp.concatenate(
            [jnp.asarray(w), jnp.asarray(t)]))))
    poses = jnp.asarray(np.stack(poses))
    E = P * O
    e_pt = np.repeat(np.arange(P), O)
    e_kf = rng.randint(0, K, E)
    pc = np.asarray(jax.vmap(se3.transform)(
        poses[e_kf], jnp.asarray(pts[e_pt])[:, None])).reshape(E, 3)
    uv = np.stack([450.0 * pc[:, 0] / pc[:, 2] + 320.0,
                   450.0 * pc[:, 1] / pc[:, 2] + 240.0], -1)
    uv += 0.5 * rng.randn(E, 2)
    prob = ba_mod.BAProblem(
        kf_pose=poses,
        pt_xyz=jnp.asarray(pts + 0.01 * rng.randn(P, 3).astype(np.float32)),
        edge_kf=jnp.asarray(e_kf, jnp.int32),
        edge_pt=jnp.asarray(e_pt, jnp.int32),
        edge_uv=jnp.asarray(uv, jnp.float32),
        edge_inv_sigma2=jnp.ones(E, jnp.float32),
        edge_valid=jnp.asarray(rng.rand(E) > 0.3),
        kf_fixed=jnp.asarray(np.arange(K) >= K // 2),
    )
    return cam, prob


def main():
    cam, prob = make_problem()
    O = 8
    K = prob.kf_pose.shape[0]
    P = prob.pt_xyz.shape[0]

    def pp(c):
        return prob._replace(pt_xyz=prob.pt_xyz + c)

    def full(c):
        dp, dl = ba_mod._solve_one_lm_step(cam, pp(c), 1e-4, True, O)
        return (dp, dl)
    timed("_solve_one_lm_step", full)

    def terms(c):
        e, Jp, Jl, z, chi2, w = ba_mod._edge_terms(cam, pp(c), True, O)
        return (e, Jp, Jl, chi2, w)
    timed("_edge_terms (res+jac)", terms)

    def cost(c):
        return (ba_mod._robust_cost(cam, pp(c), True, O),)
    timed("_robust_cost", cost)

    e, Jp, Jl, z, chi2, w = ba_mod._edge_terms(cam, prob, True, O)
    onek = indexing.onehot(prob.edge_kf, K)

    def assemble(c):
        wJp = Jp * (w + c)[:, None, None]
        Hpp_e = jnp.einsum("nij,nik->njk", wJp, Jp)
        Hll_e = jnp.einsum("nij,nik->njk", Jl * w[:, None, None], Jl)
        Hpl_e = jnp.einsum("nij,nik->njk", wJp, Jl)
        bp_e = -jnp.einsum("nij,ni->nj", wJp, e)
        bl_e = -jnp.einsum("nij,ni->nj", Jl * w[:, None, None], e)
        Hll = Hll_e.reshape(P, O, 3, 3).sum(1)
        bl = bl_e.reshape(P, O, 3).sum(1)
        Hpp = jnp.einsum("ek,eij->kij", onek, Hpp_e)
        bp = jnp.einsum("ek,ei->ki", onek, bp_e)
        return (Hpp, Hll, Hpl_e, bp, bl)
    timed("block assembly (Hpp/Hll/Hpl/b)", assemble)

    wJp = Jp * w[:, None, None]
    Hpl_e = jnp.einsum("nij,nik->njk", wJp, Jl)
    Hll = (jnp.einsum("nij,nik->njk", Jl * w[:, None, None], Jl)
           .reshape(P, O, 3, 3).sum(1))
    Hpp = jnp.einsum("ek,eij->kij", onek,
                     jnp.einsum("nij,nik->njk", wJp, Jp))
    bl = (-jnp.einsum("nij,ni->nj", Jl * w[:, None, None], e)
          .reshape(P, O, 3).sum(1))
    Hll_inv = ba_mod._inv3x3(Hll + 1e-4 * jnp.eye(3))

    def inv3(c):
        return (ba_mod._inv3x3(Hll + c),)
    timed("_inv3x3 [P,3,3]", inv3)

    def build_A(c):
        A = jnp.einsum("pok,poai->kapi",
                       onek.reshape(P, O, K),
                       (Hpl_e + c).reshape(P, O, 6, 3))
        return (A,)
    timed("A incidence einsum", build_A)

    A = jnp.einsum("pok,poai->kapi", onek.reshape(P, O, K),
                   Hpl_e.reshape(P, O, 6, 3))

    def schur(c):
        AW = jnp.einsum("kapi,pij->kapj", A + c, Hll_inv)
        S_red = jnp.einsum("kapj,lbpj->kalb", AW, A)
        return (S_red,)
    timed("Schur S_red einsums", schur)

    AW = jnp.einsum("kapi,pij->kapj", A, Hll_inv)
    S_red0 = jnp.einsum("kapj,lbpj->kalb", AW, A)

    def diag_add(c):
        S = -(S_red0 + c)
        S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hpp)
        free = (~prob.kf_fixed).astype(S.dtype)
        S = S * free[:, None, None, None] * free[None, None, :, None]
        S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(
            prob.kf_fixed[:, None, None].astype(S.dtype) * jnp.eye(6))
        return (S,)
    timed("diag scatter-adds + clamp", diag_add)

    def diag_add_bcast(c):
        S = -(S_red0 + c)
        eyeK = jnp.eye(K, dtype=S.dtype)
        S = S + eyeK[:, None, :, None] * Hpp[:, :, None, :]
        free = (~prob.kf_fixed).astype(S.dtype)
        S = S * free[:, None, None, None] * free[None, None, :, None]
        S = S + (eyeK * prob.kf_fixed.astype(S.dtype)
                 )[:, None, :, None] * jnp.eye(6)[None, :, None, :]
        return (S,)
    timed("diag via eye-broadcast", diag_add_bcast)

    S_mat = S_red0.reshape(K * 6, K * 6)
    S_mat = S_mat + S_mat.T + 100.0 * jnp.eye(K * 6)
    rhs = jnp.ones(K * 6)

    def solve(c):
        return (jnp.linalg.solve(S_mat + c * jnp.eye(K * 6), rhs),)
    timed("linalg.solve 96x96", solve)

    dpose0 = jnp.ones((K, 6)) * 1e-3

    def backsub(c):
        At_dp = jnp.einsum("kapi,ka->pi", A, dpose0 + c)
        dpt = jnp.einsum("pij,pj->pi", Hll_inv, bl - At_dp)
        return (dpt,)
    timed("back-substitution einsums", backsub)

    def backsub_mulsum(c):
        At_dp = jnp.einsum("kapi,ka->pi", A, dpose0 + c)
        dpt = jnp.sum(Hll_inv * (bl - At_dp)[:, None, :], axis=-1)
        return (dpt,)
    timed("back-substitution mul-sum", backsub_mulsum)

    def retr(c):
        return (se3.retract(prob.kf_pose, jnp.zeros((K, 6)) + c),)
    timed("se3.retract [K]", retr)

    def accept(c):
        cand = pp(c)
        keep = c > 0
        out = jax.tree.map(
            lambda a, b: jnp.where(keep, a, b)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, cand, prob)
        return (out.pt_xyz, out.kf_pose)
    timed("accept/reject tree where", accept)

    def refine(c):
        p2 = ba_mod.refine_points_only(cam, pp(c), 1, o_group=O)
        return (p2.pt_xyz,)
    timed("refine_points_only 1 it", refine)

    print("done")


if __name__ == "__main__":
    main()
