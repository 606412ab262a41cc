"""Distributed bundle adjustment over a jax.sharding.Mesh.

The reference has NO distributed capability (single-process threads only,
SURVEY.md §2.4) — this is the greenfield TPU scale-out design of
BASELINE.json config 5: shard the EDGE list (observations) across devices,
compute per-shard Gauss-Newton block contributions locally, and reduce the
Schur system with `psum` over the ICI mesh. Keyframe poses and landmark
blocks are replicated (they are tiny next to the edge data); the reduced
pose solve happens identically on every device.

Handles both monocular 2D edges and stereo 3D edges (the g2o
EdgeStereoSE3ProjectXYZ analogue, reference src/Optimizer.cc:570-607):
edge_ur >= 0 marks a stereo edge and masks in the virtual-right-column
residual row, exactly as optim/ba.py does on one device.

Communication cost per LM iteration: one psum of
  Hpp [K,6,6] + Hll [P,3,3] + A [K,6,P,3] + bp [K,6] + bl [P,3]
which for local-BA-sized problems (K<=32, P<=8192) is a few MB — ICI
bandwidth noise. Edge evaluation (the O(E) part: residuals, Jacobians,
outer products) scales linearly with device count.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geom import se3
from ..geom.projection import Camera
from ..optim import ba as ba_mod
from ..optim.ba import BAProblem, _inv3x3
from ..optim.residuals import huber_weight


def shard_edges(prob: BAProblem, mesh: Mesh, axis: str = None):
    """Pad the edge list to a multiple of the mesh axis size and attach
    shardings: edges sharded, poses/points replicated."""
    axis = axis or mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    E = prob.edge_kf.shape[0]
    pad = (-E) % n_dev

    def pad_edge(x, fill=0):
        if pad == 0:
            return x
        pad_width = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
        return jnp.pad(x, pad_width, constant_values=fill)

    prob = prob._replace(
        edge_kf=pad_edge(prob.edge_kf),
        edge_pt=pad_edge(prob.edge_pt),
        edge_uv=pad_edge(prob.edge_uv),
        edge_inv_sigma2=pad_edge(prob.edge_inv_sigma2),
        edge_valid=pad_edge(prob.edge_valid, fill=False),
        edge_ur=(pad_edge(prob.edge_ur, fill=-1.0)
                 if prob.edge_ur is not None else None),
    )
    e_sharding = NamedSharding(mesh, P(axis))
    r_sharding = NamedSharding(mesh, P())
    return BAProblem(
        kf_pose=jax.device_put(prob.kf_pose, r_sharding),
        pt_xyz=jax.device_put(prob.pt_xyz, r_sharding),
        edge_kf=jax.device_put(prob.edge_kf, e_sharding),
        edge_pt=jax.device_put(prob.edge_pt, e_sharding),
        edge_uv=jax.device_put(prob.edge_uv, e_sharding),
        edge_inv_sigma2=jax.device_put(prob.edge_inv_sigma2, e_sharding),
        edge_valid=jax.device_put(prob.edge_valid, e_sharding),
        kf_fixed=jax.device_put(prob.kf_fixed, r_sharding),
        edge_ur=(jax.device_put(prob.edge_ur, e_sharding)
                 if prob.edge_ur is not None else None),
        bf=prob.bf,
    )


def _shard_prob(cam, kf_pose, pt_xyz, e_kf, e_pt, e_uv, e_is2, e_val, e_ur,
                bf, kf_fixed=None):
    """View one shard's edge slice as a BAProblem so the single-device
    residual/Jacobian kernels (optim/ba.py) run unchanged per shard."""
    K = kf_pose.shape[0]
    return BAProblem(
        kf_pose=kf_pose, pt_xyz=pt_xyz, edge_kf=e_kf, edge_pt=e_pt,
        edge_uv=e_uv, edge_inv_sigma2=e_is2, edge_valid=e_val,
        kf_fixed=(jnp.zeros(K, bool) if kf_fixed is None else kf_fixed),
        edge_ur=e_ur, bf=bf)


def _local_blocks(cam, prob_s: BAProblem, use_huber: bool, K: int, Pn: int):
    """Per-shard GN block contributions (runs on each device's edge slice).
    Mono edges produce 2-row residuals; stereo edges 3-row (masked inside
    ba._edge_residuals, mirroring src/Optimizer.cc:338,575)."""
    e, Jp, Jl, z = ba_mod._edge_residuals(cam, prob_s)
    e_kf, e_pt = prob_s.edge_kf, prob_s.edge_pt
    chi2 = prob_s.edge_inv_sigma2 * jnp.sum(e * e, axis=-1)
    w = prob_s.edge_inv_sigma2
    if use_huber:
        w = w * huber_weight(chi2, ba_mod._chi2_gate(prob_s))
    w = jnp.where(prob_s.edge_valid, w, 0.0)
    wJp = Jp * w[:, None, None]
    wJl = Jl * w[:, None, None]
    Hpp = jnp.zeros((K, 6, 6)).at[e_kf].add(
        jnp.einsum("nij,nik->njk", wJp, Jp))
    Hll = jnp.zeros((Pn, 3, 3)).at[e_pt].add(
        jnp.einsum("nij,nik->njk", wJl, Jl))
    A = jnp.zeros((K, 6, Pn, 3)).at[e_kf, :, e_pt, :].add(
        jnp.einsum("nij,nik->njk", wJp, Jl))
    bp = jnp.zeros((K, 6)).at[e_kf].add(-jnp.einsum("nij,ni->nj", wJp, e))
    bl = jnp.zeros((Pn, 3)).at[e_pt].add(-jnp.einsum("nij,ni->nj", wJl, e))
    cost = jnp.sum(jnp.where(prob_s.edge_valid, chi2, 0.0))
    return Hpp, Hll, A, bp, bl, cost


def make_distributed_lm_step(cam: Camera, mesh: Mesh, K: int, Pn: int,
                             axis: str = "edge", use_huber: bool = True,
                             stereo: bool = False, bf: float = 0.0):
    """Build the jitted one-LM-iteration function for a given problem shape.

    Returned fn: (kf_pose, pt_xyz, kf_fixed, edge arrays..., lam) ->
    (new_kf_pose, new_pt_xyz, new_lam, cost). Edge arrays must carry the
    shardings from shard_edges; everything else is replicated. When
    stereo=True an edge_ur array is expected between edge_valid and lam.
    """
    e_specs = (P(axis),) * (6 if stereo else 5)

    def step(kf_pose, pt_xyz, kf_fixed, *edges_and_lam):
        *edges, lam = edges_and_lam
        if stereo:
            e_kf, e_pt, e_uv, e_is2, e_val, e_ur = edges
        else:
            e_kf, e_pt, e_uv, e_is2, e_val = edges
            e_ur = None

        def shard_fn(kf_pose, pt_xyz, *edges):
            if stereo:
                e_kf, e_pt, e_uv, e_is2, e_val, e_ur = edges
            else:
                e_kf, e_pt, e_uv, e_is2, e_val = edges
                e_ur = None
            prob_s = _shard_prob(cam, kf_pose, pt_xyz, e_kf, e_pt, e_uv,
                                 e_is2, e_val, e_ur, bf)
            blocks = _local_blocks(cam, prob_s, use_huber, K, Pn)
            # the only cross-device communication in the iteration:
            return jax.tree.map(lambda x: jax.lax.psum(x, axis), blocks)

        Hpp, Hll, A, bp, bl, cost0 = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P()) + e_specs,
            out_specs=P(),
        )(kf_pose, pt_xyz, *edges)

        eyeK = jnp.eye(6)
        eyeP = jnp.eye(3)
        Hpp_d = Hpp + lam * (Hpp * eyeK) + 1e-8 * eyeK
        Hll_d = Hll + lam * (Hll * eyeP) + 1e-8 * eyeP
        Hll_inv = _inv3x3(Hll_d)
        AW = jnp.einsum("kapi,pij->kapj", A, Hll_inv)
        S = -jnp.einsum("kapj,lbpj->kalb", AW, A)
        S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hpp_d)
        b_red = bp - jnp.einsum("kapj,pj->ka", AW, bl)
        free = (~kf_fixed).astype(S.dtype)
        S = S * free[:, None, None, None] * free[None, None, :, None]
        S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(
            kf_fixed[:, None, None].astype(S.dtype) * eyeK)
        b_red = b_red * free[:, None]
        dpose = jnp.linalg.solve(
            S.reshape(K * 6, K * 6) + 1e-8 * jnp.eye(K * 6),
            b_red.reshape(K * 6)).reshape(K, 6)
        At_dp = jnp.einsum("kapi,ka->pi", A, dpose)
        dpt = jnp.einsum("pij,pj->pi", Hll_inv, bl - At_dp)

        new_pose = se3.retract(kf_pose, dpose)
        new_pose = jnp.where(kf_fixed[:, None, None], kf_pose, new_pose)
        new_pts = pt_xyz + dpt

        # evaluate candidate cost (second small psum round)
        def cost_fn(kf_pose, pt_xyz, *edges):
            if stereo:
                e_kf, e_pt, e_uv, e_is2, e_val, e_ur = edges
            else:
                e_kf, e_pt, e_uv, e_is2, e_val = edges
                e_ur = None
            prob_s = _shard_prob(cam, kf_pose, pt_xyz, e_kf, e_pt, e_uv,
                                 e_is2, e_val, e_ur, bf)
            e, _, _, _ = ba_mod._edge_residuals(cam, prob_s,
                                                want_point=False)
            chi2 = e_is2 * jnp.sum(e * e, axis=-1)
            return jax.lax.psum(jnp.sum(jnp.where(e_val, chi2, 0.0)), axis)

        cost1 = jax.shard_map(
            cost_fn, mesh=mesh,
            in_specs=(P(), P()) + e_specs,
            out_specs=P(),
        )(new_pose, new_pts, *edges)

        improved = cost1 < cost0
        kf_out = jnp.where(improved, new_pose, kf_pose)
        pt_out = jnp.where(improved, new_pts, pt_xyz)
        lam_out = jnp.clip(jnp.where(improved, lam * 0.5, lam * 4.0),
                           1e-10, 1e8)
        return kf_out, pt_out, lam_out, jnp.minimum(cost0, cost1)

    return jax.jit(step)


def distributed_bundle_adjust(cam: Camera, prob: BAProblem, mesh: Mesh,
                              iters: int = 10, axis: str = None,
                              use_huber: bool = True):
    """Run `iters` distributed LM iterations; returns the refined problem.

    The multi-host entry point for BASELINE config 5: call with a mesh over
    all chips; edges pre-sharded via shard_edges. Stereo problems (edge_ur
    set) distribute the same way — the extra residual row shards with its
    edge.
    """
    axis = axis or mesh.axis_names[0]
    K = prob.kf_pose.shape[0]
    Pn = prob.pt_xyz.shape[0]
    sharded = shard_edges(prob, mesh, axis)
    stereo = prob.edge_ur is not None
    step = make_distributed_lm_step(cam, mesh, K, Pn, axis, use_huber,
                                    stereo=stereo, bf=float(prob.bf))
    kf_pose, pt_xyz = sharded.kf_pose, sharded.pt_xyz
    lam = jnp.float32(1e-4)
    edge_args = (sharded.edge_kf, sharded.edge_pt, sharded.edge_uv,
                 sharded.edge_inv_sigma2, sharded.edge_valid)
    if stereo:
        edge_args = edge_args + (sharded.edge_ur,)
    for _ in range(iters):
        kf_pose, pt_xyz, lam, cost = step(
            kf_pose, pt_xyz, sharded.kf_fixed, *edge_args, lam)
    # Snap rotations back onto SO(3) — matches optim/ba.py: downstream
    # tracking's motion model doubles any non-orthogonal component per
    # frame (see geom/se3.renormalize).
    return prob._replace(kf_pose=se3.renormalize(kf_pose), pt_xyz=pt_xyz)
