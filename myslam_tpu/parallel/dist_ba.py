"""Distributed bundle adjustment over a jax.sharding.Mesh.

The reference has NO distributed capability (single-process threads only,
SURVEY.md §2.4) — this is the greenfield TPU scale-out design of
BASELINE.json config 5, built on the SAME component-major scatter-free
Schur kernels as single-chip BA (optim/ba.py `_structured_schur_parts` /
`_structured_schur_solve` / `_structured_backsub` — the kernels that
replaced the 1.63 ms/iter [E,2,6]-tensor formulation with 0.28 ms/iter
flat panels).

Partitioning: LANDMARKS (and their point-major edge groups) are sharded
across the mesh; keyframe poses are replicated (tiny next to the edge
data). Because the problem is point-major structured (O observations per
landmark, mapping/local_mapping.build_global_ba), every landmark's edges
live wholly in one shard, so ALL landmark algebra — Hll blocks, their
closed-form inverses, bl, and the back-substitution — is shard-local with
zero communication. The only collectives per LM iteration are psums of
the reduced pose system:

    pose_part [42, K]  (Hpp | bp panel)
    S_red     [6K, 6K] (sum over local landmarks of A Hll^-1 A^T)
    b_corr    [6K]
    cost      scalar (x2: current + candidate)

For K = 256 that is ~10 MB over ICI per iteration — bandwidth noise —
while the O(E) edge work (residuals, Jacobians, panel assembly, the
[6K, P_local] Schur contractions) scales linearly with device count.
Every device solves the identical reduced 6Kx6K system (replicated
compute, cheaper than sharding a solve this small) and back-substitutes
its own landmark shard.

The whole LM loop (scan over iterations) runs inside ONE
jit(shard_map(...)) — a single dispatch regardless of iteration count.

Handles monocular 2D and stereo 3D edges (g2o EdgeStereoSE3ProjectXYZ
analogue, reference src/Optimizer.cc:570-607): edge_ur >= 0 marks a
stereo edge, exactly as optim/ba.py on one device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..geom import se3
from ..geom.projection import Camera
from ..optim import ba as ba_mod
from ..optim.ba import BAProblem


def to_point_major(prob: BAProblem, o_max: int | None = None):
    """Restructure an ARBITRARY edge list into the point-major layout the
    structured kernels require (edge_pt = repeat(arange(P), O), O slots
    per landmark, padding invalid).

    Host-side (numpy) — this is problem construction, not the hot loop;
    the production whole-map path (build_global_ba) already emits the
    structured layout and skips this entirely. Observations beyond o_max
    per landmark are dropped ONLY if o_max is given; by default O grows to
    the maximum observation count so nothing is lost."""
    e_pt = np.asarray(prob.edge_pt)
    e_kf = np.asarray(prob.edge_kf)
    valid = np.asarray(prob.edge_valid)
    Pn = prob.pt_xyz.shape[0]
    idx = np.nonzero(valid)[0]
    counts = np.bincount(e_pt[idx], minlength=Pn)
    O = int(counts.max()) if idx.size else 1
    if o_max is not None:
        O = min(O, o_max)
    O = max(O, 1)
    order = idx[np.argsort(e_pt[idx], kind="stable")]
    starts = np.concatenate([[0], np.cumsum(counts)])
    slot = np.arange(order.size) - np.repeat(starts[:-1], counts)
    keep = slot < O
    tab = np.full((Pn, O), -1, np.int64)
    tab[e_pt[order[keep]], slot[keep]] = order[keep]
    flat = tab.reshape(-1)
    safe = np.where(flat >= 0, flat, 0)

    def take(x, fill=0.0):
        out = np.asarray(x)[safe]
        out[flat < 0] = fill
        return jnp.asarray(out)

    E = Pn * O
    return prob._replace(
        edge_kf=take(e_kf, 0).astype(jnp.int32),
        edge_pt=jnp.asarray(
            np.repeat(np.arange(Pn, dtype=np.int32), O)),
        edge_uv=jnp.asarray(np.asarray(prob.edge_uv)[safe]
                            * (flat >= 0)[:, None]).reshape(E, 2),
        edge_inv_sigma2=take(prob.edge_inv_sigma2, 1.0),
        edge_valid=jnp.asarray((flat >= 0)
                               & np.asarray(prob.edge_valid)[safe]),
        edge_ur=(take(prob.edge_ur, -1.0)
                 if prob.edge_ur is not None else None),
    ), O


def _pad_points(prob: BAProblem, O: int, n_dev: int):
    """Pad the landmark axis (and its O-group edge rows) to a multiple of
    the mesh size; padding landmarks carry only invalid edges."""
    Pn = prob.pt_xyz.shape[0]
    pad = (-Pn) % n_dev
    if pad == 0:
        return prob
    Ep = pad * O

    def pad_edge(x, fill):
        w = ((0, Ep),) + ((0, 0),) * (x.ndim - 1)
        return jnp.pad(x, w, constant_values=fill)

    return prob._replace(
        pt_xyz=jnp.pad(prob.pt_xyz, ((0, pad), (0, 0))),
        edge_kf=pad_edge(prob.edge_kf, 0),
        edge_pt=jnp.asarray(
            np.repeat(np.arange(Pn + pad, dtype=np.int32), O)),
        edge_uv=pad_edge(prob.edge_uv, 0.0),
        edge_inv_sigma2=pad_edge(prob.edge_inv_sigma2, 1.0),
        edge_valid=pad_edge(prob.edge_valid, False),
        edge_ur=(pad_edge(prob.edge_ur, -1.0)
                 if prob.edge_ur is not None else None),
    )


_LM_CACHE = {}


def _make_dist_lm(cam, mesh, axis, O: int, use_huber: bool,
                  stereo: bool, bf: float):
    """Build (and cache) the jitted ONE-iteration LM step + cost program
    for one (camera, mesh, shape) configuration.

    One iteration per dispatch, looped on the host — deliberately NOT a
    lax.scan over all iterations: the scan-of-collectives megaprogram
    segfaulted the XLA:CPU compiler when built late in a long-lived
    process (reproducible at suite position, fine in isolation), and BA
    runs rarely enough that per-iteration dispatch cost is immaterial.
    """
    key = (tuple(float(np.asarray(v)) for v in
                 (cam.fx, cam.fy, cam.cx, cam.cy)),
           id(mesh), axis, O, use_huber, stereo, float(bf))
    if key in _LM_CACHE:
        return _LM_CACHE[key]

    e_spec = P(axis)
    in_specs_edges = (e_spec, e_spec, e_spec, e_spec)
    in_specs_edges = in_specs_edges + ((e_spec,) if stereo else (P(),))

    def mk_prob(kp, px, kf_fixed, e_kf, e_uv, e_is2, e_val, e_ur):
        Pl = px.shape[0]                  # landmarks on THIS shard
        edge_pt = jnp.repeat(jnp.arange(Pl, dtype=jnp.int32), O)
        return BAProblem(
            kf_pose=kp, pt_xyz=px, edge_kf=e_kf, edge_pt=edge_pt,
            edge_uv=e_uv, edge_inv_sigma2=e_is2, edge_valid=e_val,
            kf_fixed=kf_fixed, edge_ur=e_ur if stereo else None, bf=bf)

    def cost_body(kp, px, kf_fixed, e_kf, e_uv, e_is2, e_val, e_ur):
        c = ba_mod._robust_cost(
            cam, mk_prob(kp, px, kf_fixed, e_kf, e_uv, e_is2, e_val,
                         e_ur), use_huber, o_group=O)
        return jax.lax.psum(c, axis)

    def step_body(kp, px, lam, cost_c, kf_fixed, e_kf, e_uv, e_is2,
                  e_val, e_ur):
        prob_s = mk_prob(kp, px, kf_fixed, e_kf, e_uv, e_is2, e_val,
                         e_ur)
        parts, local = ba_mod._structured_schur_parts(
            cam, prob_s, lam, use_huber, O)
        # the ONLY cross-shard communication of the iteration
        parts = jax.tree.map(lambda x: jax.lax.psum(x, axis), parts)
        dpose = ba_mod._structured_schur_solve(parts, kf_fixed, lam)
        dpt = ba_mod._structured_backsub(local, dpose)
        new_kp = se3.retract(kp, dpose)
        new_kp = jnp.where(kf_fixed[:, None, None], kp, new_kp)
        new_px = px + dpt
        cost_n = cost_body(new_kp, new_px, kf_fixed, e_kf, e_uv, e_is2,
                           e_val, e_ur)
        improved = cost_n < cost_c
        kp2 = jnp.where(improved, new_kp, kp)
        px2 = jnp.where(improved, new_px, px)
        lam2 = jnp.clip(jnp.where(improved, lam * 0.5, lam * 4.0),
                        1e-10, 1e8)
        return kp2, px2, lam2, jnp.where(improved, cost_n, cost_c)

    cost_fn = jax.jit(jax.shard_map(
        cost_body, mesh=mesh,
        in_specs=(P(), P(axis), P()) + in_specs_edges, out_specs=P()))
    step_fn = jax.jit(jax.shard_map(
        step_body, mesh=mesh,
        in_specs=(P(), P(axis), P(), P(), P()) + in_specs_edges,
        out_specs=(P(), P(axis), P(), P())))
    _LM_CACHE[key] = (cost_fn, step_fn)
    return cost_fn, step_fn


def distributed_bundle_adjust(cam: Camera, prob: BAProblem, mesh: Mesh,
                              iters: int = 10, axis: str = None,
                              use_huber: bool = True,
                              o_group: int | None = None):
    """Run `iters` distributed LM iterations; returns the refined problem.

    The multi-host entry point for BASELINE config 5: call with a mesh
    over all chips. Pass o_group=O when the problem is already point-major
    structured (build_global_ba emits this); arbitrary edge lists are
    restructured host-side first (to_point_major). Stereo problems
    (edge_ur set) distribute the same way — the extra residual row shards
    with its point group.
    """
    axis = axis or mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    Pn0 = prob.pt_xyz.shape[0]
    if o_group is None:
        sprob, O = to_point_major(prob)
    else:
        sprob, O = prob, int(o_group)
    sprob = _pad_points(sprob, O, n_dev)
    stereo = sprob.edge_ur is not None
    e_ur = (sprob.edge_ur if stereo
            else jnp.zeros((n_dev,), jnp.float32))
    cost_fn, step_fn = _make_dist_lm(cam, mesh, axis, O,
                                     bool(use_huber), stereo,
                                     float(sprob.bf))
    edges = (sprob.edge_kf, sprob.edge_uv, sprob.edge_inv_sigma2,
             sprob.edge_valid, e_ur)
    kf_pose, pt_xyz = sprob.kf_pose, sprob.pt_xyz
    lam = jnp.float32(1e-4)
    cost_c = cost_fn(kf_pose, pt_xyz, sprob.kf_fixed, *edges)
    for _ in range(int(iters)):
        kf_pose, pt_xyz, lam, cost_c = step_fn(
            kf_pose, pt_xyz, lam, cost_c, sprob.kf_fixed, *edges)
    # Snap rotations back onto SO(3) — matches optim/ba.py: downstream
    # tracking's motion model doubles any non-orthogonal component per
    # frame (see geom/se3.renormalize).
    return prob._replace(kf_pose=se3.renormalize(kf_pose),
                         pt_xyz=pt_xyz[:Pn0])
