"""Batched relocalization: candidate detection + guided matching + PnP.

TPU-native replacement for the reference's relocalization pipeline:

- ``KeyFrameDatabase::DetectRelocalizationCandidates``
  (src/KeyFrameDatabase.cc:199-311): shared-word counting, the
  0.8x-max-common-words cut, covisibility-group score accumulation and
  best-of-group extraction — here a handful of dense [K]/[K,K] matmuls
  over the whole keyframe arena instead of inverted-file list walks.

- ``Tracking::Relocalization`` (src/Tracking.cc:1348-1509): per candidate
  BoW match -> PnP RANSAC -> pose optimization -> guided wide projection
  rematch (th=10, ORBdist=100) -> reoptimize -> narrow rematch (th=3,
  ORBdist=64) -> accept at nGood >= 50.  The reference iterates candidates
  on the host until one sticks; on the ~41 ms host<->device link that is
  ~0.3 s per attempt, so here ALL candidates run through every stage in one
  vmapped device program and the best survivor is selected on device.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom.projection import Camera
from ..mapping import map_store
from ..mapping.map_store import NO_POINT, MapStore
from ..matching import matcher, vocabulary
from ..matching.vocabulary import KeyFrameDatabase
from ..ops import hamming, indexing
from ..optim import pose_opt
from ..solvers import pnp as pnp_solver


def detect_candidates(db: KeyFrameDatabase, store: MapStore, vec,
                      n_cands: int = 8, group_k: int = 10, query_fn=None):
    """Relocalization candidate keyframes for a query BoW vector.

    Dense form of KeyFrameDatabase::DetectRelocalizationCandidates
    (src/KeyFrameDatabase.cc:199-311):
      1. keyframes sharing words with the query; drop those below
         0.8 * max shared-word count;
      2. L1-score the survivors;
      3. accumulate each survivor's score over its best-``group_k``
         covisibility group (neighbors only count if they are survivors);
      4. keep groups scoring > 0.75 * best group; each contributes its
         best single keyframe.

    query_fn: optional replacement for vocabulary.query_database with the
    same (db, vec) -> (scores, common) contract — a mesh-configured tracker
    passes the sharded query (parallel/loop_search.make_sharded_scores),
    whose padded rows are truncated here.

    Returns (ids [n_cands] i32, ok [n_cands] bool), ranked by group score.
    """
    scores, common = (query_fn or vocabulary.query_database)(db, vec)
    return _candidates_from_scores(scores, common, db.valid, store,
                                   n_cands, group_k)


@partial(jax.jit, static_argnames=("n_cands", "group_k"))
def _candidates_from_scores(scores, common, db_valid, store: MapStore,
                            n_cands: int = 8, group_k: int = 10):
    K = store.kf_cap
    scores = scores[:K]
    common = common[:K]
    alive = db_valid[:K] & store.kf_valid
    common = jnp.where(alive, common, 0)
    max_common = jnp.max(common).astype(jnp.float32)
    cand = alive & (common.astype(jnp.float32) > 0.8 * max_common) \
        & (common > 0)
    si = jnp.where(cand, scores, 0.0)                      # [K]

    # covisibility groups: self + best group_k neighbors
    W = map_store.covisibility(store).astype(jnp.float32)  # [K, K]
    W = jnp.where(alive[None, :] & alive[:, None], W, -1.0)
    nb_val, nb_ids = jax.lax.top_k(W, min(group_k, K))     # [K, g]
    nb_safe = jnp.where(nb_val > 0, nb_ids, -1)
    G = jnp.any(nb_safe[:, :, None] == jnp.arange(K)[None, None, :],
                axis=1) | jnp.eye(K, dtype=bool)

    acc = G.astype(jnp.float32) @ si                       # [K] group scores
    in_group = jnp.where(G, si[None, :], -1.0)
    gbest = jnp.argmax(in_group, axis=1)                   # [K] best member
    acc = jnp.where(cand, acc, -1.0)                       # groups of survivors
    keep = cand & (acc > 0.75 * jnp.max(acc))

    # candidate score of keyframe j = best group score among kept groups
    # whose best member is j (the reference's spCandidates dedup)
    M = indexing.onehot(jnp.where(keep, gbest, -1), K) > 0  # [K, K]
    kf_score = jnp.max(
        jnp.where(M, jnp.where(keep, acc, -1.0)[:, None], -1.0), axis=0)
    val, ids = jax.lax.top_k(kf_score, n_cands)
    return ids.astype(jnp.int32), val > 0


def _bow_match(store: MapStore, feats, kf_id):
    """Descriptor match frame <- keyframe's associated map points
    (ORBmatcher::SearchByBoW(KeyFrame*, Frame&, ...),
    src/ORBmatcher.cc:133-234 — the reference walks shared vocabulary
    nodes to shrink the candidate set; the full masked Hamming tile is the
    dense equivalent). Returns obs [F] point id per feature."""
    ref_obs = store.kf_obs[kf_id]
    ref_has = (ref_obs >= 0) & (
        indexing.mm_gather_int(store.pt_valid.astype(jnp.int32), ref_obs) > 0)
    d = hamming.hamming_matrix(store.kf_desc[kf_id], feats.desc)
    cand = ref_has[:, None] & feats.valid[None, :]
    b1, b2, idx = matcher.masked_best2(d, cand)
    ok = ((b1 <= matcher.TH_LOW)
          & (b1.astype(jnp.float32) < 0.7 * b2.astype(jnp.float32))
          & ref_has)
    ok = matcher.one_to_one(idx, b1, ok, feats.capacity)
    ok = matcher.rotation_consistency(
        store.kf_angle[kf_id],
        indexing.mm_gather(feats.angle[:, None], idx)[:, 0], ok)
    return indexing.mm_scatter_set(
        jnp.full(feats.capacity, NO_POINT, jnp.int32), idx, ref_obs, mask=ok)


def _guided_rematch(store: MapStore, cam: Camera, feats, kf_id, Tcw, obs,
                    th: float, th_desc: int, scale, n_levels):
    """SearchByProjection(F, KF, sFound, th, ORBdist)
    (src/ORBmatcher.cc:1472-1599): project the candidate keyframe's map
    points with the current pose estimate and add matches for points and
    features not already associated."""
    kf_obs = store.kf_obs[kf_id]
    p_valid = (kf_obs >= 0) & (
        indexing.mm_gather_int(store.pt_valid.astype(jnp.int32), kf_obs) > 0)
    # exclude points already found (sFound): point ids present in obs
    found = indexing.bincount_mm(obs, store.pt_cap) > 0
    p_valid = p_valid & ~(
        indexing.mm_gather_int(found.astype(jnp.int32), kf_obs) > 0)
    feats_free = feats.replace(valid=feats.valid & (obs < 0))
    idx, ok = matcher.search_by_projection_frame(
        cam, Tcw, feats_free,
        indexing.mm_gather(store.pt_xyz, kf_obs),
        indexing.mm_gather_u32(store.pt_desc, kf_obs),
        store.kf_level[kf_id], store.kf_angle[kf_id], p_valid,
        th=th, th_desc=th_desc, scale=scale, n_levels=n_levels)
    add = indexing.mm_scatter_set(
        jnp.full(feats.capacity, NO_POINT, jnp.int32), idx, kf_obs, mask=ok)
    return jnp.where(obs >= 0, obs, add)


class RelocResult(NamedTuple):
    ok: jnp.ndarray        # [] bool — a candidate reached the inlier gate
    Tcw: jnp.ndarray       # [3, 4] winning pose
    obs: jnp.ndarray       # [F] winning associations (inliers only)
    n_inliers: jnp.ndarray  # [] i32


@partial(jax.jit, static_argnames=("scale", "n_levels"))
def attempt(store: MapStore, cam: Camera, feats, cand_ids, cand_ok, key,
            bf=0.0, min_inliers=50, scale: float = 1.2, n_levels: int = 8):
    """Run the full relocalization ladder on every candidate at once and
    return the best survivor (Tracking::Relocalization,
    src/Tracking.cc:1398-1505, batched)."""
    C = cand_ids.shape[0]
    keys = jax.random.split(key, C)
    inv_s2 = 1.0 / store.level_sigma2(feats.level)

    def one(kf_id, k):
        kf_id = jnp.maximum(kf_id, 0)
        obs = _bow_match(store, feats, kf_id)
        n_bow = jnp.sum(obs >= 0)

        xyz = indexing.mm_gather(store.pt_xyz, obs)
        valid = (obs >= 0) & (indexing.mm_gather_int(
            store.pt_valid.astype(jnp.int32), obs) > 0)
        res = pnp_solver.solve_pnp(cam, xyz, feats.xy, inv_s2, valid, k)
        Tcw = res.Tcw
        obs1 = jnp.where(res.inliers, obs, NO_POINT)
        n1 = res.n_inliers

        # wide second chance when not enough inliers (th=10, ORBdist=100)
        obs_w = _guided_rematch(store, cam, feats, kf_id, Tcw, obs1,
                                th=10.0, th_desc=100,
                                scale=scale, n_levels=n_levels)
        use_wide = (n1 < min_inliers) & (n1 >= 10)
        obs2 = jnp.where(use_wide, obs_w, obs1)
        xyz2 = indexing.mm_gather(store.pt_xyz, obs2)
        v2 = (obs2 >= 0) & (indexing.mm_gather_int(
            store.pt_valid.astype(jnp.int32), obs2) > 0)
        Tcw2, inl2, n2 = pose_opt.optimize_pose(
            cam, Tcw, xyz2, feats.xy, inv_s2, v2,
            u_right=feats.u_right, bf=bf, escape_valley=False)
        obs2 = jnp.where(inl2, obs2, NO_POINT)

        # narrow final pass when close (th=3, ORBdist=64)
        obs_n = _guided_rematch(store, cam, feats, kf_id, Tcw2, obs2,
                                th=3.0, th_desc=64,
                                scale=scale, n_levels=n_levels)
        use_narrow = (n2 > min_inliers * 3 // 5) & (n2 < min_inliers)
        obs3 = jnp.where(use_narrow, obs_n, obs2)
        xyz3 = indexing.mm_gather(store.pt_xyz, obs3)
        v3 = (obs3 >= 0) & (indexing.mm_gather_int(
            store.pt_valid.astype(jnp.int32), obs3) > 0)
        Tcw3, inl3, n3 = pose_opt.optimize_pose(
            cam, Tcw2, xyz3, feats.xy, inv_s2, v3,
            u_right=feats.u_right, bf=bf)
        obs3 = jnp.where(inl3, obs3, NO_POINT)

        good = res.ok & (n_bow >= 15) & (n3 >= min_inliers)
        return Tcw3, obs3, n3.astype(jnp.int32), good

    Tcw_c, obs_c, n_c, good_c = jax.vmap(one)(cand_ids, keys)
    good_c = good_c & cand_ok
    rank = jnp.where(good_c, n_c, -1)
    best = jnp.argmax(rank)
    return RelocResult(
        ok=jnp.any(good_c),
        Tcw=Tcw_c[best],
        obs=obs_c[best],
        n_inliers=n_c[best],
    )
