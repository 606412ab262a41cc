"""Local mapping: the map-building pass that runs per inserted keyframe.

TPU-native replacement for the LocalMapping thread (reference
src/LocalMapping.cc): ProcessNewKeyFrame -> MapPointCulling ->
CreateNewMapPoints -> SearchInNeighbors(Fuse) -> LocalBA ->
KeyFrameCulling, re-expressed as pure functions over MapStore. The slam
layer decides when to run them (async device program instead of a thread).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..features.frame import FrameFeatures
from ..geom import se3, triangulation
from ..geom.projection import Camera
from ..matching import matcher
from ..ops import indexing
from ..optim import ba
from . import map_store
from .map_store import NO_POINT, MapStore

CHI2_MONO = 5.991


def kf_features(store: MapStore, kf_id) -> FrameFeatures:
    """View a keyframe's feature arrays as FrameFeatures (no copy of
    semantics: slicing arena rows)."""
    return FrameFeatures(
        xy=store.kf_xy[kf_id],
        xy_raw=store.kf_xy[kf_id],
        level=store.kf_level[kf_id],
        angle=store.kf_angle[kf_id],
        response=jnp.zeros_like(store.kf_angle[kf_id]),
        desc=store.kf_desc[kf_id],
        valid=store.kf_fvalid[kf_id],
    )


@partial(jax.jit, static_argnames=("n",))
def top_covisible(store: MapStore, kf_id, n: int):
    """Best-n covisible keyframes of kf_id by shared observations
    (KeyFrame::GetBestCovisibilityKeyFrames, src/KeyFrame.cc:160-170).
    Returns (ids [n], weights [n]) with -1/-0 padding below min weight 1."""
    W = map_store.covisibility(store)
    row = W[kf_id]
    row = jnp.where(store.kf_valid, row, -1)
    row = row.at[kf_id].set(-1)
    w, ids = jax.lax.top_k(row, n)
    ids = jnp.where(w > 0, ids, -1)
    return ids, jnp.maximum(w, 0)


@partial(jax.jit, static_argnames=("recent_window",))
def cull_points(store: MapStore, cur_kf_id, recent_window: int = 3):
    """MapPointCulling (src/LocalMapping.cc:172-207): recently created
    points must keep a found/visible ratio >= 0.25 and gain >= 3 observers
    within 2 keyframes of their creation. Ages measured in keyframe
    SEQUENCE numbers (pt_first_kf stores a seq, not an arena slot)."""
    cur = store.kf_seq[cur_kf_id]
    age = cur - store.pt_first_kf
    recent = store.pt_valid & (store.pt_first_kf >= 0) & (age <= recent_window)
    obs = map_store.observation_count(store)
    ratio = store.pt_found.astype(jnp.float32) / jnp.maximum(
        store.pt_visible.astype(jnp.float32), 1.0)
    bad = recent & (
        (ratio < 0.25)
        | ((age >= 2) & (obs <= 2))
    )
    return map_store.erase_points(store, bad)


def _triangulate_pair(store: MapStore, cam: Camera, kf1, kf2):
    """Match un-associated features of kf1/kf2 along the epipolar constraint
    and triangulate (the per-neighbor body of CreateNewMapPoints,
    src/LocalMapping.cc:209-454).

    Returns (feat1_idx [F], feat2_idx [F], xyz [F, 3], good [F]).
    """
    f1 = kf_features(store, kf1)
    f2 = kf_features(store, kf2)
    T1 = store.kf_pose[kf1]
    T2 = store.kf_pose[kf2]
    un1 = store.kf_obs[kf1] == NO_POINT
    un2 = store.kf_obs[kf2] == NO_POINT
    idx2, ok = matcher.search_for_triangulation(
        cam, f1, T1, f2, T2, un1, un2,
        scale=store.scale, n_levels=store.n_levels)

    P1 = triangulation.projection_matrix(cam, T1)
    P2 = triangulation.projection_matrix(cam, T2)
    x1 = f1.xy
    x2 = f2.xy[idx2]
    pts = triangulation.triangulate_dlt(P1[None], P2[None], x1, x2)

    # Gates (src/LocalMapping.cc:311-400): parallax, cheirality, reprojection
    # chi2 at the observation octave, scale-consistency between the two views.
    cos_par = triangulation.parallax_cos(T1, T2, pts)
    z1 = se3.transform(T1, pts)[:, 2]
    z2 = se3.transform(T2, pts)[:, 2]
    e1, _ = triangulation.reprojection_error_sq(cam, T1, pts, x1)
    e2, _ = triangulation.reprojection_error_sq(cam, T2, pts, x2)
    s2_1 = store.level_sigma2(f1.level)
    s2_2 = store.level_sigma2(f2.level[idx2])
    d1 = jnp.linalg.norm(pts - se3.camera_center(T1)[None], axis=-1)
    d2 = jnp.linalg.norm(pts - se3.camera_center(T2)[None], axis=-1)
    ratio_d = d1 / jnp.maximum(d2, 1e-9)
    ratio_octave = jnp.power(
        jnp.float32(store.scale),
        (f1.level - f2.level[idx2]).astype(jnp.float32))
    ratio_factor = 1.5 * store.scale
    scale_ok = (ratio_d < ratio_octave * ratio_factor) & (
        ratio_d * ratio_factor > ratio_octave)

    good = (
        ok
        & (cos_par < 0.9998) & (cos_par > 0)
        & (z1 > 0) & (z2 > 0)
        & (e1 < CHI2_MONO * s2_1) & (e2 < CHI2_MONO * s2_2)
        & scale_ok
        & jnp.all(jnp.isfinite(pts), axis=-1)
    )
    return jnp.arange(store.feat_cap), idx2, pts, good


def create_new_points(store: MapStore, cam: Camera, kf_id, neighbor_ids,
                      max_new_per_pair: int = 512):
    """Triangulate new map points between kf_id and each given neighbor
    (CreateNewMapPoints main loop over the 20 best covisible KFs,
    src/LocalMapping.cc:209-454 — the neighbor count is the caller's
    static budget). Pure-Python loop over neighbors; each body is jitted.
    """
    did_any = False
    for nb in neighbor_ids:
        if nb < 0:
            continue
        store = _triangulate_and_insert(
            store, cam, kf_id, int(nb), max_new_per_pair, refresh=False)
        did_any = True
    if did_any:
        own = store.kf_obs[kf_id]
        store = map_store.refresh_point_stats(
            store, jnp.where(own >= 0, own, -1))
    return store


@partial(jax.jit, static_argnames=("max_new", "refresh"))
def _triangulate_and_insert(store: MapStore, cam: Camera, kf1, kf2,
                            max_new: int, refresh: bool = True):
    f1_idx, f2_idx, pts, good = _triangulate_pair(store, cam, kf1, kf2)

    # baseline check (src/LocalMapping.cc:246-260): skip neighbor if the
    # baseline is tiny vs its median scene depth
    base = jnp.linalg.norm(
        se3.camera_center(store.kf_pose[kf1])
        - se3.camera_center(store.kf_pose[kf2]))
    med_depth = scene_median_depth(store, kf2)
    good = good & (base / jnp.maximum(med_depth, 1e-9) > 0.01)

    # Keep at most max_new by... all (static cap via top_k on goodness).
    score = good.astype(jnp.float32)
    _, sel = jax.lax.top_k(score, max_new)
    sel_good = jnp.take(good, sel)
    slots = map_store.allocate_points(store, sel_good)

    f1s = jnp.take(f1_idx, sel)
    f2s = jnp.take(f2_idx, sel)
    lvl1 = store.kf_level[kf1, f1s]
    store = map_store.write_points(
        store,
        slots,
        xyz=jnp.take(pts, sel, axis=0),
        desc=store.kf_desc[kf1, f1s],
        normal=jnp.zeros((max_new, 3)),
        min_dist=jnp.zeros(max_new),
        max_dist=jnp.ones(max_new),
        ref_kf=jnp.full(max_new, kf1, jnp.int32),
        ref_level=lvl1,
        first_kf=jnp.full(max_new, 1, jnp.int32) * store.kf_seq[kf1],
    )
    ok = slots >= 0
    store = map_store.set_observations(store, kf1, f1s, slots, ok)
    store = map_store.set_observations(store, kf2, f2s, slots, ok)
    if refresh:
        # callers that loop over several neighbor pairs pass refresh=False
        # and run ONE refresh of kf1's observations afterwards (which
        # covers every point created here — kf1 observes them all)
        store = map_store.refresh_point_stats(
            store, jnp.where(ok, slots, -1))
    return store


@jax.jit
def scene_median_depth(store: MapStore, kf_id):
    """Median depth of a keyframe's observed points
    (KeyFrame::ComputeSceneMedianDepth, src/KeyFrame.cc:633-665)."""
    obs = store.kf_obs[kf_id]
    pid = jnp.clip(obs, 0, store.pt_cap - 1)
    xyz = store.pt_xyz[pid]
    z = se3.transform(store.kf_pose[kf_id], xyz)[:, 2]
    ok = (obs >= 0) & store.pt_valid[pid]
    z_sorted = jnp.sort(jnp.where(ok, z, jnp.inf))
    n = jnp.sum(ok)
    med = z_sorted[jnp.maximum((n - 1) // 2, 0)]
    return jnp.where(n > 0, med, 1.0)


@partial(jax.jit, static_argnames=("th",))
@partial(jax.jit, static_argnames=("th",))
def fuse_into_keyframe(store: MapStore, cam: Camera, kf_id, pt_ids, pt_ok,
                       th: float = 1.0):
    """Project candidate points into keyframe kf_id, match, and either add
    the observation (feature free) or merge duplicate points (feature
    already associated) — ORBmatcher::Fuse (src/ORBmatcher.cc:825-975).

    pt_ids [M] candidate point ids, pt_ok [M] mask. th: search-radius
    multiplier (the reference uses 3.0 in SearchInNeighbors and 4.0 in
    the loop closer's SearchAndFuse, src/LoopClosing.cc:602).
    """
    feats = kf_features(store, kf_id)
    pid_c = jnp.clip(pt_ids, 0, store.pt_cap - 1)
    valid = pt_ok & (pt_ids >= 0) & store.pt_valid[pid_c]
    # skip candidates this keyframe already observes (the reference's
    # pMP->IsInKeyFrame(pKF) skip in ORBmatcher::Fuse) — matching such a
    # point onto a second feature would duplicate it within the row
    row = store.kf_obs[kf_id]
    member = indexing.bincount_mm(jnp.where(row >= 0, row, -1),
                                  store.pt_cap) > 0
    valid = valid & ~member[pid_c]
    idx, ok, _ = matcher.search_by_projection_map(
        cam, store.kf_pose[kf_id], feats,
        store.pt_xyz[pid_c], store.pt_desc[pid_c], store.pt_normal[pid_c],
        0.8 * store.pt_min_dist[pid_c], 1.2 * store.pt_max_dist[pid_c],
        valid, th=th, scale=store.scale, n_levels=store.n_levels)

    existing = store.kf_obs[kf_id, idx]          # current point at feature
    has_pt = ok & (existing >= 0) & (existing != pt_ids)
    free = ok & (existing == NO_POINT)

    # Merge: keep the point with more observations (src/ORBmatcher.cc:930-944).
    # Tie-break by arena index so two equal-count points can never each be
    # redirected to the other (merge cycle).
    obs_cnt = map_store.observation_count(store)
    cnt_e = obs_cnt[jnp.clip(existing, 0, store.pt_cap - 1)]
    cnt_c = obs_cnt[pid_c]
    keep_existing = (cnt_e > cnt_c) | ((cnt_e == cnt_c) & (existing < pt_ids))
    old_to_new = jnp.arange(store.pt_cap)
    # candidate -> existing where existing kept; existing -> candidate else
    src1 = jnp.where(has_pt & keep_existing, pt_ids, store.pt_cap)
    dst1 = jnp.where(has_pt & keep_existing, existing, 0)
    src2 = jnp.where(has_pt & ~keep_existing,
                     existing, store.pt_cap)
    dst2 = jnp.where(has_pt & ~keep_existing, pt_ids, 0)
    old_to_new = old_to_new.at[src1].set(dst1, mode="drop")
    old_to_new = old_to_new.at[src2].set(dst2, mode="drop")
    store = map_store.replace_points(store, old_to_new)

    # Add observation for free features.
    store = map_store.set_observations(
        store, kf_id, idx, pt_ids, free)
    return store


def second_order_neighbors(store: MapStore, kf_id, first_ids,
                           per_neighbor: int = 5):
    """Top-``per_neighbor`` covisible keyframes of each first-order
    neighbor, excluding kf_id and the first-order set itself
    (LocalMapping::SearchInNeighbors second-order harvest,
    src/LocalMapping.cc:463-475). Host helper; returns a python list."""
    first = [int(n) for n in np.asarray(first_ids) if int(n) >= 0]
    seen = set(first) | {int(kf_id)}
    out = []
    for nb in first:
        ids2, w2 = top_covisible(store, nb, per_neighbor)
        for n2, w in zip(np.asarray(ids2), np.asarray(w2)):
            n2 = int(n2)
            if n2 >= 0 and int(w) > 0 and n2 not in seen:
                out.append(n2)
                seen.add(n2)
    return out


def search_in_neighbors(store: MapStore, cam: Camera, kf_id, neighbor_ids,
                        second_order: int = 5):
    """Two-way fuse with first-order neighbors AND their top covisible
    neighbors (LocalMapping::SearchInNeighbors, src/LocalMapping.cc:456-536
    — the reference extends the target set with each neighbor's best 5
    covisible keyframes before fusing both directions)."""
    targets = [int(n) for n in np.asarray(neighbor_ids) if int(n) >= 0]
    if second_order > 0:
        targets = targets + second_order_neighbors(
            store, kf_id, targets, second_order)
    own_pts = store.kf_obs[kf_id]
    own_ok = own_pts >= 0
    for nb in targets:
        # forward: my points into neighbor
        store = fuse_into_keyframe(store, cam, nb, own_pts, own_ok)
        # backward: neighbor's points into me
        nb_pts = store.kf_obs[nb]
        store = fuse_into_keyframe(store, cam, kf_id, nb_pts, nb_pts >= 0)
    # refresh stats of all my points (they may have merged/gained views)
    own_pts = store.kf_obs[kf_id]
    store = map_store.refresh_point_stats(
        store, jnp.where(own_pts >= 0, own_pts, -1))
    return store


@partial(jax.jit, static_argnames=("scale_margin",))
def redundant_keyframes(store: MapStore, protect_id, scale_margin: int = 1):
    """KeyFrameCulling rule (src/LocalMapping.cc:634-720): a keyframe is
    redundant if >= 90% of its observed points are seen by at least 3 OTHER
    keyframes at the same or finer octave (level <= level_here +
    scale_margin). Returns [K] bool (protect_id always False)."""
    K, F = store.kf_obs.shape
    obs = store.kf_obs
    pid = jnp.clip(obs, 0, store.pt_cap - 1)
    has = (obs >= 0) & store.kf_valid[:, None]

    # For each observation (k, f): count other KFs seeing the same point at
    # level <= level(k,f)+margin. Build per-point level histogram-ish count
    # via the observation table of ALL points (bounded o_max).
    obs_kf, obs_feat, obs_ok = map_store.observation_table(
        store, jnp.arange(store.pt_cap), o_max=8)
    lv = store.kf_level[jnp.clip(obs_kf, 0, K - 1),
                        jnp.clip(obs_feat, 0, F - 1)]      # [P, O]
    lv = jnp.where(obs_ok, lv, 10_000)

    my_lv = store.kf_level                                  # [K, F]
    # count[k, f] = #{o: obs_kf[pid, o] != k and lv[pid, o] <= my_lv+margin}
    lv_p = lv[pid]                                          # [K, F, O]
    kf_p = obs_kf[pid]                                      # [K, F, O]
    cnt = jnp.sum(
        (kf_p != jnp.arange(K)[:, None, None])
        & (lv_p <= (my_lv + scale_margin)[:, :, None]), axis=-1)
    redundant_obs = has & (cnt >= 3)
    n_obs = jnp.sum(has, axis=1)
    n_red = jnp.sum(redundant_obs, axis=1)
    red = store.kf_valid & (n_obs > 0) & (
        n_red.astype(jnp.float32) > 0.9 * n_obs.astype(jnp.float32))
    red = red.at[protect_id].set(False)
    red = red.at[0].set(False)  # never cull the origin keyframe
    return red


# ---------------------------------------------------------------------------
# local bundle adjustment assembly
# ---------------------------------------------------------------------------

@partial(jax.jit,
         static_argnames=("k_free", "k_fixed", "p_max", "o_max", "stereo"))
def build_local_ba(store: MapStore, kf_id, k_free: int = 16,
                   k_fixed: int = 16, p_max: int = 4096, o_max: int = 12,
                   stereo: bool = False, bf: float = 0.0):
    """Assemble a compact BAProblem around keyframe kf_id
    (Optimizer::LocalBundleAdjustment problem construction,
    src/Optimizer.cc:456-534): free = kf_id + best covisible KFs (capped at
    k_free); points = union of their observations (capped p_max); fixed =
    other KFs observing those points (capped k_fixed).

    Returns (problem, kf_slots [k_free+k_fixed] arena ids, pt_slots [p_max]
    arena ids, edge_kf_feat [E] feature idx for observation erasure).
    """
    K = store.kf_cap
    W = map_store.covisibility(store)
    row = jnp.where(store.kf_valid, W[kf_id], -1).at[kf_id].set(-1)
    w, cov_ids = jax.lax.top_k(row, k_free - 1)
    free_ids = jnp.concatenate([jnp.array([kf_id]),
                                jnp.where(w > 0, cov_ids, -1)])
    is_free = jnp.zeros(K, bool).at[
        jnp.where(free_ids >= 0, free_ids, K)].set(True, mode="drop")

    # points observed by free KFs
    B = map_store.incidence(store)                      # [K, P]
    pt_local = jnp.any(B & is_free[:, None], axis=0)    # [P]
    _, pt_slots = jax.lax.top_k(pt_local.astype(jnp.float32), p_max)
    pt_on = jnp.take(pt_local, pt_slots)
    pt_slots = jnp.where(pt_on, pt_slots, -1)

    # fixed KFs: observe local points but are not free
    sees_local = jnp.sum(
        (B & pt_local[None, :]).astype(jnp.int32), axis=1)
    fixed_score = jnp.where(store.kf_valid & ~is_free, sees_local, -1)
    fw, fixed_ids = jax.lax.top_k(fixed_score, k_fixed)
    fixed_ids = jnp.where(fw > 0, fixed_ids, -1)

    kf_slots = jnp.concatenate([free_ids, fixed_ids])   # [k_free+k_fixed]
    n_kf = kf_slots.shape[0]
    kf_c = jnp.clip(kf_slots, 0, K - 1)
    kf_fixed = jnp.concatenate([
        jnp.zeros(k_free, bool), jnp.ones(k_fixed, bool)])
    # the origin keyframe stays fixed wherever it appears (gauge freedom,
    # src/Optimizer.cc:522,73-76)
    kf_fixed = kf_fixed | (kf_slots == 0)
    kf_fixed = kf_fixed | (kf_slots < 0)

    # edges via per-point observation tables restricted to selected KFs
    obs_kf, obs_feat, obs_ok = map_store.observation_table(
        store, pt_slots, o_max=o_max)                   # [p_max, O]
    scatter_idx = jnp.where(kf_slots >= 0, kf_slots, K)
    slot_of_kf = jnp.full(K, -1, jnp.int32).at[scatter_idx].set(
        jnp.arange(n_kf, dtype=jnp.int32), mode="drop")
    e_kf_slot = slot_of_kf[jnp.clip(obs_kf, 0, K - 1)]
    e_ok = obs_ok & (e_kf_slot >= 0) & (pt_slots >= 0)[:, None]

    E = pt_slots.shape[0] * o_max
    e_pt = jnp.broadcast_to(
        jnp.arange(p_max)[:, None], (p_max, o_max)).reshape(E)
    e_kf = jnp.clip(e_kf_slot, 0, n_kf - 1).reshape(E)
    fc = jnp.clip(obs_feat, 0, store.feat_cap - 1)
    e_uv = store.kf_xy[jnp.clip(obs_kf, 0, K - 1), fc].reshape(E, 2)
    e_lvl = store.kf_level[jnp.clip(obs_kf, 0, K - 1), fc].reshape(E)
    e_inv_s2 = 1.0 / store.level_sigma2(e_lvl)
    e_valid = e_ok.reshape(E)
    e_feat = fc.reshape(E)
    e_src_kf = jnp.clip(obs_kf, 0, K - 1).reshape(E)
    # stereo observations become 3D edges (g2o EdgeStereoSE3ProjectXYZ,
    # src/Optimizer.cc:570-607)
    e_ur = (store.kf_ur[jnp.clip(obs_kf, 0, K - 1), fc].reshape(E)
            if stereo else None)

    prob = ba.BAProblem(
        kf_pose=store.kf_pose[kf_c],
        pt_xyz=store.pt_xyz[jnp.clip(pt_slots, 0, store.pt_cap - 1)],
        edge_kf=e_kf,
        edge_pt=e_pt,
        edge_uv=e_uv,
        edge_inv_sigma2=e_inv_s2,
        edge_valid=e_valid,
        kf_fixed=kf_fixed,
        edge_ur=e_ur,
        bf=bf,
    )
    return prob, kf_slots, pt_slots, e_feat, e_src_kf


@jax.jit
def apply_local_ba(store: MapStore, prob: ba.BAProblem, inlier,
                   kf_slots, pt_slots, e_feat, e_src_kf):
    """Write optimized poses/points back into the arena and erase outlier
    observations (src/Optimizer.cc:709-760)."""
    K = store.kf_cap
    kf_ok = (kf_slots >= 0) & ~prob.kf_fixed
    kf_idx = jnp.where(kf_ok, kf_slots, K)
    store = store.replace(
        kf_pose=store.kf_pose.at[kf_idx].set(prob.kf_pose, mode="drop"))
    pt_ok = pt_slots >= 0
    pt_idx = jnp.where(pt_ok, pt_slots, store.pt_cap)
    store = store.replace(
        pt_xyz=store.pt_xyz.at[pt_idx].set(prob.pt_xyz, mode="drop"))

    # erase outlier observations: kf_obs[src_kf, feat] = NO_POINT
    bad = prob.edge_valid & ~inlier
    k_bad = jnp.where(bad, e_src_kf, K)
    f_bad = jnp.where(bad, e_feat, 0)
    store = store.replace(
        kf_obs=store.kf_obs.at[k_bad, f_bad].set(NO_POINT, mode="drop"))
    return store


def local_bundle_adjustment(store: MapStore, cam: Camera, kf_id,
                            k_free: int = 16, k_fixed: int = 16,
                            p_max: int = 4096, o_max: int = 12,
                            iters1: int = 10, iters2: int = 15,
                            stereo: bool = False, bf: float = 0.0):
    """Full local BA pass (Optimizer::LocalBundleAdjustment,
    src/Optimizer.cc:453-778): assemble -> two-phase LM with Schur ->
    write back + outlier erasure. Default iteration budget is higher than
    the reference's 5+10 because the batched LM uses accept/reject steps
    (a rejected step consumes an iteration where g2o's inner lambda loop
    retries within one)."""
    prob, kf_slots, pt_slots, e_feat, e_src_kf = build_local_ba(
        store, kf_id, k_free, k_fixed, p_max, o_max, stereo, bf)
    # o_group: build_local_ba emits point-major edges (o_max per point),
    # which enables the scatter-free structured assembly in optim/ba.py
    prob, inlier = ba.bundle_adjust(cam, prob, iters1, iters2,
                                    o_group=o_max)
    return apply_local_ba(store, prob, inlier, kf_slots, pt_slots,
                          e_feat, e_src_kf)


@partial(jax.jit, static_argnames=("o_max", "stereo"))
def build_global_ba(store: MapStore, o_max: int = 12, stereo: bool = False,
                    bf: float = 0.0):
    """Assemble the WHOLE-map BA problem (GlobalBundleAdjustemnt input,
    src/Optimizer.cc:41-54): every valid point with up to o_max of its
    observations, every valid keyframe free except the oldest (the gauge
    anchor — the reference fixes keyframe id 0, src/Optimizer.cc:73-76).

    Point-major structured edges (o_max per point) so the component-major
    Schur kernels in optim/ba.py apply. Problem shapes are the full arena
    capacities — static for XLA, masked by validity.
    """
    K = store.kf_cap
    P = store.pt_cap
    obs_kf, obs_feat, obs_ok = map_store.observation_table(
        store, jnp.arange(P), o_max)                     # [P, O]
    kf_c = jnp.clip(obs_kf, 0, K - 1)
    ft_c = jnp.clip(obs_feat, 0, store.feat_cap - 1)
    uv = store.kf_xy[kf_c, ft_c]                         # [P, O, 2]
    lvl = store.kf_level[kf_c, ft_c]
    inv_s2 = 1.0 / store.level_sigma2(lvl)
    valid = obs_ok & store.pt_valid[:, None]
    E = P * o_max

    seqs = jnp.where(store.kf_valid, store.kf_seq, jnp.int32(2**30))
    anchor = jnp.argmin(seqs)
    kf_fixed = ~store.kf_valid | (jnp.arange(K) == anchor)

    e_ur = store.kf_ur[kf_c, ft_c].reshape(E) if stereo else None
    return ba.BAProblem(
        kf_pose=store.kf_pose,
        pt_xyz=store.pt_xyz,
        edge_kf=kf_c.reshape(E),
        edge_pt=jnp.broadcast_to(
            jnp.arange(P)[:, None], (P, o_max)).reshape(E),
        edge_uv=uv.reshape(E, 2),
        edge_inv_sigma2=inv_s2.reshape(E),
        edge_valid=valid.reshape(E),
        kf_fixed=kf_fixed,
        edge_ur=e_ur,
        bf=bf,
    )


def global_bundle_adjustment(store: MapStore, cam: Camera, iters: int = 20,
                             o_max: int = 12, stereo: bool = False,
                             bf: float = 0.0, mesh=None):
    """True whole-map BA (GlobalBundleAdjustemnt, src/Optimizer.cc:41-54):
    single Huber phase over ALL valid keyframes and points, then write
    back. No silent coverage caps — the arena IS the problem.

    mesh: optional jax.sharding.Mesh — edges shard across devices and the
    Schur blocks reduce with psum (parallel/dist_ba.py; mono and stereo
    edges both distribute).
    """
    prob = build_global_ba(store, o_max, stereo, bf)
    if mesh is not None:
        from ..parallel import dist_ba
        # the problem is already point-major structured (o_max per
        # point), so the point-sharded kernels apply directly
        out = dist_ba.distributed_bundle_adjust(
            cam, prob, mesh, iters=iters, o_group=o_max)
    else:
        out = ba.run_lm(cam, prob, iters, use_huber=True, o_group=o_max)
        out = out._replace(kf_pose=se3.renormalize(out.kf_pose))
    return store.replace(
        kf_pose=jnp.where((store.kf_valid & ~prob.kf_fixed)[:, None, None],
                          out.kf_pose, store.kf_pose),
        pt_xyz=jnp.where(store.pt_valid[:, None], out.pt_xyz,
                         store.pt_xyz),
    )
