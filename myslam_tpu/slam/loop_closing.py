"""Loop detection, Sim3 computation and loop correction.

TPU-native replacement for LoopClosing (reference src/LoopClosing.cc) +
KeyFrameDatabase::DetectLoopCandidates (src/KeyFrameDatabase.cc:76-197):

- detection: dense BoW score of the new keyframe against EVERY stored
  keyframe at once (one broadcast L1 tile, matching/vocabulary.py) with the
  reference's gates (min covisible score, 0.8x shared-word cut), plus the
  3-consecutive-detection consistency check kept as tiny host state.
- geometric check: KF-KF descriptor match -> batched Horn Sim3 RANSAC ->
  guided Sim3 projection match -> Sim3 LM refinement with inlier gates
  (ComputeSim3, src/LoopClosing.cc:232-401).
- correction: propagate the corrective Sim3 to the current keyframe's
  covisible group, re-map their points, fuse duplicates, optimize the
  Sim3 pose graph over ALL keyframes, then run a (small-map) global BA
  (CorrectLoop, src/LoopClosing.cc:403-586 + RunGlobalBundleAdjustment
  :646-750; synchronous here — stages are programs, not threads).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional, Set

import jax
import jax.numpy as jnp
import numpy as np

from ..geom import se3, sim3
from ..geom.projection import Camera
from ..mapping import local_mapping, map_store
from ..mapping.map_store import NO_POINT, MapStore
from ..matching import matcher, vocabulary
from ..optim import ba, pose_graph, sim3_opt
from ..ops import hamming, indexing
from ..solvers import sim3_solver

MIN_MATCHES_BOW = 20     # src/LoopClosing.cc:262
MIN_INLIERS_SIM3 = 20    # src/LoopClosing.cc:369
MIN_TOTAL_MATCHES = 40   # src/LoopClosing.cc:389


@dataclass
class LoopState:
    """Host-side detector state: consistency groups + loop edges."""
    groups: List[tuple] = field(default_factory=list)  # (set_of_kf, count)
    loop_edges: List[tuple] = field(default_factory=list)  # (kf_a, kf_b)
    last_loop_kf: int = -10**9


@jax.jit
def _kf_bow_match(store: MapStore, kf1, kf2):
    """Descriptor match between two keyframes' point-associated features
    (ORBmatcher::SearchByBoW(KeyFrame*, KeyFrame*),
    src/ORBmatcher.cc:522-655 — full masked tile instead of BoW buckets).
    Returns (idx2 [F], ok [F]) mapping kf1 features -> kf2 features."""
    obs1 = store.kf_obs[kf1]
    obs2 = store.kf_obs[kf2]
    has1 = (obs1 >= 0) & store.pt_valid[jnp.clip(obs1, 0, store.pt_cap - 1)]
    has2 = (obs2 >= 0) & store.pt_valid[jnp.clip(obs2, 0, store.pt_cap - 1)]
    d = hamming.hamming_matrix(store.kf_desc[kf1], store.kf_desc[kf2])
    cand = has1[:, None] & has2[None, :]
    b1, b2, idx = matcher.masked_best2(d, cand)
    ok = (
        (b1 <= matcher.TH_LOW)
        & (b1.astype(jnp.float32) < 0.75 * b2.astype(jnp.float32))
        & has1
    )
    ok = matcher.one_to_one(idx, b1, ok, store.feat_cap)
    ok = matcher.rotation_consistency(
        store.kf_angle[kf1], store.kf_angle[kf2][idx], ok)
    return idx, ok


@jax.jit
def _sim3_match_growth(cam: Camera, store: MapStore, kf1, kf2,
                       R12, t12, s12, idx2, ok):
    """ORBmatcher::SearchBySim3 (src/ORBmatcher.cc:1102-1326): mutual
    Sim3-guided projection growth of the kf1<->kf2 match set before
    OptimizeSim3 — marginal loops whose BoW matches alone cannot reach
    the >= 20 inlier gate are recovered by these extra correspondences.

    Both directions project through the RANSAC Sim3 (th=7.5, ORB distance
    <= TH_HIGH, no view-angle gate) and a pair is accepted only on mutual
    agreement. Returns the grown (idx2, ok)."""
    F = store.feat_cap
    feats1 = local_mapping.kf_features(store, kf1)
    feats2 = local_mapping.kf_features(store, kf2)
    obs1, obs2 = store.kf_obs[kf1], store.kf_obs[kf2]
    pid1 = jnp.clip(obs1, 0, store.pt_cap - 1)
    pid2 = jnp.clip(obs2, 0, store.pt_cap - 1)
    v1 = (obs1 >= 0) & store.pt_valid[pid1]
    v2 = (obs2 >= 0) & store.pt_valid[pid2]
    # skip features/points that already carry a match (the reference skips
    # vpMatches12 / vbAlreadyMatched entries on both sides)
    matched2 = indexing.bincount_mm(jnp.where(ok, idx2, -1), F) > 0
    T1, T2 = store.kf_pose[kf1], store.kf_pose[kf2]

    def sim3_args(pid, vmask):
        return (store.pt_xyz[pid], store.pt_desc[pid], store.pt_normal[pid],
                store.pt_min_dist[pid], store.pt_max_dist[pid], vmask)

    # direction A: kf2's points into kf1's image  (S_1_w = S12 o T_2_w)
    RA = R12 @ se3.rotation(T2)
    tA = s12 * (R12 @ se3.translation(T2)) + t12
    idxA, okA = matcher.search_by_projection_sim3(
        cam, RA, tA, s12, feats1.replace(valid=feats1.valid & ~ok),
        *sim3_args(pid2, v2 & ~matched2), th=7.5,
        scale=store.scale, n_levels=store.n_levels,
        th_desc=matcher.TH_HIGH, view_cos_th=-2.0)
    # direction B: kf1's points into kf2's image  (S_2_w = S12^-1 o T_1_w)
    s21 = 1.0 / jnp.maximum(s12, 1e-9)
    R21 = R12.T
    t21 = -s21 * (R21 @ t12)
    RB = R21 @ se3.rotation(T1)
    tB = s21 * (R21 @ se3.translation(T1)) + t21
    idxB, okB = matcher.search_by_projection_sim3(
        cam, RB, tB, s21, feats2.replace(valid=feats2.valid & ~matched2),
        *sim3_args(pid1, v1 & ~ok), th=7.5,
        scale=store.scale, n_levels=store.n_levels,
        th_desc=matcher.TH_HIGH, view_cos_th=-2.0)

    # mutual agreement: kf2 obs slot m -> kf1 feature idxA[m]; accept iff
    # kf1 obs slot idxA[m] maps back to m (vnMatch2[vnMatch1[i1]] == i1)
    a_safe = jnp.clip(idxA, 0, F - 1)
    back = indexing.mm_gather_int(idxB[:, None], a_safe)[:, 0]
    back_ok = indexing.mm_gather_int(okB.astype(jnp.int32)[:, None],
                                     a_safe)[:, 0] > 0
    agree = okA & back_ok & (back == jnp.arange(F))
    idx2_new = indexing.mm_scatter_set(
        idx2, a_safe, jnp.arange(F, dtype=idx2.dtype), mask=agree)
    grown = indexing.mm_scatter_set(
        jnp.zeros(F, jnp.int32), a_safe, jnp.ones(F, jnp.int32),
        mask=agree) > 0
    return idx2_new, ok | grown


@jax.jit
def _rebuild_db_pass(vocab: vocabulary.Vocabulary, store: MapStore,
                     ids_pad, on, kf_capacity_rows):
    """Re-encode a padded batch of keyframes under a new vocabulary and
    build the whole dense database in ONE device program (the per-KF
    add_keyframe_bow loop costs ~4 dispatches x live keyframes on the
    tunnel — seconds per vocabulary retrain)."""
    def enc(k):
        fv = store.kf_fvalid[k]
        words = vocabulary.assign_words(vocab, store.kf_desc[k], fv)
        return vocabulary.bow_vector(vocab, words, fv)

    vecs = jax.vmap(enc)(jnp.clip(ids_pad, 0, store.kf_cap - 1))
    vecs = vecs * on[:, None]
    cap = kf_capacity_rows.shape[0]
    dst = jnp.where(on, ids_pad, cap)
    bow = jnp.zeros((cap, vecs.shape[1]), jnp.float32
                    ).at[dst].set(vecs, mode="drop")
    valid = jnp.zeros((cap,), bool).at[dst].set(on, mode="drop")
    return vocabulary.KeyFrameDatabase(bow=bow, has=bow > 0.0, valid=valid)


@jax.jit
def _kf_event_device_pass(vocab: vocabulary.Vocabulary,
                          db: vocabulary.KeyFrameDatabase,
                          store: MapStore, kf_id):
    """Everything the per-keyframe loop-closing event needs from the
    device, as ONE program: BoW encode + database add + all-rows query +
    covisibility. Split calls cost one ~41 ms tunnel round trip EACH."""
    fvalid = store.kf_fvalid[kf_id]
    words = vocabulary.assign_words(vocab, store.kf_desc[kf_id], fvalid)
    vec = vocabulary.bow_vector(vocab, words, fvalid)
    db2 = db.add(kf_id, vec)
    scores, common = vocabulary.query_database(db2, vec)
    W = map_store.covisibility(store)
    return db2, vec, scores, common, W


@jax.jit
def _merge_refined_points(store_now: MapStore, refined: MapStore, same_pt,
                          P_corr, delta):
    """Device half of finish_pending_gba: snapshot points take refined
    positions; points created during the GBA move with their reference
    keyframe's correction delta (x' = T_corr^-1 o T_now o x). Poses are
    snapped back onto SO(3) (see geom/se3.renormalize)."""
    K = store_now.kf_cap
    xyz = jnp.where(same_pt[:, None], refined.pt_xyz, store_now.pt_xyz)
    ref = jnp.clip(store_now.pt_ref_kf, 0, K - 1)
    D = indexing.mm_gather(delta.reshape(K, 12), ref).reshape(-1, 3, 4)
    moved = se3.transform(D, store_now.pt_xyz)
    new_pt = store_now.pt_valid & ~same_pt
    xyz = jnp.where(new_pt[:, None], moved, xyz)
    return store_now.replace(
        pt_xyz=xyz, kf_pose=se3.renormalize(P_corr))


@partial(jax.jit, static_argnames=("th",))
def _fuse_group(store: MapStore, cam: Camera, group_ids, loop_ids,
                th: float = 4.0):
    """SearchAndFuse over a padded group of keyframes as ONE device
    program (src/LoopClosing.cc:588-614): scan fuse_into_keyframe over
    group_ids (-1 = padding, skipped by cond). group_ids is padded to a
    small power-of-two bucket so recompiles are rare."""

    def body(st, g):
        st2 = jax.lax.cond(
            g >= 0,
            lambda s: local_mapping.fuse_into_keyframe(
                s, cam, jnp.maximum(g, 0), loop_ids, loop_ids >= 0, th=th),
            lambda s: s, st)
        return st2, None

    store, _ = jax.lax.scan(body, store, group_ids)
    return store


@partial(jax.jit, static_argnames=("e_max",))
def _essential_edges(kf_valid, kf_seq, kf_parent, W, Rw, tw, e_max: int):
    """Device-side essential-graph structural edges: SPANNING TREE
    (kf_parent, maintained by map_store across insertions AND culling
    re-parenting) + strong covisibility (w >= 100), with SE3 relative
    measurements from the pre-correction poses
    (Optimizer::OptimizeEssentialGraph edge harvest,
    src/Optimizer.cc:846-932 — the reference walks per-KF edge sets on
    the host; here one [K,K] mask + one top_k compaction).

    Keyframes with no recorded parent (maps loaded from older dumps, or
    a root separated by a reset) fall back to their sequential successor
    so the graph stays connected.

    Returns (edge_i, edge_j, on, meas_R, meas_t) with e_max rows.
    """
    K = kf_valid.shape[0]
    valid2 = kf_valid[:, None] & kf_valid[None, :]
    iota = jnp.arange(K)
    cov = (W >= 100) & valid2 & (iota[:, None] < iota[None, :])

    # spanning-tree edges child -> parent (KeyFrame::mpParent parity)
    par_ok = (kf_valid & (kf_parent >= 0)
              & kf_valid[jnp.clip(kf_parent, 0, K - 1)])
    par_mask = (jnp.zeros((K, K), bool)
                .at[iota, jnp.clip(kf_parent, 0, K - 1)].set(par_ok))

    # sequential successor fallback for parentless non-root keyframes
    seqs = jnp.where(kf_valid, kf_seq, jnp.int32(2**30))
    newer = (seqs[None, :] > seqs[:, None]) & valid2
    nxt = jnp.argmin(jnp.where(newer, seqs[None, :], 2**30), axis=1)
    has_nxt = jnp.any(newer, axis=1) & ~par_ok & kf_valid
    seq_mask = (jnp.zeros((K, K), bool)
                .at[iota, nxt].set(has_nxt))

    mask = cov | par_mask | seq_mask
    n_total = jnp.sum(mask.astype(jnp.int32))
    val, idx = jax.lax.top_k(mask.reshape(K * K).astype(jnp.float32),
                             e_max)
    on = val > 0
    ei = jnp.where(on, idx // K, 0)
    ej = jnp.where(on, idx - (idx // K) * K, 0)

    # S_ji = S_j o S_i^-1 at scale 1: R_ji = R_j R_i^T, t_ji = t_j - R_ji t_i
    Ri, Rj = Rw[ei], Rw[ej]
    ti, tj = tw[ei], tw[ej]
    R_ji = jnp.einsum("eab,ecb->eac", Rj, Ri)
    t_ji = tj - jnp.einsum("eab,eb->ea", R_ji, ti)
    # n_total lets the caller detect (and escalate past) the e_max cap —
    # a dense map can exceed 6K strong-covisibility edges, and silently
    # dropping them weakens exactly the loops that need the graph most
    return (ei.astype(jnp.int32), ej.astype(jnp.int32), on,
            R_ji, t_ji, n_total)


class LoopCloser:
    """Synchronous loop-closing pass, invoked per keyframe insertion."""

    def __init__(self, cam: Camera, vocab: vocabulary.Vocabulary,
                 kf_cap: int, consistency_th: int = 3,
                 cooldown_kfs: int = 10, fix_scale: bool = False,
                 bf: float = 0.0, mesh=None, async_gba: bool = False):
        self.cam = cam
        self.vocab = vocab
        # with a mesh, the [K, words] database rows shard across devices
        # and every BoW query runs as a sharded shard_map reduction
        # (parallel/loop_search.py) — the scale-out form of the reference's
        # inverted file (src/KeyFrameDatabase.cc:33-46)
        if mesh is not None:
            from ..parallel import loop_search
            self.db = loop_search.create_sharded_database(
                kf_cap, vocab.words.shape[0], mesh)
            self.query_db = loop_search.make_sharded_scores(mesh)
        else:
            self.db = vocabulary.KeyFrameDatabase.create(
                kf_cap, vocab.words.shape[0])
            self.query_db = vocabulary.query_database
        self.kf_cap = kf_cap
        self.state = LoopState()
        self.consistency_th = consistency_th
        self.cooldown_kfs = cooldown_kfs
        # stereo/RGB-D maps have metric scale: the loop Sim3 and the pose
        # graph must keep s = 1 (reference mbFixScale,
        # src/LoopClosing.cc:253 + src/Optimizer.cc:789-791)
        self.fix_scale = bool(fix_scale)
        self.bf = float(bf)
        # optional device mesh: global BA shards its edges across it
        self.mesh = mesh
        # async GBA (reference: GBA on its own thread, LoopClosing.cc:580,
        # 646-750): correct() dispatches the whole-map BA as a device
        # program WITHOUT blocking on it and returns the pose-graph-
        # corrected map immediately; the refined map is merged in at the
        # next keyframe event (Tracker calls finish_pending_gba), with
        # keyframes/points created meanwhile re-anchored through their
        # parents/reference keyframes.
        self.async_gba = bool(async_gba)
        self.pending_gba = None   # (snapshot_store, refined_store)
        self.rng = jax.random.PRNGKey(1)

    def _next_key(self):
        self.rng, k = jax.random.split(self.rng)
        return k

    # ------------------------------------------------------------------
    def add_keyframe_bow(self, store: MapStore, kf_id: int):
        """Compute + store the new keyframe's BoW vector (the database add
        the reference does at loop-detection time, src/LoopClosing.cc:135)."""
        words = vocabulary.assign_words(
            self.vocab, store.kf_desc[kf_id], store.kf_fvalid[kf_id])
        vec = vocabulary.bow_vector(self.vocab, words,
                                    store.kf_fvalid[kf_id])
        self.db = self.db.add(kf_id, vec)
        return vec

    def rebuild_vocabulary(self, store: MapStore, vocab, kf_ids):
        """Swap in a (re)trained vocabulary: rebuild the database by
        re-encoding every live keyframe. Consistency groups reset — scores
        under the old words are not comparable to the new ones."""
        self.vocab = vocab
        self.state.groups = []
        if self.mesh is not None:
            from ..parallel import loop_search
            self.db = loop_search.create_sharded_database(
                self.kf_cap, vocab.words.shape[0], self.mesh)
            for k in kf_ids:
                self.add_keyframe_bow(store, int(k))
            return
        # one device program for the whole rebuild (padded to a power of
        # two so retrains reuse a handful of cached compilations)
        cap = int(self.db.bow.shape[0])
        n_pad = 1 << (max(len(kf_ids), 1) - 1).bit_length()
        ids_pad = np.zeros(n_pad, np.int32)
        ids_pad[:len(kf_ids)] = np.asarray(kf_ids, np.int32)
        on = jnp.asarray(np.arange(n_pad) < len(kf_ids))
        self.db = _rebuild_db_pass(vocab, store, jnp.asarray(ids_pad), on,
                                   jnp.zeros(cap))

    def add_and_detect(self, store: MapStore, kf_id: int):
        """Per-keyframe database add + loop detection with MINIMAL
        host-device round trips: one fused device pass (BoW encode, db
        add, all-rows query, covisibility) + one device_get. The split
        add_keyframe_bow/detect path costs ~8 dispatches on a ~41 ms
        tunnel per keyframe event — this is the hot half of the full-
        pipeline chunk time. Returns (vec, candidate_or_None)."""
        if self.mesh is not None:
            vec = self.add_keyframe_bow(store, kf_id)
            return vec, self.detect(store, kf_id, vec)
        db2, vec, scores, common, W = _kf_event_device_pass(
            self.vocab, self.db, store, jnp.int32(kf_id))
        self.db = db2
        scores, common, W, seqs = jax.device_get(
            (scores, common, W, store.kf_seq))
        cand = self._detect_host(store, kf_id, np.asarray(scores).copy(),
                                 np.asarray(common).copy(),
                                 np.asarray(W), np.asarray(seqs))
        return vec, cand

    def detect(self, store: MapStore, kf_id: int, vec) -> Optional[int]:
        """DetectLoop (src/LoopClosing.cc:104-230). Returns a consistent
        candidate keyframe id or None."""
        W = np.asarray(map_store.covisibility(store))
        scores, common = self.query_db(self.db, vec)
        # sharded databases pad the row axis to the mesh size
        scores = np.asarray(scores)[:store.kf_cap].copy()
        common = np.asarray(common)[:store.kf_cap].copy()
        return self._detect_host(store, kf_id, scores, common, W,
                                 np.asarray(store.kf_seq))

    def _detect_host(self, store: MapStore, kf_id: int, scores, common,
                     W, seqs) -> Optional[int]:
        """Host half of DetectLoop: gating + the 3-consecutive-group
        consistency check on already-fetched arrays."""
        if int(seqs[kf_id]) < self.state.last_loop_kf + self.cooldown_kfs:
            return None
        cov_row = W[kf_id]
        covisible = cov_row >= 15
        cov_ids = np.nonzero(covisible)[0]

        # min reference score = lowest BoW score against covisible KFs
        min_score = min((scores[c] for c in cov_ids), default=0.3)
        min_score = max(min_score, 0.0)

        # exclude self + covisible neighborhood
        scores[kf_id] = -1.0
        scores[cov_ids] = -1.0
        # also exclude temporally-recent keyframes (the reference excludes
        # covisible ones; with few KFs recency is the equivalent guard)
        recent = seqs > int(seqs[kf_id]) - 5
        scores[recent] = -1.0

        max_common = common[scores > 0].max() if (scores > 0).any() else 0
        cand_mask = (scores >= max(min_score, 0.01)) & (
            common >= 0.8 * max_common) & (scores > 0)
        cands = set(np.nonzero(cand_mask)[0].tolist())
        if not cands:
            self.state.groups = []
            return None

        # 3-consecutive-KF consistency: a candidate's covisibility group
        # must intersect a group seen in the previous detections
        # (src/LoopClosing.cc:169-225)
        W_np = np.asarray(W)
        new_groups = []
        consistent = None
        for c in sorted(cands):
            group = set(np.nonzero(W_np[c] >= 15)[0].tolist()) | {c}
            count = 1
            for g, n in self.state.groups:
                if group & g:
                    count = max(count, n + 1)
            new_groups.append((group, count))
            if count >= self.consistency_th and consistent is None:
                consistent = c
        self.state.groups = new_groups
        return consistent

    # ------------------------------------------------------------------
    def compute_sim3(self, store: MapStore, kf_id: int, cand: int):
        """ComputeSim3 (src/LoopClosing.cc:232-401). Returns corrective
        (R, t, s) mapping candidate-camera coords into current-camera
        coords (S_cur_cand), plus matched point pairs, or None."""
        idx2, ok = _kf_bow_match(store, kf_id, cand)
        n = int(ok.sum())
        if n < MIN_MATCHES_BOW:
            return None

        def match_arrays(idx2, ok):
            obs1 = store.kf_obs[kf_id]
            obs2 = store.kf_obs[cand]
            pid1 = jnp.clip(obs1, 0, store.pt_cap - 1)
            pid2 = jnp.clip(obs2[idx2], 0, store.pt_cap - 1)
            # camera-frame positions of the matched points
            p1 = se3.transform(store.kf_pose[kf_id], store.pt_xyz[pid1])
            p2 = se3.transform(store.kf_pose[cand], store.pt_xyz[pid2])
            uv1 = store.kf_xy[kf_id]
            uv2 = store.kf_xy[cand][idx2]
            s2_1 = store.level_sigma2(store.kf_level[kf_id])
            s2_2 = store.level_sigma2(store.kf_level[cand][idx2])
            return p1, p2, uv1, uv2, s2_1, s2_2

        p1, p2, uv1, uv2, s2_1, s2_2 = match_arrays(idx2, ok)
        res = sim3_solver.solve_sim3(
            self.cam, self.cam, p1, p2, uv1, uv2,
            9.210 * s2_1, 9.210 * s2_2, ok, self._next_key(),
            min_inliers=MIN_INLIERS_SIM3, fix_scale=self.fix_scale)
        if not bool(res.ok):
            return None

        # mutual Sim3-guided match growth (ORBmatcher::SearchBySim3,
        # src/LoopClosing.cc:350-355) before the >= 20 inlier gate
        idx2, ok_grown = _sim3_match_growth(
            self.cam, store, kf_id, cand, res.R12, res.t12, res.s12,
            idx2, ok)
        p1, p2, uv1, uv2, s2_1, s2_2 = match_arrays(idx2, ok_grown)
        inliers0 = res.inliers | (ok_grown & ~ok)

        # refine with paired-projection LM (OptimizeSim3)
        R, t, s, inlier, n_in = sim3_opt.optimize_sim3(
            self.cam, self.cam, res.R12, res.t12, res.s12,
            p1, p2, uv1, uv2, 1.0 / s2_1, 1.0 / s2_2, inliers0,
            fix_scale=self.fix_scale)
        if int(n_in) < MIN_INLIERS_SIM3:
            return None

        # guided projection of the loop neighborhood through Scw
        # (src/LoopClosing.cc:375-400): Scw = S_cur_cand * T_cand_w
        T_cand = store.kf_pose[cand]
        Scw_R = R @ se3.rotation(T_cand)
        Scw_t = s * (R @ se3.translation(T_cand)) + t
        Scw_s = s
        # candidate neighborhood points
        Wc = map_store.covisibility(store)
        nb = np.nonzero(np.asarray(Wc[cand]) >= 15)[0].tolist() + [cand]
        nb_pts = np.unique(np.concatenate(
            [np.asarray(store.kf_obs[k]) for k in nb]))
        nb_pts = nb_pts[nb_pts >= 0]
        m = len(nb_pts)
        if m == 0:
            return None
        cap = 4096
        pad = np.full(max(0, cap - m), -1, np.int64)
        nb_ids = jnp.asarray(np.concatenate([nb_pts[:cap], pad]))
        pidn = jnp.clip(nb_ids, 0, store.pt_cap - 1)
        feats = local_mapping.kf_features(store, kf_id)
        idx_p, ok_p = matcher.search_by_projection_sim3(
            self.cam, Scw_R, Scw_t, Scw_s, feats,
            store.pt_xyz[pidn], store.pt_desc[pidn], store.pt_normal[pidn],
            0.8 * store.pt_min_dist[pidn], 1.2 * store.pt_max_dist[pidn],
            (nb_ids >= 0) & store.pt_valid[pidn],
            scale=store.scale, n_levels=store.n_levels)
        # accept on the TOTAL match count: Sim3 inliers + guided projections
        # (the reference counts all vpMapPointMatches after SearchByProjection,
        # src/LoopClosing.cc:376-400)
        total = int(n_in) + int(ok_p.sum())
        if total < MIN_TOTAL_MATCHES:
            return None
        return (np.asarray(R), np.asarray(t), float(s))

    # ------------------------------------------------------------------
    def correct(self, store: MapStore, cam: Camera, kf_id: int, cand: int,
                S_cur_cand) -> MapStore:
        """CorrectLoop (src/LoopClosing.cc:403-586): Sim3 correction
        propagation + pose-graph optimization + global BA."""
        import os as _os
        import time as _time
        import sys as _sys
        _dbg = _os.environ.get("MYSLAM_LOOP_DEBUG", "") == "1"
        _t0 = [_time.perf_counter()]

        def _tick(label):
            if _dbg:
                t = _time.perf_counter()
                print(f"# loop-correct {label}: {t - _t0[0]:.1f}s",
                      file=_sys.stderr, flush=True)
                _t0[0] = t
        R12, t12, s12 = S_cur_cand
        K = store.kf_cap
        kf_valid = np.asarray(store.kf_valid)

        # --- current Siw (scale 1) for every KF ---
        Rw = np.asarray(store.kf_pose[:, :, :3]).copy()
        tw = np.asarray(store.kf_pose[:, :, 3]).copy()
        sw = np.ones(K, np.float32)

        # corrected Sim3 of the current KF:
        # S_cur_w(corr) = S_cur_cand * S_cand_w
        Rc = (R12 @ Rw[cand]).astype(np.float32)
        tc = (s12 * (R12 @ tw[cand]) + t12).astype(np.float32)
        sc = np.float32(s12)

        # propagate to the current KF's covisible group via relative poses
        # (src/LoopClosing.cc:444-474): S_i_w(corr) = S_i_cur * S_cur_w(corr)
        W = np.asarray(map_store.covisibility(store))
        group = set(np.nonzero(W[kf_id] >= 15)[0].tolist()) | {kf_id}
        R_new, t_new, s_new = Rw.copy(), tw.copy(), sw.copy()
        for g in group:
            # relative SE3 S_g_cur (scale 1), then Sim3 compose:
            # S_g_w(corr) = S_g_cur ∘ S_cur_w(corr)
            R_rel = Rw[g] @ Rw[kf_id].T
            t_rel = tw[g] - R_rel @ tw[kf_id]
            R_new[g] = (R_rel @ Rc).astype(np.float32)
            t_new[g] = (R_rel @ tc + t_rel).astype(np.float32)
            s_new[g] = sc

        # re-map the group's points with old/new Sim3 of their observing KF
        # (src/LoopClosing.cc:476-510). Full-arena STATIC shapes: slicing
        # to the dynamic pt_ids count compiled a fresh ~10 s program per
        # loop event (the count never repeats); one pull of kf_obs plus
        # a masked whole-arena correction reuses one cached program.
        group_arr = np.array(sorted(group), np.int64)
        kf_obs_np, pt_ref_np = jax.device_get(
            (store.kf_obs, store.pt_ref_kf))
        pt_mask = np.zeros(store.pt_cap, bool)
        for g in group_arr:
            o = kf_obs_np[g]
            pt_mask[o[o >= 0]] = True
        if pt_mask.any():
            # use each point's OWN ref kf if in group else current kf
            ref = np.where(np.isin(pt_ref_np, group_arr)
                           & (pt_ref_np >= 0), pt_ref_np, kf_id)
            S_old = (jnp.asarray(Rw), jnp.asarray(tw), jnp.asarray(sw))
            S_new = (jnp.asarray(R_new), jnp.asarray(t_new),
                     jnp.asarray(s_new))
            new_xyz = pose_graph.correct_points(
                store.pt_xyz, jnp.asarray(ref), S_old, S_new)
            store = store.replace(
                pt_xyz=jnp.where(jnp.asarray(pt_mask)[:, None], new_xyz,
                                 store.pt_xyz))

        # write corrected SE3 poses for the group in ONE transfer
        # (T = [R | t/s]; per-keyframe .at[].set dispatches each cost a
        # full host-device round trip on the tunnel)
        kf_pose_np = np.asarray(store.kf_pose).copy()
        for g in group:
            kf_pose_np[g] = np.concatenate(
                [R_new[g], (t_new[g] / s_new[g])[:, None]], 1)
        store = store.replace(kf_pose=jnp.asarray(kf_pose_np))

        _tick("propagate+write")
        # SearchAndFuse (src/LoopClosing.cc:588-614): project the LOOP
        # NEIGHBORHOOD's points (candidate + its covisible group) into
        # EVERY keyframe of the corrected group with the reference's wide
        # radius (th=4.0). These merges are what anchor the corrected
        # poses to the old structure — without enough cross-loop
        # associations the subsequent GBA cannot pull the smeared
        # pose-graph solution back onto the map.
        # covisibility rows are already in W (poses moved, observations
        # did not); kf_obs_np was pulled above — no per-keyframe pulls
        loop_kfs = set(np.nonzero(W[cand] >= 15)[0].tolist()) | {cand}
        loop_mask = np.zeros(store.pt_cap, bool)
        for g in loop_kfs:
            o = kf_obs_np[g]
            loop_mask[o[o >= 0]] = True
        loop_ids_np = np.nonzero(loop_mask)[0]
        # sized to the arena so no loop point is silently dropped (the
        # cross-loop merges anchor the GBA; a truncated set would shrink
        # coverage exactly on the large maps that need it most)
        cap = int(store.pt_cap)
        pad = np.full(max(0, cap - len(loop_ids_np)), -1, np.int64)
        loop_ids = jnp.asarray(
            np.concatenate([loop_ids_np[:cap], pad]).astype(np.int32))
        # ONE device program for the whole group fuse: a per-keyframe
        # Python loop costs ~6 dispatches x group size on the ~41 ms
        # tunnel (measured 130-330 s chunk stalls when loop events fired)
        bucket = 8
        while bucket < len(group):
            bucket *= 2
        gpad = np.full(bucket, -1, np.int32)
        gpad[:len(group)] = sorted(group)
        store = _fuse_group(store, cam, jnp.asarray(gpad), loop_ids)
        fused_own = store.kf_obs[kf_id]
        store = map_store.refresh_point_stats(
            store, jnp.where(fused_own >= 0, fused_own, -1))

        _tick("group-fuse")
        # --- essential-graph optimization (src/LoopClosing.cc:568) ---
        store = self._optimize_essential_graph(
            store, kf_id, cand, (R_new, t_new, s_new), (Rw, tw, sw), group)

        _tick("essential-graph")
        # --- global BA (src/LoopClosing.cc:580) ---
        if self.async_gba:
            # a newer loop supersedes any still-pending refinement (the
            # reference aborts the running GBA, LoopClosing.cc:577-583)
            self.pending_gba = None
            refined = self._global_ba(store, cam)
            if refined is not store:
                # async dispatch: tracking continues on the pose-graph-
                # corrected map; merged at the next keyframe event
                self.pending_gba = (store, refined)
        else:
            store = self._global_ba(store, cam)

        _tick("global-ba-dispatch")
        self.state.loop_edges.append((kf_id, cand))
        self.state.last_loop_kf = int(store.kf_seq[kf_id])
        return store

    # ------------------------------------------------------------------
    def finish_pending_gba(self, store_now: MapStore) -> MapStore:
        """Merge a completed async global BA into the CURRENT map (the
        reference's post-GBA correction propagation,
        src/LoopClosing.cc:646-750): keyframes that existed at the GBA
        snapshot take their refined poses; keyframes inserted since are
        re-anchored through their spanning-tree parents
        (T_child * T_parent^-1 * T_parent_refined); points from the
        snapshot take refined positions, newer points move with their
        reference keyframe's correction. Blocks on the GBA result —
        callers invoke this at a keyframe event, by which time the device
        program has almost always drained."""
        if self.pending_gba is None:
            return store_now
        snap, refined = self.pending_gba
        self.pending_gba = None
        K = store_now.kf_cap

        kv_snap = np.asarray(snap.kf_valid)
        kv_now = np.asarray(store_now.kf_valid)
        seq_snap = np.asarray(snap.kf_seq)
        seq_now = np.asarray(store_now.kf_seq)
        same_kf = kv_snap & kv_now & (seq_snap == seq_now)
        parent = np.asarray(store_now.kf_parent)
        P_now = np.asarray(store_now.kf_pose)
        P_ref = np.asarray(refined.kf_pose)

        def comp(Ta, Tb):
            R = Ta[:3, :3] @ Tb[:3, :3]
            t = Ta[:3, :3] @ Tb[:3, 3] + Ta[:3, 3]
            return np.concatenate([R, t[:, None]], 1)

        def inv(T):
            Rt = T[:3, :3].T
            return np.concatenate([Rt, (-Rt @ T[:3, 3])[:, None]], 1)

        P_corr = P_now.copy()
        P_corr[same_kf] = P_ref[same_kf]
        for k in np.nonzero(kv_now & ~same_kf)[0]:
            a, hops = int(parent[k]), 0
            while a >= 0 and not same_kf[a] and hops < K:
                a, hops = int(parent[a]), hops + 1
            if a >= 0 and same_kf[a]:
                P_corr[k] = comp(comp(P_now[k], inv(P_now[a])), P_ref[a])
            # else: no refined ancestor (disconnected) — keep as tracked

        # per-slot delta T_corr^-1 o T_now moves everything anchored to
        # that keyframe from the tracked frame into the refined frame
        delta = np.stack([comp(inv(P_corr[k]), P_now[k]) if kv_now[k]
                          else np.eye(3, 4, dtype=np.float32)
                          for k in range(K)]).astype(np.float32)

        pf_snap = np.asarray(snap.pt_first_kf)
        pf_now = np.asarray(store_now.pt_first_kf)
        same_pt = (np.asarray(snap.pt_valid) & np.asarray(store_now.pt_valid)
                   & (pf_snap == pf_now))
        return _merge_refined_points(
            store_now, refined, jnp.asarray(same_pt),
            jnp.asarray(P_corr), jnp.asarray(delta))

    # ------------------------------------------------------------------
    def _optimize_essential_graph(self, store: MapStore, kf_id, cand,
                                  S_corr, S_old, group):
        """Pose graph over all valid KFs: covisibility edges (w>=100),
        sequential edges, and the new loop edge
        (Optimizer::OptimizeEssentialGraph, src/Optimizer.cc:781-1044)."""
        K = store.kf_cap
        kf_valid = np.asarray(store.kf_valid)
        R0, t0, s0 = S_corr  # starting estimates: corrected where in group
        Rw, tw, sw = S_old

        # structural edges (sequential + covisibility w>=100) harvested on
        # device — the host O(K^2) loop version cost ~33k iterations at
        # K=256 plus one jnp compose round-trip per edge
        W = map_store.covisibility(store)
        # no silent caps: escalate e_max until every structural edge fits
        # (doubling keeps the number of compiled sizes logarithmic)
        e_max = min(6 * K, K * K)
        while True:
            ei, ej, on, mRd, mtd, n_tot = _essential_edges(
                store.kf_valid, store.kf_seq, store.kf_parent, W,
                jnp.asarray(Rw), jnp.asarray(tw), e_max=e_max)
            if int(n_tot) <= e_max or e_max >= K * K:
                break
            e_max = min(2 * e_max, K * K)
        msd = jnp.ones(ei.shape[0], jnp.float32)

        def rel_measure(i, j, Ri, ti, si, Rj, tj, sj):
            """S_ji = S_j_w * S_i_w^-1 for the host-tracked loop edges."""
            Sj = (jnp.asarray(Rj), jnp.asarray(tj), jnp.asarray(float(sj)))
            Si = (jnp.asarray(Ri), jnp.asarray(ti), jnp.asarray(float(si)))
            S = sim3.compose(Sj, sim3.inverse(Si))
            return np.asarray(S[0]), np.asarray(S[1]), float(S[2])

        edges_i, edges_j, mR, mt, ms = [], [], [], [], []
        # prior loop edges (a handful, host state)
        for a, b in self.state.loop_edges:
            if kf_valid[a] and kf_valid[b]:
                edges_i.append(a); edges_j.append(b)
                r, t_, s_ = rel_measure(a, b, Rw[a], tw[a], 1.0,
                                        Rw[b], tw[b], 1.0)
                mR.append(r); mt.append(t_); ms.append(s_)
        # THE loop edge, measured with the corrected relative transform
        edges_i.append(cand); edges_j.append(kf_id)
        r, t_, s_ = rel_measure(cand, kf_id, Rw[cand], tw[cand], 1.0,
                                R0[kf_id], t0[kf_id], s0[kf_id])
        mR.append(r); mt.append(t_); ms.append(s_)

        # pad the host-tracked loop edges to a power-of-two bucket: the
        # raw count grows by one per loop closure, and every distinct
        # edge-array length is a fresh pose-graph compile (~20 s on the
        # tunnel); buckets keep the compiled-shape set logarithmic
        M = len(edges_i)
        Mpad = 1 << max(3, (M - 1).bit_length())
        pad_n = Mpad - M
        ei_h = np.zeros(Mpad, np.int32)
        ej_h = np.zeros(Mpad, np.int32)
        ei_h[:M] = edges_i
        ej_h[:M] = edges_j
        mR_h = np.tile(np.eye(3, dtype=np.float32), (Mpad, 1, 1))
        mR_h[:M] = np.stack(mR).astype(np.float32)
        mt_h = np.zeros((Mpad, 3), np.float32)
        mt_h[:M] = np.stack(mt).astype(np.float32)
        ms_h = np.ones(Mpad, np.float32)
        ms_h[:M] = np.array(ms, np.float32)
        on_h = np.zeros(Mpad, bool)
        on_h[:M] = True

        fixed = np.zeros(K, bool)
        fixed[cand] = True           # loop KF fixed (src/Optimizer.cc:820)
        fixed[~kf_valid] = True

        prob = pose_graph.PoseGraphProblem(
            R=jnp.asarray(R0), t=jnp.asarray(t0), s=jnp.asarray(s0),
            edge_i=jnp.concatenate([ei, jnp.asarray(ei_h)]),
            edge_j=jnp.concatenate([ej, jnp.asarray(ej_h)]),
            meas_R=jnp.concatenate([mRd, jnp.asarray(mR_h)]),
            meas_t=jnp.concatenate([mtd, jnp.asarray(mt_h)]),
            meas_s=jnp.concatenate([msd, jnp.asarray(ms_h)]),
            edge_valid=jnp.concatenate([on, jnp.asarray(on_h)]),
            fixed=jnp.asarray(fixed),
        )
        out = pose_graph.optimize_pose_graph(prob, iters=20,
                                             scale_fixed=self.fix_scale)

        # recover SE3 poses T = [R | t/s] and re-map all points via their
        # reference keyframes (src/Optimizer.cc:1000-1040)
        S_before = (prob.R, prob.t, prob.s)
        S_after = (out.R, out.t, out.s)
        pt_ids = jnp.arange(store.pt_cap)
        ref = jnp.clip(store.pt_ref_kf, 0, K - 1)
        ref = jnp.where(store.kf_valid[ref], ref, kf_id)
        new_xyz = pose_graph.correct_points(store.pt_xyz, ref, S_before,
                                            S_after)
        store = store.replace(
            pt_xyz=jnp.where(store.pt_valid[:, None], new_xyz, store.pt_xyz))
        T_new = jnp.concatenate(
            [out.R, (out.t / jnp.maximum(out.s, 1e-9)[:, None])[:, :, None]],
            axis=2)
        store = store.replace(
            kf_pose=jnp.where(store.kf_valid[:, None, None], T_new,
                              store.kf_pose))
        return store

    def _global_ba(self, store: MapStore, cam: Camera,
                   iters: int = 15) -> MapStore:
        """TRUE whole-map BA (GlobalBundleAdjustemnt, src/Optimizer.cc:41-54):
        every valid keyframe and point in one solve — no coverage caps.
        The reference's during-GBA correction propagation
        (src/LoopClosing.cc:646-750) is unnecessary here: the pass is
        synchronous, so no keyframes are inserted mid-solve."""
        n_kf = int(np.asarray(store.kf_valid).sum())
        if n_kf < 3:
            return store
        return local_mapping.global_bundle_adjustment(
            store, cam, iters=iters, o_max=12,
            stereo=self.fix_scale, bf=self.bf, mesh=self.mesh)
