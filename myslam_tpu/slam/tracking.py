"""Monocular tracking front end: the per-frame state machine.

TPU-native replacement for Tracking (reference src/Tracking.cc, 1599
lines): NOT_INITIALIZED -> two-view bootstrap; OK -> motion-model tracking
(fallback: reference-keyframe tracking) -> local-map tracking -> keyframe
decision; LOST -> relocalization. Heavy stages are jitted array programs
over the MapStore; the state machine itself is a small host-side driver
(the reference runs it on the caller's thread too, include/System.h:158).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..features.frame import FrameFeatures
from ..geom import projection, se3
from ..geom.projection import Camera
from ..mapping import local_mapping, map_store
from ..mapping.map_store import NO_POINT, MapStore
from ..matching import matcher
from ..optim import ba, pose_opt
from ..ops import indexing
from ..solvers import initializer


@dataclass
class TrackingConfig:
    # map capacities
    kf_cap: int = 256
    pt_cap: int = 16384
    feat_cap: int = 2048
    # pyramid
    scale: float = 1.2
    n_levels: int = 8
    # thresholds (reference values cited inline where used)
    min_init_matches: int = 100
    min_init_points: int = 80
    min_track_matches: int = 20
    min_track_inliers: int = 10
    min_local_inliers: int = 30
    min_reloc_inliers: int = 50   # nGood gate (src/Tracking.cc:1497)
    reloc_candidates: int = 8
    max_frames_between_kf: int = 30
    min_frames_between_kf: int = 2
    kf_baseline_ratio: float = 0.05   # insert KF after moving 5% of depth
    kf_rotation_deg: float = 5.0      # ... or rotating 5 degrees
    # local map scope
    local_kf: int = 16
    local_pts: int = 4096
    # local BA scope
    ba_free: int = 12
    ba_fixed: int = 12
    ba_pts: int = 4096
    ba_obs: int = 10
    # LM iteration budget (two-phase; reference does 5+10 with retrying
    # inner lambda loops, src/Optimizer.cc:659-707)
    ba_iters1: int = 8
    ba_iters2: int = 12
    # per-frame pose-optimization schedule. The INTERMEDIATE optimization
    # (after the motion-model / reference-KF match) only needs to land
    # close enough for the th=1 local-map projection window — its result
    # is always refined by the FINAL pass (which keeps the reference's
    # full 4x10, src/Optimizer.cc:367-379, plus the valley escape).
    # 40 sequential LM iterations are pure latency on TPU; 3x6 measured
    # equivalent end-to-end (bench --full ATE unchanged).
    pose_rounds_mid: int = 3
    pose_iters_mid: int = 6
    # mapping
    tri_neighbors: int = 6
    max_new_points: int = 512
    fuse_neighbors: int = 2   # SearchInNeighbors breadth per insertion
    # second-order fuse targets per first-order neighbor (the reference
    # extends the fuse set with each neighbor's best 5 covisible KFs,
    # src/LocalMapping.cc:463-475)
    fuse_second_order: int = 2
    # keyframe culling policy: "pressure" culls at most one redundant
    # keyframe per insertion and only when the arena is >75% full (keeps
    # the long-baseline anchors monocular structure needs — see
    # _post_keyframe_events); "reference" applies the always-on 90%-
    # redundancy rule of LocalMapping::KeyFrameCulling
    # (src/LocalMapping.cc:634-720) after every insertion. Measured on the
    # rendered synthetic suite the two agree to within the run-to-run ATE
    # noise (see BASELINE.md "KF culling policy"); "pressure" is the
    # default because it bounds map churn per frame.
    kf_culling: str = "pressure"
    # loop closing
    enable_loop_closing: bool = True
    vocab_words: int = 512
    # pretrained DBoW2 text vocabulary (reference System.cc:62-76); empty =
    # bootstrap-train from the first keyframes and retrain periodically
    vocab_path: str = ""
    # retrain the self-trained vocabulary from ALL keyframes every N
    # insertions (a 2-KF vocab saturates BoW scores on long sequences);
    # 0 disables. Ignored when vocab_path is set.
    vocab_retrain_every: int = 16
    vocab_words_max: int = 4096
    # asynchronous global BA after loop closure (the reference runs GBA
    # on its own thread and merges when done, src/LoopClosing.cc:580,
    # 646-750): the loop event returns after the pose-graph solve and the
    # whole-map BA result is merged at the NEXT keyframe event, with
    # interim keyframes/points re-anchored. False = fully synchronous.
    async_gba: bool = True
    # OK-state fast path: run the whole per-frame step as ONE device
    # program (slam/fused.py) — one host sync per frame instead of ~8.
    use_fused: bool = True
    # sensor (0 = monocular, 1 = stereo, 2 = RGB-D; reference
    # System::eSensor include/System.h:55-60)
    sensor: int = 0
    bf: float = 0.0                 # baseline * fx (reference mbf)
    th_depth: float = 3.0           # meters; close/far point split
                                    # (reference mThDepth = mbf*ThDepth/fx)
    min_init_depth_points: int = 300  # stereo bootstrap gate (the
                                    # reference requires 500 features,
                                    # src/Tracking.cc:519)


NOT_INITIALIZED = 0
OK = 1
LOST = 2

# Pretrained vocabularies are large (the reference's ORBvoc.txt has ~1M
# leaves) — parse once per path per process.
_VOCAB_CACHE = {}


def _load_vocab_cached(path: str):
    from ..matching import vocabulary
    if path not in _VOCAB_CACHE:
        _VOCAB_CACHE[path] = vocabulary.load_dbow2_text(path)
    return _VOCAB_CACHE[path]


@jax.jit
def _frame_point_data(store: MapStore, obs):
    """Per-feature point arrays for the current associations [F]
    (gather-free: one-hot matmul lookups, ops/indexing.py)."""
    valid = (obs >= 0) & (
        indexing.mm_gather_int(store.pt_valid.astype(jnp.int32), obs) > 0)
    xyz = indexing.mm_gather(store.pt_xyz, obs)
    return xyz, valid


@partial(jax.jit, static_argnames=("th",))
def _motion_model_match(store: MapStore, cam: Camera, T_pred, feats,
                        last_obs, last_level, last_angle, th: float = 15.0):
    """SearchByProjection against last frame's map points
    (Tracking::TrackWithMotionModel, src/Tracking.cc:877-935, th=15 mono
    widening handled by the caller retry)."""
    p_valid = (last_obs >= 0) & (
        indexing.mm_gather_int(store.pt_valid.astype(jnp.int32), last_obs) > 0)
    idx, ok = matcher.search_by_projection_frame(
        cam, T_pred, feats,
        indexing.mm_gather(store.pt_xyz, last_obs),
        indexing.mm_gather_u32(store.pt_desc, last_obs),
        last_level, last_angle, p_valid, th=th,
        scale=store.scale, n_levels=store.n_levels)
    # convert point-major (idx: feature per last-slot) to feature-major obs
    # (scatter-free: one_to_one guarantees unique feature targets)
    F = feats.capacity
    obs = indexing.mm_scatter_set(
        jnp.full(F, NO_POINT, jnp.int32), idx,
        last_obs, mask=ok)
    return obs


@jax.jit
def _reference_kf_match(store: MapStore, cam: Camera, feats, ref_kf):
    """Descriptor match against the reference keyframe's associated points
    (Tracking::TrackReferenceKeyFrame, src/Tracking.cc:766-809 — the
    reference accelerates with BoW nodes; full masked tiles here)."""
    from ..ops import hamming
    ref_obs = store.kf_obs[ref_kf]
    ref_has = (ref_obs >= 0) & (
        indexing.mm_gather_int(store.pt_valid.astype(jnp.int32), ref_obs) > 0)
    d = hamming.hamming_matrix(store.kf_desc[ref_kf], feats.desc)
    cand = ref_has[:, None] & feats.valid[None, :]
    b1, b2, idx = matcher.masked_best2(d, cand)
    ok = (
        (b1 <= matcher.TH_LOW)
        & (b1.astype(jnp.float32) < 0.7 * b2.astype(jnp.float32))
        & ref_has
    )
    ok = matcher.one_to_one(idx, b1, ok, feats.capacity)
    ok = matcher.rotation_consistency(
        store.kf_angle[ref_kf],
        indexing.mm_gather(feats.angle[:, None], idx)[:, 0], ok)
    F = feats.capacity
    obs = indexing.mm_scatter_set(
        jnp.full(F, NO_POINT, jnp.int32), idx, ref_obs, mask=ok)
    return obs


@partial(jax.jit, static_argnames=("escape", "rounds", "iters"))
def _pose_optimize(store: MapStore, cam: Camera, Tcw0, feats, obs, bf=0.0,
                   escape: bool = True, rounds: int = 4, iters: int = 10):
    """PoseOptimization on the current associations; drops outlier
    associations (Tracking.cc:785-807 usage of Optimizer::PoseOptimization).
    Stereo/RGB-D frames carry u_right and get 3D edges
    (src/Optimizer.cc:338). escape=False skips the multi-start valley
    escape — used for the intermediate per-frame optimizations whose
    result is refined again by the final local-map pass (those also run a
    shortened rounds x iters schedule, TrackingConfig.pose_*_mid)."""
    xyz, valid = _frame_point_data(store, obs)
    inv_s2 = 1.0 / store.level_sigma2(feats.level)
    Tcw, inlier, n = pose_opt.optimize_pose(
        cam, Tcw0, xyz, feats.xy, inv_s2, valid,
        u_right=feats.u_right, bf=bf, escape_valley=escape,
        rounds=rounds, iters_per_round=iters)
    obs_out = jnp.where(inlier, obs, NO_POINT)
    return Tcw, obs_out, n


@partial(jax.jit, static_argnames=("k_local", "p_local"))
def _local_map_harvest(store: MapStore, obs, k_local: int = 16,
                       p_local: int = 4096, B=None, W=None):
    """Local keyframes + local points from the current associations
    (Tracking::UpdateLocalKeyFrames/UpdateLocalPoints,
    src/Tracking.cc:1202-1346): KFs voting for current points, plus their
    best covisible neighbors; points = union of their observations.

    B/W: optional precomputed incidence [K,P] / covisibility [K,K] —
    they only change at keyframe events, so the fused step caches them in
    TrackState instead of recomputing [K,P]+[K,K] every frame."""
    if B is None:
        B = map_store.incidence(store)                 # [K, P]
    cur_pts = indexing.bincount_mm(obs, store.pt_cap) > 0
    votes = jnp.sum((B & cur_pts[None, :]), axis=1)    # [K]
    votes = jnp.where(store.kf_valid, votes, -1)
    seed_v, seed_ids = jax.lax.top_k(votes, min(k_local // 2, store.kf_cap))
    seed_on = seed_v > 0

    # add best covisible neighbors of the seeds
    if W is None:
        W = map_store.covisibility_from(B)
    Wsel = jnp.dot(indexing.onehot(seed_ids, store.kf_cap),
                   W.astype(jnp.float32),
                   preferred_element_type=jnp.float32)         # [k/2, K]
    nb_scores = jnp.max(
        jnp.where(seed_on[:, None], Wsel, -1.0), axis=0)       # [K]
    nb_scores = jnp.where(store.kf_valid, nb_scores, -1)
    combined = jnp.maximum(votes * 1000, nb_scores)    # seeds outrank
    w, local_ids = jax.lax.top_k(combined, min(k_local, store.kf_cap))
    local_on = w > 0
    is_local = indexing.bincount_mm(
        jnp.where(local_on, local_ids, -1), store.kf_cap) > 0

    pt_mask = jnp.any(B & is_local[:, None], axis=0)
    pt_mask = pt_mask & ~cur_pts                        # already matched
    pt_v, pt_ids = jax.lax.top_k(pt_mask.astype(jnp.float32), p_local)
    return jnp.where(pt_v > 0, pt_ids, -1), local_ids, local_on


@jax.jit
def _local_map_match(store: MapStore, cam: Camera, Tcw, feats, obs, pt_ids):
    """Project unmatched local points and associate to free features
    (Tracking::SearchLocalPoints + ORBmatcher::SearchByProjection th=1,
    src/Tracking.cc:1150-1199). Returns (merged obs [F], visible_ids)."""
    p_valid = (pt_ids >= 0) & (
        indexing.mm_gather_int(store.pt_valid.astype(jnp.int32), pt_ids) > 0)
    # only match into features without an association yet
    free_feat = obs == NO_POINT
    feats_masked = feats.replace(valid=feats.valid & free_feat)
    scalars = indexing.mm_gather(
        jnp.stack([store.pt_min_dist, store.pt_max_dist], axis=1), pt_ids)
    idx, ok, _ = matcher.search_by_projection_map(
        cam, Tcw, feats_masked,
        indexing.mm_gather(store.pt_xyz, pt_ids),
        indexing.mm_gather_u32(store.pt_desc, pt_ids),
        indexing.mm_gather(store.pt_normal, pt_ids),
        0.8 * scalars[:, 0], 1.2 * scalars[:, 1], p_valid, th=1.0,
        scale=store.scale, n_levels=store.n_levels)
    F = feats.capacity
    add = indexing.mm_scatter_set(
        jnp.full(F, NO_POINT, jnp.int32), idx, pt_ids, mask=ok)
    merged = jnp.where(obs >= 0, obs, add)
    return merged, jnp.where(ok, pt_ids, -1)


class Tracker:
    """Host-side driver around the jitted tracking stages."""

    def __init__(self, cam: Camera, config: Optional[TrackingConfig] = None,
                 mesh=None):
        self.cam = cam
        self.cfg = config or TrackingConfig()
        # optional jax.sharding.Mesh: whole-map (loop/GBA) bundle
        # adjustments shard their edge lists across it (parallel/dist_ba),
        # and the loop/reloc keyframe database queries shard their row
        # axis (parallel/loop_search) — BASELINE config 5 wiring.
        self.mesh = mesh
        self.store = MapStore.create(
            self.cfg.kf_cap, self.cfg.pt_cap, self.cfg.feat_cap,
            self.cfg.scale, self.cfg.n_levels)
        self.state = NOT_INITIALIZED
        self.Tcw = se3.identity()
        self.velocity = None          # relative motion T_cur_last
        self.last_feats: Optional[FrameFeatures] = None
        self.last_obs = None          # [F] point ids of last frame
        self.ref_kf = 0
        self.n_kf = 0
        self.last_kf_frame = -10**9
        self.frame_id = -1
        self.init_feats = None        # first frame of an init attempt
        self.trajectory = []          # (frame_id, timestamp, Tcw 3x4 np)
        self.n_last_inliers = 0
        self.rng = jax.random.PRNGKey(0)  # deterministic like the
        # reference's SeedRandOnce(0) (src/Initializer.cc:80)
        self.loop_closer = None           # created after initialization
        self.force_host = False
        # localization mode (Tracking::mbOnlyTracking): track against the
        # frozen map, never insert keyframes; honored by BOTH paths (the
        # fused step carries it as TrackState.frozen)
        self.localization_only = False
        self._fused = None                # FusedTracker (lazy)
        self._fstate = None               # device TrackState mirror
        # trajectory re-anchoring (System::SaveTrajectoryTUM semantics,
        # src/System.cc:323-409): per trajectory entry, the reference
        # keyframe's immutable seq id and its pose at track time; culled
        # keyframes leave a relative-pose breadcrumb to their spanning-
        # tree parent (KeyFrame::mTcp, src/KeyFrame.cc:453-545) so the
        # chain still resolves after map surgery.
        self.traj_anchors = []            # [(ref_seq, T_ref_at_track)]
        self.culled_anchors = {}          # seq -> (parent_seq, T_rel)

    # ------------------------------------------------------------------
    def process_frame(self, feats: FrameFeatures, frame_id: int,
                      timestamp: float = 0.0) -> bool:
        """One tracking step on already-extracted features.
        Returns True if the frame was tracked (or initialized)."""
        self.frame_id = frame_id
        if self.state == NOT_INITIALIZED:
            tracked = self._try_initialize(feats, frame_id, timestamp)
        elif self.state == OK:
            if self.cfg.use_fused and not self.force_host:
                tracked = self._track_fused(feats, frame_id, timestamp)
            else:
                self._fstate = None  # host path mutates the store
                tracked = self._track(feats, frame_id, timestamp)
            if not tracked and self.state == LOST and self.n_kf <= 5:
                # Lost right after initialization: the bootstrap was bad —
                # reset instead of relocalizing against a junk 2-KF map
                # (src/Tracking.cc:481-489).
                self.reset()
        else:
            self._fstate = None
            tracked = self._relocalize(feats, frame_id, timestamp)
        if tracked:
            # device array kept as-is: converting here would force a
            # host sync per frame; savers convert lazily
            self.trajectory.append((frame_id, timestamp, self.Tcw))
            r = self.ref_kf
            self.traj_anchors.append((self.store.kf_seq[r],
                                      self.store.kf_pose[r]))
        return tracked

    def process_chunk(self, feats_chunk, frame_ids, timestamps):
        """Track a CHUNK of frames in one device dispatch (production
        mode: one host sync per chunk instead of per frame). Requires an
        initialized tracker (state == OK). Per-frame poses land in
        .trajectory with their REAL frame ids/timestamps, so full-
        trajectory saving (System::SaveTrajectoryTUM,
        reference src/System.cc:323-409) works in chunked mode too.
        Host-paced events (loop closing, keyframe culling) run once at
        the chunk boundary. Returns the per-frame tracked flags."""
        from .fused import get_fused_tracker

        if self.state != OK:
            raise RuntimeError("process_chunk requires state == OK "
                               "(bootstrap via process_frame first)")
        if self._fused is None:
            self._fused = get_fused_tracker(self.cam, self.cfg)
        if self._fstate is None:
            self._fstate = self._fused.state_from(self)
        frame_ids = np.asarray(frame_ids)
        timestamps = np.asarray(timestamps)
        st, infos = self._fused.run_chunk(
            self._fstate, feats_chunk, timestamps, frame_ids)
        return self._finish_chunk(
            st, infos, frame_ids, timestamps,
            lambda: jax.tree.map(lambda x: x[-1], feats_chunk))

    def process_image_chunk(self, images, frame_ids, timestamps):
        """Track a chunk of RAW IMAGES in one device dispatch: extraction
        + the fused per-frame step scanned on device (FusedTracker.
        run_images), then the host-paced keyframe events (loop closing,
        culling) at the chunk boundary — the FULL production pipeline
        with one host sync per chunk. Requires self.extractor to be set
        (an ORBExtractor matching cfg.feat_cap)."""
        from .fused import FusedTracker

        if self.state != OK:
            raise RuntimeError("process_image_chunk requires state == OK")
        ex = getattr(self, "extractor", None)
        if ex is None:
            raise RuntimeError("set tracker.extractor first")
        if self._fused is None or self._fused.extractor is None:
            self._fused = FusedTracker(self.cam, self.cfg, extractor=ex)
        if self._fstate is None:
            self._fstate = self._fused.state_from(self)
        frame_ids = np.asarray(frame_ids)
        timestamps = np.asarray(timestamps)
        st, infos = self._fused.run_images(
            self._fstate, images, timestamps, frame_ids)

        def last_feats():
            from ..features import frame as frame_mod
            img = jnp.asarray(images[-1]).astype(jnp.float32)
            return frame_mod.undistort(self.cam, ex(img))

        return self._finish_chunk(st, infos, frame_ids, timestamps,
                                  last_feats)

    def _finish_chunk(self, st, infos, frame_ids, timestamps,
                      last_feats_fn):
        """Shared chunk-boundary host logic: trajectory append, LOST
        hand-off, and per-keyframe events for every keyframe the chunk
        inserted (see process_chunk docstring)."""
        infos = jax.device_get(infos)
        self._fstate = st
        self.Tcw = st.Tcw
        self._last_Tcw = st.Tcw
        tracked = np.asarray(infos["tracked"])
        for i in np.nonzero(tracked)[0]:
            self.trajectory.append((int(frame_ids[i]),
                                    float(timestamps[i]),
                                    infos["Tcw"][i]))
            self.traj_anchors.append((int(infos["ref_seq"][i]),
                                      infos["T_ref"][i]))
        # convention: frame_id is the NEXT id (matches write_back /
        # TrackState.frame_id = last + 1)
        self.frame_id = int(frame_ids[-1]) + 1
        self.n_last_inliers = int(infos["n_inliers"][-1])
        last_feats = None
        if not bool(tracked[-1]) or np.asarray(infos["new_kf"]).any():
            last_feats = last_feats_fn()
        if not bool(tracked[-1]):
            # a lost tracker stays frozen for the rest of the chunk
            # (fused.py gates on state.lost); hand control to the host
            self._fused.write_back(st, self, last_feats=last_feats)
            self._fstate = None
            self.state = LOST
            self.velocity = None
        elif np.asarray(infos["new_kf"]).any():
            self._fused.write_back(st, self, last_feats=last_feats)
            # run the host keyframe events for EVERY keyframe inserted
            # in this chunk, in insertion order — the loop/reloc
            # database must index them all (LocalMapping::Run processes
            # each queued keyframe, src/LocalMapping.cc:48-113)
            new_kf = np.asarray(infos["new_kf"])
            kf_ids = [int(k) for k in
                      np.asarray(infos["kf_id"])[np.nonzero(new_kf)[0]]]
            last_kf = kf_ids[-1]
            pose_before = np.asarray(self.store.kf_pose[last_kf])
            for k in kf_ids:
                self._post_keyframe_events(k)
            pose_after = np.asarray(self.store.kf_pose[last_kf])
            if bool(new_kf[-1]):
                # the keyframe IS the chunk-end frame: its (possibly
                # loop-corrected) row is authoritative
                self.Tcw = self.store.kf_pose[last_kf]
                self.last_obs = self.store.kf_obs[last_kf]
            elif not np.allclose(pose_before, pose_after):
                # a loop correction moved the map mid-chunk: re-anchor
                # the chunk-end pose via its relative pose to the last
                # keyframe (CorrectLoop's Tic propagation,
                # src/LoopClosing.cc:444-475) instead of rewinding —
                # chunk-end feats/obs stay paired with a chunk-end pose
                rel = se3.compose(np.asarray(st.Tcw),
                                  se3.inverse(pose_before))
                self.Tcw = se3.compose(rel, pose_after)
                self._last_Tcw = self.Tcw
            # else: write_back already left chunk-end Tcw/last_obs
            self.last_feats = last_feats
            self._fstate = None
        elif (int(np.asarray(st.store.kf_valid).sum())
              >= self.cfg.kf_cap - 2):
            # cap-starved with NO insertion this chunk: the fused step's
            # cap_ok gate is blocking keyframes, and since culling
            # normally runs per-insertion it would never fire again —
            # the arena deadlocks full while the sequence moves on (the
            # failure mode that killed bench --full at 62/64 KFs). Run a
            # standalone cull pass to free slots so insertion resumes.
            # last_feats must be chunk-end fresh here: _fstate is reset
            # below, so the next chunk rebuilds last_level/last_angle
            # from (last_feats, last_obs) — a stale pairing degrades the
            # motion-model match on the first post-cull frame.
            if last_feats is None:
                last_feats = last_feats_fn()
            self._fused.write_back(st, self, last_feats=last_feats)
            ref = self.ref_kf  # write_back already pulled it
            store = self.store
            red = local_mapping.redundant_keyframes(store, ref)
            seqs = np.asarray(store.kf_seq)
            newest = np.argsort(seqs)[-2:]
            red_ids = [r for r in np.nonzero(np.asarray(red))[0]
                       if r not in newest]
            if not red_ids:
                # nothing formally redundant: evict the most-connected
                # keyframe (highest covisibility mass = densest local
                # cluster, so its viewpoint is best covered by others).
                # Isolated keyframes — unique viewpoints like the far
                # side of an orbit — are exactly what loop closure will
                # need, so they are the last to go.
                W = np.array(map_store.covisibility(store))
                mass = W.sum(1).astype(np.float64)
                mass[~np.asarray(store.kf_valid)] = -1
                mass[newest] = -1
                mass[ref] = -1
                if mass.max() > 0:
                    red_ids = [int(np.argmax(mass))]
            target = int(0.75 * self.cfg.kf_cap)
            for rid in red_ids[:max(self.n_kf - target, 1)]:
                store = self._erase_keyframe(store, int(rid))
            self.store = store
            self._fstate = None
        return tracked

    def _erase_keyframe(self, store, rid: int):
        """Erase a keyframe, leaving a relative-pose breadcrumb to its
        spanning-tree parent so trajectory entries anchored to it still
        resolve after the cull (KeyFrame::mTcp retention,
        src/KeyFrame.cc:453-545)."""
        seq = int(store.kf_seq[rid])
        parent = int(store.kf_parent[rid])
        if parent < 0 or not bool(store.kf_valid[parent]):
            # root or orphan: anchor to the best-covisible alive keyframe
            W = np.array(map_store.covisibility(store)[rid])
            W[~np.asarray(store.kf_valid)] = -1
            W[rid] = -1
            parent = int(np.argmax(W)) if W.max() > 0 else -1
        if parent >= 0:
            T_rel = se3.compose(store.kf_pose[rid],
                                se3.inverse(store.kf_pose[parent]))
            self.culled_anchors[seq] = (int(store.kf_seq[parent]),
                                        np.asarray(T_rel))
        store = map_store.erase_keyframe(store, rid)
        if self.loop_closer is not None:
            self.loop_closer.db = self.loop_closer.db.erase(rid)
        self.n_kf -= 1
        return store

    def corrected_trajectory(self):
        """Trajectory with every pose re-expressed relative to the
        CURRENT (loop-corrected, BA-refined) pose of its anchor keyframe:
        Tcw_now = (Tcw_raw o T_ref_raw^-1) o T_ref_now, chaining through
        culled-keyframe breadcrumbs (System::SaveTrajectoryTUM,
        src/System.cc:323-409). Returns [(frame_id, timestamp, Tcw)]."""
        # a run can end between keyframe events: land any still-pending
        # async global BA so the saved trajectory sees the refined map
        if self.loop_closer is not None:
            self.store = self.loop_closer.finish_pending_gba(self.store)
        store = self.store
        seqs = np.asarray(store.kf_seq)
        valid = np.asarray(store.kf_valid)
        slot_of = {int(s): i for i, s in enumerate(seqs) if valid[i]}
        poses_now = np.asarray(store.kf_pose)

        # Pure-NumPy 3x4 composition — this runs per trajectory entry on
        # the host; device calls here would cost a tunnel round trip each
        # (~41 ms) for a few microseconds of math.
        def _comp(Ta, Tb):
            R = Ta[:3, :3] @ Tb[:3, :3]
            t = Ta[:3, :3] @ Tb[:3, 3] + Ta[:3, 3]
            return np.concatenate([R, t[:, None]], axis=1)

        def _inv(T):
            Rt = T[:3, :3].T
            return np.concatenate([Rt, (-Rt @ T[:3, 3])[:, None]], axis=1)

        out = []
        for (fid, ts, Tcw), (ref_seq, T_ref_raw) in zip(
                self.trajectory, self.traj_anchors):
            Tcw = np.asarray(Tcw)
            s = int(np.asarray(ref_seq))
            T_chain = np.concatenate(
                [np.eye(3, dtype=np.float64), np.zeros((3, 1))], axis=1)
            hops = 0
            while s >= 0 and s not in slot_of and s in self.culled_anchors \
                    and hops < 64:
                parent_seq, T_rel = self.culled_anchors[s]
                T_chain = _comp(T_chain, np.asarray(T_rel))
                s = parent_seq
                hops += 1
            if s in slot_of:
                T_ref_now = _comp(T_chain, poses_now[slot_of[s]])
                T_cr = _comp(Tcw, _inv(np.asarray(T_ref_raw)))
                Tcw = _comp(T_cr, T_ref_now)
            out.append((fid, ts, Tcw))
        return out

    def _track_fused(self, feats, frame_id, timestamp) -> bool:
        """OK-state fast path: one fused device step per frame
        (slam/fused.py), host sync only for the small info scalars; host
        events (loop closing, keyframe culling) run at keyframe
        boundaries."""
        from .fused import get_fused_tracker

        if self._fused is None:
            self._fused = get_fused_tracker(self.cam, self.cfg)
        if self._fstate is None:
            self._fstate = self._fused.state_from(self)
        st, info = self._fused.step(self._fstate, feats, timestamp,
                                    frame_id=frame_id)
        info = jax.device_get(info)  # ONE host sync for all scalars
        self._fstate = st
        self.Tcw = st.Tcw
        self._last_Tcw = st.Tcw
        self.n_last_inliers = int(info["n_inliers"])
        if not bool(info["tracked"]):
            self._fused.write_back(st, self, last_feats=feats)
            self._fstate = None
            self.state = LOST
            self.velocity = None
            return False
        if bool(info["new_kf"]):
            # mirror to host, run loop closing / culling, re-snapshot
            self._fused.write_back(st, self, last_feats=feats)
            kf_id = self.ref_kf  # write_back already pulled it
            self._post_keyframe_events(kf_id)
            self.Tcw = self.store.kf_pose[kf_id]
            self.last_obs = self.store.kf_obs[kf_id]
            self.last_feats = feats
            self._fstate = None
        return True

    # ------------------------------------------------------------------
    def _next_key(self):
        self.rng, k = jax.random.split(self.rng)
        return k

    def _try_initialize(self, feats, frame_id, timestamp) -> bool:
        if self.cfg.sensor != 0:
            return self._stereo_initialize(feats, frame_id, timestamp)
        return self._mono_initialize(feats, frame_id, timestamp)

    def _stereo_initialize(self, feats, frame_id, timestamp) -> bool:
        """Stereo/RGB-D bootstrap (Tracking::StereoInitialization,
        src/Tracking.cc:517-570): one keyframe at the origin, map points
        unprojected from every feature with a depth measurement — metric
        scale from the start, no two-view RANSAC, no depth normalization."""
        cfg = self.cfg
        if feats.depth is None:
            raise ValueError("stereo/RGB-D tracking needs feats.depth")
        has_depth = feats.valid & (feats.depth > 0)
        if int(has_depth.sum()) < cfg.min_init_depth_points:
            return False

        store = self.store
        F = feats.capacity
        obs_empty = jnp.full(F, NO_POINT, jnp.int32)
        store, k0 = map_store.add_keyframe(
            store, se3.identity(), feats, obs_empty, frame_id, timestamp)
        slots = map_store.allocate_points(store, has_depth)
        xyz = projection.backproject(self.cam, feats.xy, feats.depth)
        store = map_store.write_points(
            store, slots, xyz=xyz, desc=feats.desc,
            normal=jnp.zeros((F, 3)), min_dist=jnp.zeros(F),
            max_dist=jnp.ones(F),
            ref_kf=jnp.full(F, 0, jnp.int32),
            ref_level=feats.level,
            first_kf=jnp.full(F, 0, jnp.int32))
        okp = slots >= 0
        store = map_store.set_observations(
            store, k0, jnp.arange(F), slots, okp)
        store = map_store.refresh_point_stats(
            store, jnp.where(okp, slots, -1))

        self.store = store
        self.state = OK
        self.Tcw = se3.identity()
        self._last_Tcw = self.Tcw
        self.velocity = None
        self.last_feats = feats
        self.last_obs = store.kf_obs[0]
        self.ref_kf = 0
        self.n_kf = 1
        self.last_kf_frame = frame_id

        if cfg.enable_loop_closing:
            self._init_loop_closer(kf_ids=(0,))
        return True

    def _mono_initialize(self, feats, frame_id, timestamp) -> bool:
        """Two-view bootstrap (Tracking::MonocularInitialization,
        src/Tracking.cc:572-746)."""
        cfg = self.cfg
        n_feat = int(feats.valid.sum())
        if self.init_feats is None:
            if n_feat >= cfg.min_init_matches:
                self.init_feats = feats
                self.init_frame = (frame_id, timestamp)
            return False
        if n_feat < cfg.min_init_matches:
            self.init_feats = None
            return False

        idx2, ok = matcher.search_for_initialization(
            self.init_feats, feats, window=100, ratio=0.9)
        n_match = int(ok.sum())
        if n_match < cfg.min_init_matches:
            self.init_feats = None
            return False

        res = initializer.initialize_two_view(
            self.cam, self.init_feats.xy, feats.xy[idx2], ok,
            self._next_key())
        if not bool(res.ok) or int(res.n_good) < cfg.min_init_points:
            return False

        self._create_initial_map(feats, idx2, res, frame_id, timestamp)
        return True

    def _create_initial_map(self, feats, idx2, res, frame_id, timestamp):
        """CreateInitialMapMonocular (src/Tracking.cc:646-746): two KFs,
        triangulated points, 20-iteration global BA, median-depth
        normalization."""
        cfg = self.cfg
        store = self.store
        F = feats.capacity

        # KF0 at identity (the init frame), KF1 at T21.
        obs_empty = jnp.full(F, NO_POINT, jnp.int32)
        store, k0 = map_store.add_keyframe(
            store, se3.identity(), self.init_feats, obs_empty,
            self.init_frame[0], self.init_frame[1])
        store, k1 = map_store.add_keyframe(
            store, res.T21, feats, obs_empty, frame_id, timestamp)

        good = res.tri_ok
        slots = map_store.allocate_points(store, good)
        # reference KF for new points is the CURRENT keyframe
        # (src/Tracking.cc:664-668: new MapPoint(..., pKFcur, ...))
        store = map_store.write_points(
            store, slots, xyz=res.points,
            desc=self.init_feats.desc,
            normal=jnp.zeros((F, 3)), min_dist=jnp.zeros(F),
            max_dist=jnp.ones(F),
            ref_kf=jnp.full(F, int(k1), jnp.int32),
            ref_level=feats.level[idx2],
            first_kf=jnp.full(F, 1, jnp.int32))  # seq of k1
        okp = slots >= 0
        store = map_store.set_observations(
            store, k0, jnp.arange(F), slots, okp)
        store = map_store.set_observations(
            store, k1, idx2, slots, okp)
        store = map_store.refresh_point_stats(
            store, jnp.where(okp, slots, -1))
        # spanning tree root: KF1 hangs off KF0
        store = map_store.set_parent(store, int(k1), int(k0))

        # global BA over the 2-view problem (GlobalBundleAdjustemnt 20 its,
        # src/Tracking.cc:695)
        store = local_mapping.local_bundle_adjustment(
            store, self.cam, int(k1), k_free=2, k_fixed=2,
            p_max=cfg.ba_pts, o_max=4)

        # median-depth normalization (src/Tracking.cc:698-722)
        med = local_mapping.scene_median_depth(store, int(k0))
        medf = float(med)
        if medf <= 0:
            self.store = MapStore.create(
                cfg.kf_cap, cfg.pt_cap, cfg.feat_cap, cfg.scale, cfg.n_levels)
            self.init_feats = None
            return
        inv = 1.0 / medf
        new_pose = store.kf_pose.at[:, :, 3].multiply(inv)
        store = store.replace(
            kf_pose=new_pose,
            pt_xyz=jnp.where(store.pt_valid[:, None],
                             store.pt_xyz * inv, store.pt_xyz))
        store = map_store.refresh_point_stats(
            store, jnp.where(okp, slots, -1))

        self.store = store
        self.state = OK
        self.Tcw = store.kf_pose[int(k1)]
        self._last_Tcw = self.Tcw
        self.velocity = None
        self.last_feats = feats
        # last-frame associations = KF1's observations
        self.last_obs = store.kf_obs[int(k1)]
        self.ref_kf = int(k1)
        self.n_kf = 2
        self.last_kf_frame = frame_id
        self.init_feats = None

        if self.cfg.enable_loop_closing:
            self._init_loop_closer()

    def _init_loop_closer(self, kf_ids=(0, 1)):
        """Build the vocabulary + keyframe database: load a pretrained
        DBoW2 text vocabulary when cfg.vocab_path is set (reference
        System.cc:62-76), else train one from the bootstrap keyframes
        (retrained periodically from the whole map — see
        _maybe_retrain_vocab)."""
        from ..matching import vocabulary
        from .loop_closing import LoopCloser

        store = self.store
        if self.cfg.vocab_path:
            vocab = _load_vocab_cached(self.cfg.vocab_path)
        else:
            descs = jnp.concatenate([store.kf_desc[k] for k in kf_ids])
            valid = jnp.concatenate([store.kf_fvalid[k] for k in kf_ids])
            vocab = vocabulary.train_vocabulary(
                descs, valid, n_words=self.cfg.vocab_words, iters=6)
        self.loop_closer = LoopCloser(self.cam, vocab, self.cfg.kf_cap,
                                      fix_scale=self.cfg.sensor != 0,
                                      bf=self.cfg.bf,
                                      mesh=self.mesh,
                                      async_gba=self.cfg.async_gba)
        self._kf_since_retrain = 0
        for k in kf_ids:
            self.loop_closer.add_keyframe_bow(store, k)

    def _maybe_retrain_vocab(self):
        """Self-trained vocabularies start from 2 bootstrap keyframes; on
        long sequences their BoW scores saturate and loop/reloc recall
        collapses. Every cfg.vocab_retrain_every insertions, retrain from
        ALL keyframe descriptors (word count grows with the map) and
        rebuild the database. No-op with a pretrained vocabulary."""
        cfg = self.cfg
        if (cfg.vocab_path or cfg.vocab_retrain_every <= 0
                or self.loop_closer is None):
            return
        self._kf_since_retrain = getattr(self, "_kf_since_retrain", 0) + 1
        if self._kf_since_retrain < cfg.vocab_retrain_every:
            return
        self._kf_since_retrain = 0
        from ..matching import vocabulary

        store = self.store
        kf_ids = np.nonzero(np.asarray(store.kf_valid))[0]
        # pad the keyframe set to a power of two (invalid rows masked):
        # the training-set SHAPE is baked into the compiled program, and
        # an unbucketed shape means a fresh 20-40 s compile per retrain
        n_pad = 1 << (max(len(kf_ids), 1) - 1).bit_length()
        ids_pad = np.zeros(n_pad, np.int64)
        ids_pad[:len(kf_ids)] = kf_ids
        on = jnp.asarray(np.arange(n_pad) < len(kf_ids))
        descs = store.kf_desc[ids_pad].reshape(-1, store.kf_desc.shape[-1])
        valid = (store.kf_fvalid[ids_pad] & on[:, None]).reshape(-1)
        n_words = int(min(cfg.vocab_words_max,
                          max(cfg.vocab_words, 64 * len(kf_ids))))
        # snap to the next power of two: every distinct n_words is a
        # fresh XLA program (20-40 s compile on the tunnel TPU); powers
        # of two bound the set to a handful, all compile-cache hits
        n_words = 1 << (n_words - 1).bit_length()
        n_words = int(min(cfg.vocab_words_max, n_words))
        vocab = vocabulary.train_vocabulary(
            descs, valid, n_words=n_words, iters=4)
        self.loop_closer.rebuild_vocabulary(store, vocab, kf_ids)

    # ------------------------------------------------------------------
    def _track(self, feats, frame_id, timestamp) -> bool:
        cfg = self.cfg
        tracked = False

        if self.velocity is not None:
            T_pred = se3.compose(self.velocity, self.Tcw)
            obs = _motion_model_match(
                self.store, self.cam, T_pred, feats,
                self.last_obs, self.last_feats.level, self.last_feats.angle)
            n_mm = int((obs >= 0).sum())
            n_last = max(int((self.last_obs >= 0).sum()), 1)
            if n_mm < max(cfg.min_track_matches, n_last // 2):
                # widened-window retry (reference doubles th when matches
                # are scarce, src/Tracking.cc:894-906)
                obs = _motion_model_match(
                    self.store, self.cam, T_pred, feats,
                    self.last_obs, self.last_feats.level,
                    self.last_feats.angle, th=30.0)
                n_mm = int((obs >= 0).sum())
            if n_mm >= cfg.min_track_matches:
                Tcw, obs, n = _pose_optimize(
                    self.store, self.cam, T_pred, feats, obs, self.cfg.bf,
                    escape=False, rounds=cfg.pose_rounds_mid,
                    iters=cfg.pose_iters_mid)
                if int(n) >= cfg.min_track_inliers:
                    self.Tcw, cur_obs, tracked = Tcw, obs, True

        if not tracked:  # fallback (src/Tracking.cc:319)
            obs = _reference_kf_match(self.store, self.cam, feats, self.ref_kf)
            if int((obs >= 0).sum()) >= cfg.min_track_matches // 2:
                Tcw, obs, n = _pose_optimize(
                    self.store, self.cam, self.Tcw, feats, obs, self.cfg.bf,
                    escape=False, rounds=cfg.pose_rounds_mid,
                    iters=cfg.pose_iters_mid)
                if int(n) >= cfg.min_track_inliers:
                    self.Tcw, cur_obs, tracked = Tcw, obs, True

        if not tracked:
            self.state = LOST
            self.velocity = None
            return False

        # ---- TrackLocalMap (src/Tracking.cc:937-981) ----
        pt_ids, local_ids, local_on = _local_map_harvest(
            self.store, cur_obs, cfg.local_kf, cfg.local_pts)
        cur_obs, visible = _local_map_match(
            self.store, self.cam, self.Tcw, feats, cur_obs, pt_ids)
        self.Tcw, cur_obs, n_in = _pose_optimize(
            self.store, self.cam, self.Tcw, feats, cur_obs, self.cfg.bf)
        n_inliers = int(n_in)
        self.n_last_inliers = n_inliers
        self.store = map_store.bump_counters(
            self.store, visible, jnp.where(cur_obs >= 0, cur_obs, -1))
        if n_inliers < cfg.min_local_inliers:
            self.state = LOST
            self.velocity = None
            return False

        # motion model update (src/Tracking.cc:430-438)
        if self.last_feats is not None:
            T_last_inv = se3.inverse(self._last_Tcw)
            self.velocity = se3.compose(self.Tcw, T_last_inv)

        # ---- keyframe decision (src/Tracking.cc:984-1068); suppressed in
        # localization mode (Tracking::mbOnlyTracking) ----
        if (not self.localization_only
                and self._need_new_keyframe(n_inliers, frame_id, feats,
                                            cur_obs)):
            self._insert_keyframe(feats, cur_obs, frame_id, timestamp)
            # Map surgery (cull -> allocate) REUSES point slots, so ids held
            # before the insertion may now name different points. The new
            # keyframe's kf_obs row was kept consistent through every
            # erase/replace, so it is the authoritative association set
            # (the pointer-nulling the reference does under mutexes,
            # e.g. MapPoint::SetBadFlag clearing KeyFrame::mvpMapPoints).
            cur_obs = self.store.kf_obs[self.ref_kf]

        self._last_Tcw = self.Tcw
        self.last_feats = feats
        self.last_obs = cur_obs
        return True

    def _need_new_keyframe(self, n_inliers, frame_id, feats=None,
                           cur_obs=None) -> bool:
        """Keyframe policy (Tracking::NeedNewKeyFrame,
        src/Tracking.cc:984-1068 conditions c1a/c1b/c2) plus a
        baseline-ratio trigger: monocular structure near a small-baseline
        bundle lives in a nearly flat (bas-relief) mode that only new
        baseline stiffens, so a KF is also inserted whenever the camera has
        moved > baseline_ratio of the median scene depth since the last KF
        — keeping local BA conditioned before the warp exceeds the
        matching/chi2 gates."""
        cfg = self.cfg
        if self.n_kf >= cfg.kf_cap - 2:
            return False
        if frame_id < self.last_kf_frame + cfg.min_frames_between_kf:
            return False
        if n_inliers <= 15:
            return False
        # stereo/RGB-D c1c rule (src/Tracking.cc:1014-1031): running out of
        # close tracked points while close candidates are available forces
        # a keyframe so they get inserted into the map.
        if (cfg.sensor != 0 and feats is not None
                and feats.depth is not None and cur_obs is not None):
            close = (feats.valid & (feats.depth > 0)
                     & (feats.depth < cfg.th_depth))
            tracked_close = int((close & (cur_obs >= 0)).sum())
            untracked_close = int((close & (cur_obs < 0)).sum())
            if tracked_close < 100 and untracked_close > 70:
                return True
        # nRefMatches counts only WELL-OBSERVED points (>= 3 observations,
        # KeyFrame::TrackedMapPoints(nMinObs=3), src/Tracking.cc:1002-1006)
        # — counting raw associations inflates it with freshly-triangulated
        # 2-view points and fires c2 after every insertion.
        ref_obs = self.store.kf_obs[self.ref_kf]
        cnt = map_store.observation_count(self.store)
        ref_tracked = int(jnp.sum(
            (ref_obs >= 0)
            & (cnt[jnp.clip(ref_obs, 0, self.store.pt_cap - 1)] >= 3)))
        c1a = frame_id >= self.last_kf_frame + cfg.max_frames_between_kf
        c2 = n_inliers < ref_tracked * 0.9
        if c1a or (c2 and n_inliers < ref_tracked * 0.7):
            return True
        # geometric criteria: translation OR rotation since the ref KF
        T_ref = self.store.kf_pose[self.ref_kf]
        base = float(jnp.linalg.norm(
            se3.camera_center(self.Tcw) - se3.camera_center(T_ref)))
        med = float(local_mapping.scene_median_depth(self.store, self.ref_kf))
        if base > cfg.kf_baseline_ratio * max(med, 1e-6):
            return True
        R_rel = se3.rotation(self.Tcw) @ se3.rotation(T_ref).T
        ang = float(jnp.degrees(jnp.arccos(jnp.clip(
            (jnp.trace(R_rel) - 1.0) / 2.0, -1.0, 1.0))))
        return ang > cfg.kf_rotation_deg

    def _insert_keyframe(self, feats, obs, frame_id, timestamp):
        """CreateNewKeyFrame + the local-mapping pass the reference runs on
        its mapping thread (src/Tracking.cc:1070-1148 +
        src/LocalMapping.cc:48-113)."""
        cfg = self.cfg
        store, kf_id = map_store.add_keyframe(
            self.store, self.Tcw, feats, obs, frame_id, timestamp)
        kf_id = int(kf_id)
        self.n_kf += 1
        self.ref_kf = kf_id
        self.last_kf_frame = frame_id

        # stereo/RGB-D: unproject close-depth features without a map point
        # into new points (CreateNewKeyFrame depth insertion,
        # src/Tracking.cc:1086-1142 — all closer than mThDepth, topped up
        # to the 100 nearest).
        if cfg.sensor != 0 and feats.depth is not None:
            F = feats.capacity
            no_obs = store.kf_obs[kf_id] < 0
            dd = jnp.where(feats.valid & no_obs & (feats.depth > 0),
                           feats.depth, jnp.inf)
            order = jnp.argsort(dd)
            rank = jnp.zeros(F, jnp.int32).at[order].set(
                jnp.arange(F, dtype=jnp.int32))
            want = jnp.isfinite(dd) & ((dd < cfg.th_depth) | (rank < 100))
            slots = map_store.allocate_points(store, want)
            xyz_c = projection.backproject(self.cam, feats.xy, feats.depth)
            xyz_w = se3.transform(se3.inverse(self.Tcw), xyz_c)
            store = map_store.write_points(
                store, slots, xyz=xyz_w, desc=feats.desc,
                normal=jnp.zeros((F, 3)), min_dist=jnp.zeros(F),
                max_dist=jnp.ones(F),
                ref_kf=jnp.full(F, kf_id, jnp.int32),
                ref_level=feats.level,
                first_kf=jnp.full(F, int(store.kf_seq[kf_id]), jnp.int32))
            store = map_store.set_observations(
                store, kf_id, jnp.arange(F), slots, slots >= 0)

        # ProcessNewKeyFrame: refresh stats of observed points
        own = store.kf_obs[kf_id]
        store = map_store.refresh_point_stats(
            store, jnp.where(own >= 0, own, -1))
        # MapPointCulling
        store = local_mapping.cull_points(store, kf_id)
        # CreateNewMapPoints over best covisible neighbors
        nb_ids, _ = local_mapping.top_covisible(
            store, kf_id, cfg.tri_neighbors)
        nb_list = [int(i) for i in np.asarray(nb_ids)]
        # spanning tree: parent = best covisible keyframe (first
        # UpdateConnections, src/KeyFrame.cc:289-379)
        if nb_list and nb_list[0] >= 0:
            store = map_store.set_parent(store, kf_id, nb_list[0])
        store = local_mapping.create_new_points(
            store, self.cam, kf_id, nb_list, cfg.max_new_points)
        # SearchInNeighbors (fuse) with second-order extension
        store = local_mapping.search_in_neighbors(
            store, self.cam, kf_id, nb_list[:cfg.fuse_neighbors],
            second_order=cfg.fuse_second_order)
        # Local BA
        if self.n_kf > 2:
            store = local_mapping.local_bundle_adjustment(
                store, self.cam, kf_id, cfg.ba_free, cfg.ba_fixed,
                cfg.ba_pts, cfg.ba_obs,
                iters1=cfg.ba_iters1, iters2=cfg.ba_iters2,
                stereo=cfg.sensor != 0, bf=cfg.bf)
        self.store = store
        self._post_keyframe_events(kf_id)
        # keep the tracker's pose in sync with the adjusted keyframe
        self.Tcw = self.store.kf_pose[kf_id]

    def _post_keyframe_events(self, kf_id: int):
        """Host-paced per-keyframe events shared by the host path and the
        fused fast path: capacity-pressure keyframe culling and the
        loop-closing pass. Mutates self.store / self.loop_closer /
        self.velocity / self.n_kf."""
        # merge a completed async global BA FIRST: culling/loop detection
        # must see the refined geometry (reference merge point:
        # LoopClosing::RunGlobalBundleAdjustment, src/LoopClosing.cc:646)
        if self.loop_closer is not None:
            self.store = self.loop_closer.finish_pending_gba(self.store)
        store = self.store
        # KeyFrameCulling — two policies (cfg.kf_culling):
        # "pressure": the redundancy rule (src/LocalMapping.cc:634) exists
        # to bound map size, but culling early keyframes deletes the
        # LONG-BASELINE observations that anchor monocular structure
        # (culling an init-era KF re-warps the map toward the
        # short-baseline subset). So cull only when the arena is filling:
        # at most ONE per insertion, never the two newest.
        # "reference": the always-on 90%-redundancy rule — every redundant
        # keyframe goes, every insertion (LocalMapping::KeyFrameCulling
        # parity, src/LocalMapping.cc:634-720).
        reference_mode = self.cfg.kf_culling == "reference"
        if reference_mode or self.n_kf > int(0.75 * self.cfg.kf_cap):
            red = local_mapping.redundant_keyframes(store, kf_id)
            seqs = np.asarray(store.kf_seq)
            newest = np.argsort(seqs)[-2:]
            red_ids = [r for r in np.nonzero(np.asarray(red))[0]
                       if r not in newest]
            if not reference_mode:
                # cull enough to clear the pressure band (chunked mode can
                # insert several KFs between host events — one erase per
                # insertion cannot keep up and the arena deadlocks at the
                # cap: cap_ok blocks insertion, which blocks the cull that
                # would free a slot)
                target = int(0.75 * self.cfg.kf_cap)
                n_over = max(self.n_kf - target, 1)
                red_ids = red_ids[:n_over]
            for rid in red_ids:
                store = self._erase_keyframe(store, int(rid))

        # ---- loop closing (LoopClosing::Run body, synchronous) ----
        if self.loop_closer is not None:
            self.store = store
            self._maybe_retrain_vocab()
            store = self.store
            lc = self.loop_closer
            vec, cand = lc.add_and_detect(store, kf_id)
            if cand is not None:
                S = lc.compute_sim3(store, kf_id, cand)
                if S is not None:
                    store = lc.correct(store, self.cam, kf_id, cand, S)
                    # map moved globally: reset the motion model
                    self.velocity = None
        self.store = store

    # ------------------------------------------------------------------
    def reset(self):
        """Clear the map and all tracking state (Tracking::Reset,
        src/Tracking.cc:1511-1557)."""
        cfg = self.cfg
        self.store = MapStore.create(
            cfg.kf_cap, cfg.pt_cap, cfg.feat_cap, cfg.scale, cfg.n_levels)
        self.state = NOT_INITIALIZED
        self.Tcw = se3.identity()
        self.velocity = None
        self.last_feats = None
        self.last_obs = None
        self.ref_kf = 0
        self.n_kf = 0
        self.last_kf_frame = -10**9
        self.init_feats = None
        self.trajectory = []
        self.traj_anchors = []
        self.culled_anchors = {}
        self.n_last_inliers = 0
        self.loop_closer = None
        self._fstate = None

    def _relocalize(self, feats, frame_id, timestamp) -> bool:
        """Relocalization (Tracking::Relocalization,
        src/Tracking.cc:1348-1509): covisibility-group candidate detection
        + the full guided-match/PnP/reoptimize ladder, ALL candidates in
        one batched device program (slam/relocalization.py)."""
        from ..matching import vocabulary
        from . import relocalization

        cfg = self.cfg
        C = cfg.reloc_candidates
        if self.loop_closer is not None:
            lc = self.loop_closer
            words = vocabulary.assign_words(lc.vocab, feats.desc, feats.valid)
            vec = vocabulary.bow_vector(lc.vocab, words, feats.valid)
            cand_ids, cand_ok = relocalization.detect_candidates(
                lc.db, self.store, vec, n_cands=C, query_fn=lc.query_db)
        else:
            # no vocabulary yet (e.g. a freshly loaded map): try the most
            # recent keyframes
            ids = [k for k in range(self.store.kf_cap)
                   if bool(self.store.kf_valid[k])][-C:]
            ids = (ids + [-1] * C)[:C]
            cand_ids = jnp.asarray(ids, jnp.int32)
            cand_ok = cand_ids >= 0

        res = relocalization.attempt(
            self.store, self.cam, feats, cand_ids, cand_ok,
            self._next_key(), bf=cfg.bf,
            min_inliers=cfg.min_reloc_inliers,
            scale=cfg.scale, n_levels=cfg.n_levels)
        if not bool(res.ok):
            return False
        self.Tcw = res.Tcw
        self._last_Tcw = self.Tcw
        self.last_feats = feats
        self.last_obs = res.obs
        self.state = OK
        self.velocity = None
        return True
