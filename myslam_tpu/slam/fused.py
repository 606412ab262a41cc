"""Fully-fused tracking: the whole per-frame SLAM step as ONE device program.

The host-driven Tracker (slam/tracking.py) mirrors the reference's
control flow with Python branches; that costs ~8 host-device round trips
per frame — fatal when the chip sits behind a high-latency link and still
wasteful on a local PCIe chip. This module compiles the complete OK-state
step — motion-model matching, pose optimization (with fallback
reference-KF matching as a computed select), local-map tracking, the
keyframe decision, and the ENTIRE keyframe-insertion pass (depth points,
point culling, triangulation with covisible neighbors, fuse, local
Schur-complement BA) — into one jitted function with `lax.cond` gating
the keyframe branch, plus a `lax.scan` wrapper that tracks a CHUNK of
frames per dispatch (one host sync per chunk).

This is the reference's three-thread pipeline (SURVEY.md §2.4) re-drawn
for a TPU: Tracking + LocalMapping become sections of one compiled
program; the rare, host-paced events (monocular bootstrap, relocalization
after loss, loop closing, keyframe culling under arena pressure) stay on
the host and are entered only when the fused step reports them.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..features.frame import FrameFeatures
from ..geom import projection, se3
from ..geom.projection import Camera
from ..mapping import local_mapping, map_store
from ..mapping.map_store import NO_POINT, MapStore
from ..ops import indexing
from . import tracking
from .tracking import (OK, LOST, TrackingConfig,
                       _local_map_harvest, _local_map_match,
                       _motion_model_match, _pose_optimize,
                       _reference_kf_match)

# diagnostic: emit the keyframe-decision internals (c1a/c2/geo_t/geo_r
# and their scalar inputs) in the per-frame info dict. Costs one
# unconditional metric evaluation per frame — for tools/kf_rate.py only.
import os as _os
_DEBUG_KF = _os.environ.get("MYSLAM_DEBUG_KF", "") == "1"
# profiling knob: compile the step WITHOUT the keyframe-insertion cond
# (tools/chunk_breakdown.py uses it to price the cond's pass-through
# copies — a cond must materialize its operands/results even when the
# branch is not taken)
_NO_KF_BRANCH = _os.environ.get("MYSLAM_NO_KF_BRANCH", "") == "1"


@struct.dataclass
class TrackState:
    """Device-resident tracking state (everything the per-frame step
    reads or writes; the host holds only a mirror for rare events)."""

    store: MapStore
    Tcw: jnp.ndarray            # [3, 4]
    velocity: jnp.ndarray       # [3, 4] relative motion T_cur_last
    has_velocity: jnp.ndarray   # [] bool
    last_obs: jnp.ndarray       # [F] i32
    last_level: jnp.ndarray     # [F] i32
    last_angle: jnp.ndarray     # [F] f32
    ref_kf: jnp.ndarray         # [] i32
    last_kf_frame: jnp.ndarray  # [] i32
    frame_id: jnp.ndarray       # [] i32
    lost: jnp.ndarray           # [] bool
    # cached derived map structures — they only change at keyframe
    # events, so the per-frame step reuses them instead of rebuilding
    # [K,P] + [K,K] from kf_obs every frame (the reference's analogue:
    # KeyFrame::UpdateConnections maintains the covisibility graph
    # incrementally, src/KeyFrame.cc:289-379)
    B: jnp.ndarray              # [K, P] bool incidence
    W: jnp.ndarray              # [K, K] i32 covisibility
    # localization mode (Tracking::mbOnlyTracking): suppress keyframe
    # insertion, track against the frozen map
    frozen: jnp.ndarray         # [] bool


_FUSED_CACHE = {}


def get_fused_tracker(cam: Camera, cfg: TrackingConfig) -> "FusedTracker":
    """Shared FusedTracker instances: compiling the fused step is
    expensive, and jit caches are per-closure — reuse by (camera, config)
    so many Tracker instances (tests, resets) share one compilation."""
    import dataclasses

    key = (tuple(float(np.asarray(v)) for v in
                 (cam.fx, cam.fy, cam.cx, cam.cy, cam.k1, cam.k2,
                  cam.p1, cam.p2, cam.k3, cam.width, cam.height)),
           dataclasses.astuple(cfg))
    if key not in _FUSED_CACHE:
        _FUSED_CACHE[key] = FusedTracker(cam, cfg)
    return _FUSED_CACHE[key]


class FusedTracker:
    """Compiles and runs the fused per-frame step.

    Usage:
        ft = FusedTracker(cam, cfg)
        state = ft.state_from(tracker)          # after bootstrap
        state, info = ft.step(state, feats, t)  # one frame, one dispatch
        state, infos = ft.run_chunk(state, feats_chunk, ts)  # one sync
        ft.write_back(state, tracker)           # before host-side events
    """

    def __init__(self, cam: Camera, cfg: TrackingConfig, extractor=None):
        self.cam = cam
        self.cfg = cfg
        self.extractor = extractor
        self._step = jax.jit(self._build_step())
        self._chunk = jax.jit(self._build_chunk())
        self._img_chunk = (jax.jit(self._build_image_chunk())
                           if extractor is not None else None)

    # ------------------------------------------------------------------
    def state_from(self, tracker: tracking.Tracker) -> TrackState:
        """Snapshot a host Tracker (must be state==OK) into device state."""
        F = self.cfg.feat_cap
        lf = tracker.last_feats
        return TrackState(
            store=tracker.store,
            Tcw=jnp.asarray(tracker.Tcw),
            velocity=(jnp.asarray(tracker.velocity)
                      if tracker.velocity is not None else se3.identity()),
            has_velocity=jnp.asarray(tracker.velocity is not None),
            last_obs=jnp.asarray(tracker.last_obs),
            last_level=(lf.level if lf is not None
                        else jnp.zeros(F, jnp.int32)),
            last_angle=(lf.angle if lf is not None
                        else jnp.zeros(F, jnp.float32)),
            ref_kf=jnp.asarray(tracker.ref_kf, jnp.int32),
            last_kf_frame=jnp.asarray(tracker.last_kf_frame, jnp.int32),
            frame_id=jnp.asarray(tracker.frame_id, jnp.int32),
            lost=jnp.asarray(False),
            B=map_store.incidence(tracker.store),
            W=map_store.covisibility(tracker.store),
            frozen=jnp.asarray(bool(tracker.localization_only)),
        )

    def write_back(self, state: TrackState, tracker: tracking.Tracker,
                   last_feats: Optional[FrameFeatures] = None):
        """Mirror device state back into a host Tracker (for host-side
        events: relocalization, loop closing, saving)."""
        tracker.store = state.store
        tracker.Tcw = state.Tcw
        tracker._last_Tcw = state.Tcw
        # ONE batched device_get for all host-side scalars: each separate
        # int()/bool() coercion is its own ~41 ms round trip on the
        # tunnel, and write_back runs at every keyframe event
        hv, ref_kf, last_kf_frame, frame_id, n_kf, lost = jax.device_get(
            (state.has_velocity, state.ref_kf, state.last_kf_frame,
             state.frame_id, jnp.sum(state.store.kf_valid.astype(jnp.int32)),
             state.lost))
        tracker.velocity = state.velocity if bool(hv) else None
        tracker.last_obs = state.last_obs
        if last_feats is not None:
            tracker.last_feats = last_feats
        tracker.ref_kf = int(ref_kf)
        tracker.last_kf_frame = int(last_kf_frame)
        tracker.frame_id = int(frame_id)
        tracker.n_kf = int(n_kf)
        tracker.state = LOST if bool(lost) else OK

    def step(self, state, feats, timestamp, frame_id=None):
        """One frame. frame_id is the REAL host frame id (sequences with
        dropped frames must not mis-evaluate the c1a/min-gap keyframe
        rules, src/Tracking.cc:984-1068); defaults to the running counter
        for gap-free streams."""
        if frame_id is None:
            frame_id = state.frame_id
        return self._step(state, feats, jnp.float32(timestamp),
                          jnp.asarray(frame_id, jnp.int32))

    def refresh_store(self, state: TrackState, store: MapStore) -> TrackState:
        """Replace the store inside a TrackState after host-side map
        surgery (e.g. semantic culling) so the device state stays
        authoritative; recomputes state-cached derived structures."""
        return state.replace(store=store,
                             B=map_store.incidence(store),
                             W=map_store.covisibility(store))

    def run_chunk(self, state, feats_chunk, timestamps, frame_ids=None):
        """Track a chunk of frames in one dispatch. feats_chunk is a
        FrameFeatures pytree with a leading chunk axis; frame_ids carries
        the real per-frame ids (default: consecutive from the counter)."""
        n = jnp.asarray(timestamps).shape[0]
        if frame_ids is None:
            frame_ids = state.frame_id + jnp.arange(n, dtype=jnp.int32)
        return self._chunk(state, feats_chunk,
                           jnp.asarray(timestamps, jnp.float32),
                           jnp.asarray(frame_ids, jnp.int32))

    def run_images(self, state, images, timestamps, frame_ids=None):
        """Extraction + tracking over a chunk of raw images [C, H, W] in
        ONE dispatch — the minimum-host-interaction production mode
        (requires an extractor at construction). Pass uint8 images where
        possible: they cross the host-device link 4x cheaper and are
        widened on device."""
        n = jnp.asarray(timestamps).shape[0]
        if frame_ids is None:
            frame_ids = state.frame_id + jnp.arange(n, dtype=jnp.int32)
        return self._img_chunk(state, jnp.asarray(images),
                               jnp.asarray(timestamps, jnp.float32),
                               jnp.asarray(frame_ids, jnp.int32))

    # ------------------------------------------------------------------
    def _build_chunk(self):
        step = self._build_step()

        def chunk(state, feats_chunk, timestamps, frame_ids):
            def body(st, x):
                feats, ts, fid = x
                st2, info = step(st, feats, ts, fid)
                return st2, info

            return jax.lax.scan(body, state,
                                (feats_chunk, timestamps, frame_ids))

        return chunk

    def _build_image_chunk(self):
        step = self._build_step()
        extract = self.extractor._build()
        cam = self.cam

        def extract_one(img):
            img = img.astype(jnp.float32)  # uint8 transfers widen here
            feats = extract(img)
            und = projection.undistort_points(cam, feats.xy_raw)
            return feats.replace(
                xy=jnp.where(feats.valid[:, None], und, 0.0))

        batch_extract = _os.environ.get("MYSLAM_SCAN_EXTRACT", "") != "1"

        def chunk(state, images, timestamps, frame_ids):
            if batch_extract:
                # Extraction has no frame-to-frame dependency: batch the
                # whole chunk in one vmap ahead of the sequential scan.
                # (Round-2 note claimed the vmap was slower; re-measured in
                # round 4 at highest matmul precision the vmap arrangement
                # is the one matching the healthy c90ebba configuration.)
                feats_chunk = jax.vmap(extract_one)(images)

                def body(st, x):
                    feats, ts, fid = x
                    return step(st, feats, ts, fid)

                return jax.lax.scan(
                    body, state, (feats_chunk, timestamps, frame_ids))

            def body(st, x):
                img, ts, fid = x
                return step(st, extract_one(img), ts, fid)

            return jax.lax.scan(body, state, (images, timestamps, frame_ids))

        return chunk

    def _build_step(self):
        cam = self.cam
        cfg = self.cfg
        sensor = cfg.sensor
        bf = float(cfg.bf)
        F = cfg.feat_cap

        def select(pred, a, b):
            return jax.tree.map(
                lambda x, y: jnp.where(pred, x, y), a, b)

        # ---------------- keyframe-insertion branch ----------------
        def insert_keyframe(args):
            store, Tcw, feats, cur_obs, frame_id, timestamp = args
            store, kf_id = map_store.add_keyframe(
                store, Tcw, feats, cur_obs, frame_id, timestamp)

            if sensor != 0:
                # unproject close-depth features without a point
                # (src/Tracking.cc:1086-1142)
                no_obs = store.kf_obs[kf_id] < 0
                dd = jnp.where(feats.valid & no_obs & (feats.depth > 0),
                               feats.depth, jnp.inf)
                order = jnp.argsort(dd)
                rank = jnp.zeros(F, jnp.int32).at[order].set(
                    jnp.arange(F, dtype=jnp.int32))
                want = jnp.isfinite(dd) & ((dd < cfg.th_depth)
                                           | (rank < 100))
                slots = map_store.allocate_points(store, want)
                xyz_c = projection.backproject(cam, feats.xy, feats.depth)
                xyz_w = se3.transform(se3.inverse(Tcw), xyz_c)
                store = map_store.write_points(
                    store, slots, xyz=xyz_w, desc=feats.desc,
                    normal=jnp.zeros((F, 3)), min_dist=jnp.zeros(F),
                    max_dist=jnp.ones(F),
                    ref_kf=jnp.full(F, 1, jnp.int32) * kf_id,
                    ref_level=feats.level,
                    first_kf=jnp.full(F, 1, jnp.int32)
                    * store.kf_seq[kf_id])
                store = map_store.set_observations(
                    store, kf_id, jnp.arange(F), slots, slots >= 0)

            own = store.kf_obs[kf_id]
            store = map_store.refresh_point_stats(
                store, jnp.where(own >= 0, own, -1))
            store = local_mapping.cull_points(store, kf_id)

            # triangulate with the best covisible neighbors
            nb_ids, _ = local_mapping.top_covisible(
                store, kf_id, cfg.tri_neighbors)
            # spanning tree: parent = best covisible keyframe
            # (src/KeyFrame.cc:289-379)
            store = map_store.set_parent(
                store, kf_id, jnp.where(nb_ids[0] >= 0, nb_ids[0], -1))

            def tri_body(st, nb):
                st2 = jax.lax.cond(
                    nb >= 0,
                    lambda s: local_mapping._triangulate_and_insert(
                        s, cam, kf_id, jnp.maximum(nb, 0),
                        cfg.max_new_points, refresh=False),
                    lambda s: s, st)
                return st2, None

            store, _ = jax.lax.scan(tri_body, store, nb_ids)
            # one stats refresh covers every new point (kf_id observes
            # them all); fuse below needs their distance bands
            own = store.kf_obs[kf_id]
            store = map_store.refresh_point_stats(
                store, jnp.where(own >= 0, own, -1))

            # fuse with the top neighbors (SearchInNeighbors) extended by
            # each neighbor's best covisible keyframes — the reference's
            # second-order target harvest (src/LocalMapping.cc:463-475)
            def fuse_body(st, nb):
                def run(s):
                    own_pts = s.kf_obs[kf_id]
                    s = local_mapping.fuse_into_keyframe(
                        s, cam, jnp.maximum(nb, 0), own_pts, own_pts >= 0)
                    nb_pts = s.kf_obs[jnp.maximum(nb, 0)]
                    return local_mapping.fuse_into_keyframe(
                        s, cam, kf_id, nb_pts, nb_pts >= 0)

                return jax.lax.cond(nb >= 0, run, lambda s: s, st), None

            fuse_first = nb_ids[:cfg.fuse_neighbors]
            if cfg.fuse_second_order > 0:
                K = store.kf_cap
                Wk = map_store.covisibility(store)
                sel = indexing.onehot(fuse_first, K)          # [f, K]
                rows2 = jnp.dot(sel, Wk.astype(jnp.float32),
                                preferred_element_type=jnp.float32)
                is_first = indexing.bincount_mm(fuse_first, K) > 0
                mask2 = store.kf_valid & ~is_first
                mask2 = mask2.at[kf_id].set(False)
                rows2 = jnp.where(mask2[None, :], rows2, -1.0)
                w2, ids2 = jax.lax.top_k(rows2, cfg.fuse_second_order)
                ids2 = jnp.where((w2 > 0) & (fuse_first >= 0)[:, None],
                                 ids2, -1)
                flat2 = ids2.reshape(-1)
                # dedup: the same keyframe reachable from two first-order
                # neighbors would be fused twice (the reference dedups
                # via a set, src/LocalMapping.cc:463-475) — mask repeats
                # so the scan skips them
                oh2 = (indexing.onehot(flat2, K)
                       * (flat2 >= 0)[:, None].astype(jnp.float32))
                seen_before = (jnp.cumsum(oh2, axis=0) - oh2)  # [n, K]
                dup = jnp.sum(seen_before * oh2, axis=1) > 0
                flat2 = jnp.where(dup, -1, flat2)
                fuse_targets = jnp.concatenate([fuse_first, flat2])
            else:
                fuse_targets = fuse_first
            store, _ = jax.lax.scan(fuse_body, store, fuse_targets)
            own = store.kf_obs[kf_id]
            store = map_store.refresh_point_stats(
                store, jnp.where(own >= 0, own, -1))

            # local BA once the map has >2 keyframes
            def run_ba(s):
                prob, kf_slots, pt_slots, e_feat, e_src = \
                    local_mapping.build_local_ba(
                        s, kf_id, cfg.ba_free, cfg.ba_fixed, cfg.ba_pts,
                        cfg.ba_obs, stereo=sensor != 0, bf=bf)
                from ..optim import ba as ba_mod
                prob, inlier = ba_mod.bundle_adjust(
                    cam, prob, cfg.ba_iters1, cfg.ba_iters2,
                    o_group=cfg.ba_obs)
                return local_mapping.apply_local_ba(
                    s, prob, inlier, kf_slots, pt_slots, e_feat, e_src)

            n_kf = jnp.sum(store.kf_valid.astype(jnp.int32))
            store = jax.lax.cond(n_kf > 2, run_ba, lambda s: s, store)
            # refresh the cached incidence/covisibility ONCE per insertion
            # (the per-frame step reuses them from TrackState)
            B = map_store.incidence(store)
            return store, kf_id, B, map_store.covisibility_from(B)

        # ---------------- the per-frame step ----------------
        def step(state: TrackState, feats: FrameFeatures, timestamp,
                 frame_id):
            store = state.store

            # --- initial pose: motion model with widening retry,
            #     reference-KF matching as computed fallback ---
            T_pred = select(state.has_velocity,
                            se3.compose(state.velocity, state.Tcw),
                            state.Tcw)
            obs_a = _motion_model_match(
                store, cam, T_pred, feats, state.last_obs,
                state.last_level, state.last_angle)
            n_a = jnp.sum((obs_a >= 0).astype(jnp.int32))
            n_last = jnp.maximum(
                jnp.sum((state.last_obs >= 0).astype(jnp.int32)), 1)
            need_wide = n_a < jnp.maximum(cfg.min_track_matches, n_last // 2)
            # widened retry only when the narrow window was scarce
            # (src/Tracking.cc:894-906) — lax.cond skips it otherwise
            obs_mm = jax.lax.cond(
                need_wide,
                lambda _: _motion_model_match(
                    store, cam, T_pred, feats, state.last_obs,
                    state.last_level, state.last_angle, th=30.0),
                lambda _: obs_a, None)
            n_mm = jnp.sum((obs_mm >= 0).astype(jnp.int32))

            T1, obs1, n1 = _pose_optimize(
                store, cam, T_pred, feats, obs_mm, bf, escape=False,
                rounds=cfg.pose_rounds_mid, iters=cfg.pose_iters_mid)
            mm_ok = (state.has_velocity & (n_mm >= cfg.min_track_matches)
                     & (n1 >= cfg.min_track_inliers))

            # reference-KF fallback (src/Tracking.cc:319) only runs when
            # the motion model failed — lax.cond executes one branch
            def ref_fallback(_):
                obs_r = _reference_kf_match(store, cam, feats,
                                            state.ref_kf)
                T2, obs2, n2 = _pose_optimize(
                    store, cam, state.Tcw, feats, obs_r, bf, escape=False,
                    rounds=cfg.pose_rounds_mid, iters=cfg.pose_iters_mid)
                ok = ((jnp.sum((obs_r >= 0).astype(jnp.int32))
                       >= cfg.min_track_matches // 2)
                      & (n2 >= cfg.min_track_inliers))
                return T2, obs2, ok

            def mm_passthrough(_):
                return T1, obs1, jnp.asarray(True)

            Tcw, cur_obs, path_ok = jax.lax.cond(
                mm_ok, mm_passthrough, ref_fallback, None)
            tracked_pre = path_ok

            # --- local-map tracking ---
            pt_ids, local_ids, local_on = _local_map_harvest(
                store, cur_obs, cfg.local_kf, cfg.local_pts,
                B=state.B, W=state.W)
            cur_obs, visible = _local_map_match(
                store, cam, Tcw, feats, cur_obs, pt_ids)
            Tcw, cur_obs, n_in = _pose_optimize(
                store, cam, Tcw, feats, cur_obs, bf)

            # A tracker that went lost earlier in a scanned chunk STAYS
            # lost (the host decides recovery via relocalization): without
            # the ~state.lost gate, later frames in the chunk would keep
            # re-matching against the stale last_obs and could silently
            # "recover" (diverging from the host LOST path,
            # src/Tracking.cc:325). Folded into per-leaf freeze selects
            # below — an outer lax.cond over the whole step costs a
            # per-frame copy of the full MapStore.
            tracked = (tracked_pre & (n_in >= cfg.min_local_inliers)
                       & ~state.lost)
            lost = ~tracked

            # counter bumps masked by `tracked` so the store is untouched
            # on a lost frame WITHOUT a whole-store select at the end of
            # the step (MapStore leaves are ~12 MB; per-leaf where-copies
            # cost real per-frame time inside the scanned chunk)
            store = map_store.bump_counters(
                store,
                jnp.where(tracked, visible, -1),
                jnp.where(tracked & (cur_obs >= 0), cur_obs, -1))

            # --- keyframe decision (src/Tracking.cc:984-1068) ---
            n_kf = jnp.sum(store.kf_valid.astype(jnp.int32))
            cap_ok = n_kf < cfg.kf_cap - 2
            gap_ok = (frame_id
                      >= state.last_kf_frame + cfg.min_frames_between_kf)
            pre_ok = (tracked & cap_ok & gap_ok & (n_in > 15)
                      & ~state.frozen)

            def kf_metrics_aux(_):
                # only points with >= 3 observations count
                # (KeyFrame::TrackedMapPoints(3), src/Tracking.cc:1002-1006)
                ref_obs = store.kf_obs[state.ref_kf]
                # a point is observed at most once per keyframe, so the
                # observation count is a column sum of the cached incidence
                obs_cnt = jnp.sum(state.B.astype(jnp.int32), axis=0)
                ref_tracked = jnp.sum(
                    ((ref_obs >= 0)
                     & (obs_cnt[jnp.clip(ref_obs, 0,
                                         store.pt_cap - 1)] >= 3)
                     ).astype(jnp.int32))
                c1a = (frame_id
                       >= state.last_kf_frame + cfg.max_frames_between_kf)
                c2 = ((n_in < 0.9 * ref_tracked)
                      & (n_in < 0.7 * ref_tracked))
                T_ref = store.kf_pose[state.ref_kf]
                base = jnp.linalg.norm(
                    se3.camera_center(Tcw) - se3.camera_center(T_ref))
                med = local_mapping.scene_median_depth(store, state.ref_kf)
                geo_t = base > cfg.kf_baseline_ratio * jnp.maximum(med,
                                                                   1e-6)
                R_rel = se3.rotation(Tcw) @ se3.rotation(T_ref).T
                ang = jnp.degrees(jnp.arccos(jnp.clip(
                    (jnp.trace(R_rel) - 1.0) / 2.0, -1.0, 1.0)))
                geo_r = ang > cfg.kf_rotation_deg
                need = c1a | c2 | geo_t | geo_r
                if sensor != 0:
                    close = (feats.valid & (feats.depth > 0)
                             & (feats.depth < cfg.th_depth))
                    tracked_close = jnp.sum(
                        (close & (cur_obs >= 0)).astype(jnp.int32))
                    untracked_close = jnp.sum(
                        (close & (cur_obs < 0)).astype(jnp.int32))
                    need = need | ((tracked_close < 100)
                                   & (untracked_close > 70))
                aux = {"c1a": c1a, "c2": c2, "geo_t": geo_t,
                       "geo_r": geo_r, "ref_tracked": ref_tracked,
                       "base": base, "med": med, "ang": ang}
                return need, aux

            def kf_metrics(_):
                return kf_metrics_aux(None)[0]

            # metric computation (obs counts, median depth) skipped
            # entirely when capacity/gap gates already say no
            if _DEBUG_KF:
                need_raw, dbg_aux = kf_metrics_aux(None)
                dbg_aux["n_mm"] = n_mm
                dbg_aux["n_merged"] = jnp.sum(
                    (cur_obs >= 0).astype(jnp.int32))
                dbg_aux["mm_ok"] = mm_ok
                need_kf = pre_ok & need_raw
            else:
                dbg_aux = None
                need_kf = jax.lax.cond(
                    pre_ok, kf_metrics, lambda _: jnp.asarray(False), None)

            if _NO_KF_BRANCH:
                store2, kf_id, B2, W2 = store, state.ref_kf, state.B, state.W
                need_kf = jnp.asarray(False)
            else:
                store2, kf_id, B2, W2 = jax.lax.cond(
                    need_kf, insert_keyframe,
                    lambda args: (args[0], state.ref_kf, state.B, state.W),
                    (store, Tcw, feats, cur_obs, frame_id, timestamp))
            # after insertion the keyframe row is authoritative (map
            # surgery may have remapped point slots)
            cur_obs = jnp.where(need_kf, store2.kf_obs[kf_id], cur_obs)
            Tcw = select(need_kf, store2.kf_pose[kf_id], Tcw)

            velocity = se3.compose(Tcw, se3.inverse(state.Tcw))
            # Lost-frame freeze is folded into PER-LEAF selects on the
            # small leaves only: the big leaves (store, B, W) are already
            # untouched on a lost frame — bump_counters is masked by
            # `tracked` above and the keyframe cond requires `tracked` —
            # so no whole-MapStore where-copy is needed (that outer
            # select cost ~25 leaf copies per frame inside the chunk
            # scan). state.replace (not a fresh TrackState) so newly
            # added fields (e.g. frozen) carry through by default.
            new_state = state.replace(
                store=store2,
                Tcw=select(tracked, Tcw, state.Tcw),
                velocity=select(tracked, velocity, state.velocity),
                has_velocity=jnp.where(tracked, True, state.has_velocity),
                last_obs=jnp.where(tracked, cur_obs, state.last_obs),
                last_level=jnp.where(tracked, feats.level,
                                     state.last_level),
                last_angle=jnp.where(tracked, feats.angle,
                                     state.last_angle),
                ref_kf=jnp.where(need_kf, kf_id, state.ref_kf),
                last_kf_frame=jnp.where(need_kf, frame_id,
                                        state.last_kf_frame),
                frame_id=frame_id + 1,
                lost=lost,
                B=B2,
                W=W2,
            )
            info = {"Tcw": select(tracked, Tcw, state.Tcw),
                    "tracked": tracked,
                    "n_inliers": jnp.where(tracked, n_in, 0),
                    "new_kf": need_kf,
                    # slot of the keyframe inserted THIS frame (-1 if
                    # none) so chunked mode can run per-keyframe host
                    # events for every insertion, not just the last
                    "kf_id": jnp.where(need_kf, kf_id, -1),
                    # trajectory anchor: the reference keyframe (by its
                    # immutable seq id) and its pose AT TRACK TIME, so the
                    # host can re-express saved poses relative to loop-
                    # corrected keyframes (System::SaveTrajectoryTUM
                    # reconstructs Tcw = Tcr * Trw, src/System.cc:323-409)
                    "ref_seq": store2.kf_seq[jnp.where(need_kf, kf_id,
                                                       state.ref_kf)],
                    "T_ref": store2.kf_pose[jnp.where(need_kf, kf_id,
                                                      state.ref_kf)]}
            if dbg_aux is not None:
                info.update(dbg_aux)
            return new_state, info

        return step
