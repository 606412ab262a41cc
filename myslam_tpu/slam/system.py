"""System facade: the user-facing API of the framework.

TPU-native replacement for ORB_SLAM2::System (reference include/System.h,
src/System.cc): owns the extractor, tracker (with its synchronous mapping
and loop-closing passes) and exposes TrackMonocular, mode switches, reset,
trajectory savers — plus SaveMap/LoadMap, which the reference left as a
TODO (System.h:116-118) and which is trivial here because the map IS a
pytree of arrays.
"""

from __future__ import annotations

import pickle
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..features import frame as frame_mod
from ..features.extractor import ORBExtractor
from ..geom.projection import Camera
from ..io import trajectory as traj_io
from ..mapping.map_store import MapStore
from ..utils.config import Settings, load_settings
from . import tracking

MONOCULAR = 0
STEREO = 1
RGBD = 2


class System:
    """Monocular SLAM system.

    Usage mirrors the reference examples (Examples/Monocular/mono_tum.cc):
        slam = System(settings=Settings(...) or "config.yaml")
        for img, t in frames:
            Tcw = slam.track_monocular(img, t)
        slam.save_keyframe_trajectory_tum("KeyFrameTrajectory.txt")
        slam.shutdown()
    """

    def __init__(self, settings="", sensor: int = MONOCULAR,
                 tracking_config: Optional[tracking.TrackingConfig] = None,
                 use_viewer: bool = False, detector=None,
                 semantic_filter=None, vocab_file: str = ""):
        if isinstance(settings, str) and settings:
            self.settings = load_settings(settings)
        elif isinstance(settings, Settings):
            self.settings = settings
        else:
            self.settings = Settings()
        s = self.settings
        self.cam = Camera.create(
            fx=s.fx, fy=s.fy, cx=s.cx, cy=s.cy, k1=s.k1, k2=s.k2,
            p1=s.p1, p2=s.p2, k3=s.k3, width=s.width, height=s.height)
        self.extractor = ORBExtractor(
            s.height, s.width, n_features=s.n_features,
            n_levels=s.n_levels, scale=s.scale_factor,
            ini_th_fast=s.ini_th_fast, min_th_fast=s.min_th_fast)
        import dataclasses
        # close/far split in meters: mThDepth = mbf * ThDepth / fx
        # (reference src/Tracking.cc:136-142)
        th_depth_m = (s.bf / s.fx) * s.th_depth if s.bf > 0 else 3.0
        cfg = tracking_config or tracking.TrackingConfig(
            scale=s.scale_factor, n_levels=s.n_levels,
            sensor=sensor, bf=s.bf, th_depth=th_depth_m)
        if tracking_config is not None and cfg.sensor != sensor:
            cfg = dataclasses.replace(cfg, sensor=sensor, bf=s.bf,
                                      th_depth=th_depth_m)
        if cfg.feat_cap != self.extractor.capacity:
            cfg = dataclasses.replace(cfg, feat_cap=self.extractor.capacity)
        # pretrained vocabulary: ctor arg wins, else the settings-file key
        # (Vocabulary.path) — mirrors the reference's System(strVocFile,...)
        vp = vocab_file or s.vocab_path
        if vp and cfg.vocab_path != vp:
            cfg = dataclasses.replace(cfg, vocab_path=vp)
        self.sensor = sensor
        self.tracker = tracking.Tracker(self.cam, cfg)
        self.localization_only = False
        self._frame_id = 0
        self.frame_times = []
        # semantic fusion (BASELINE config 4): a models.yolo.Yolo (or any
        # object with .detect(img)->[{class_id, box, ...}]) plus the gating
        # filter. The reference never wired its detector in (SURVEY.md §0).
        self.detector = detector
        if semantic_filter is None and detector is not None:
            from .semantic import SemanticFilter
            semantic_filter = SemanticFilter()
        self.semantic_filter = semantic_filter
        # Headless "viewer": writes frame overlays + map renders as PNG
        # artifacts (viz/viewer.py) instead of the reference's Pangolin
        # window (src/Viewer.cc).
        self.viewer = None
        if use_viewer:
            from ..viz import Viewer
            self.viewer = Viewer()

    # ------------------------------------------------------------------
    @staticmethod
    def _to_gray(image):
        img = jnp.asarray(image, jnp.float32)
        if img.ndim == 3:
            return (0.299 * img[..., 0] + 0.587 * img[..., 1]
                    + 0.114 * img[..., 2]), img
        return img, img

    def _maybe_detect(self, img, detections):
        if detections is None and self.detector is not None:
            rgb = img if img.ndim == 3 else jnp.repeat(
                img[..., None], 3, axis=-1)
            detections = self.detector.detect(np.asarray(rgb) / 255.0)
        return detections

    def _track_common(self, feats, timestamp, detections, t0, image=None):
        """Shared tail of Track{Monocular,Stereo,RGBD}: semantic gating,
        tracking step, semantic map culling, viewer update, timing."""
        if detections and self.semantic_filter is not None:
            feats = self.semantic_filter.filter_features(feats, detections)
        if timestamp is None:
            timestamp = self._frame_id / max(self.settings.fps, 1.0)
        tracked = self.tracker.process_frame(
            feats, self._frame_id, timestamp)
        if tracked and detections and self.semantic_filter is not None:
            # Under the fused fast path the authoritative store/last_obs
            # live in the device TrackState, not the host mirror — culling
            # the mirror would be clobbered by the next write_back.
            tr = self.tracker
            if tr._fstate is not None:
                st = tr._fstate
                new_store = self.semantic_filter.update_and_cull(
                    st.store, self.cam, st.Tcw, st.last_obs, detections)
                tr._fstate = tr._fused.refresh_store(st, new_store)
                tr.store = new_store
            else:
                tr.store = self.semantic_filter.update_and_cull(
                    tr.store, self.cam, tr.Tcw, tr.last_obs, detections)
        if self.viewer is not None and image is not None:
            tr = self.tracker
            store, last_obs = tr.store, tr.last_obs
            if tr._fstate is not None:  # fused path: host mirror is stale
                store, last_obs = tr._fstate.store, tr._fstate.last_obs
            tm = (np.asarray(last_obs) >= 0) \
                if tracked and last_obs is not None else None
            self.viewer.update(
                np.asarray(image), feats, tm, detections,
                store=store, Tcw=tr.Tcw, state=tr.state)
        self._frame_id += 1
        self.frame_times.append(time.perf_counter() - t0)
        return np.asarray(self.tracker.Tcw) if tracked else None

    def track_monocular(self, image, timestamp: float = None,
                        detections=None):
        """One tracking step on a [H, W] (or [H, W, 3]) image.
        Returns the current camera pose Tcw [3, 4] (None before init) —
        System::TrackMonocular (src/System.cc:219-269).

        detections: optional precomputed YOLO detections for this frame;
        if None and a detector is attached, it runs here. Dynamic-class
        features are masked before tracking and repeat-offender map points
        culled after (slam/semantic.py)."""
        t0 = time.perf_counter()
        gray, img = self._to_gray(image)
        detections = self._maybe_detect(img, detections)
        feats = self.extractor(gray)
        feats = frame_mod.undistort(self.cam, feats)
        return self._track_common(feats, timestamp, detections, t0,
                                  image=gray)

    def track_stereo(self, left, right, timestamp: float = None,
                     detections=None):
        """One tracking step on a rectified stereo pair
        (System::TrackStereo, src/System.cc:130-180): ORB on both images
        (the reference extracts L/R in two threads, src/Frame.cc:77-80 —
        here both are device programs), stereo matching for per-feature
        depth, then the common tracking step with stereo edges."""
        t0 = time.perf_counter()
        from ..ops import stereo as stereo_ops
        grayL, imgL = self._to_gray(left)
        grayR, _ = self._to_gray(right)
        detections = self._maybe_detect(imgL, detections)
        featsL = self.extractor(grayL)
        featsR = self.extractor(grayR)
        bf = self.settings.bf
        baseline = bf / self.settings.fx
        u_right, depth = stereo_ops.match_stereo(
            featsL, featsR, grayL, grayR, bf, min_z=baseline,
            scale=self.settings.scale_factor)
        featsL = frame_mod.undistort(self.cam, featsL)
        featsL = featsL.replace(u_right=u_right, depth=depth)
        return self._track_common(featsL, timestamp, detections, t0,
                                  image=grayL)

    def track_rgbd(self, image, depth_image, timestamp: float = None,
                   detections=None):
        """One tracking step on a registered RGB-D pair
        (System::TrackRGBD, src/System.cc:182-217 +
        Frame::ComputeStereoFromRGBD, src/Frame.cc:643-664)."""
        t0 = time.perf_counter()
        from ..ops import stereo as stereo_ops
        gray, img = self._to_gray(image)
        detections = self._maybe_detect(img, detections)
        feats = self.extractor(gray)
        feats = frame_mod.undistort(self.cam, feats)
        u_right, depth = stereo_ops.stereo_from_depth(
            feats, jnp.asarray(depth_image, jnp.float32), self.settings.bf,
            depth_factor=self.settings.depth_map_factor)
        feats = feats.replace(u_right=u_right, depth=depth)
        return self._track_common(feats, timestamp, detections, t0,
                                  image=gray)

    def track_features(self, feats, timestamp: float = None):
        """Tracking step on precomputed FrameFeatures (benchmarks/tests)."""
        if timestamp is None:
            timestamp = self._frame_id / max(self.settings.fps, 1.0)
        tracked = self.tracker.process_frame(
            feats, self._frame_id, timestamp)
        self._frame_id += 1
        return np.asarray(self.tracker.Tcw) if tracked else None

    # ------------------------------------------------------------------
    def _set_localization_mode(self, on: bool):
        """Localization mode: track against the frozen map, never insert
        keyframes (System::ActivateLocalizationMode ->
        Tracking::InformOnlyTracking, src/System.cc:271-281). Honored by
        both tracking paths: the host Tracker checks .localization_only
        and the fused step carries it as TrackState.frozen — no path
        switching, no monkey-patching."""
        import jax.numpy as jnp_

        self.localization_only = on
        tr = self.tracker
        tr.localization_only = on
        if tr._fstate is not None:
            tr._fstate = tr._fstate.replace(frozen=jnp_.asarray(bool(on)))

    def activate_localization_mode(self):
        self._set_localization_mode(True)

    def deactivate_localization_mode(self):
        self._set_localization_mode(False)

    def reset(self):
        """Clear map and tracking state (System::Reset -> Tracking::Reset,
        src/Tracking.cc:1511-1557)."""
        cfg = self.tracker.cfg
        self.tracker = tracking.Tracker(self.cam, cfg)
        self._frame_id = 0
        self.frame_times = []

    def shutdown(self):
        """No threads to join in the synchronous design — kept for API
        parity (System::Shutdown, src/System.cc:302-321)."""

    # ------------------------------------------------------------------
    def map_changed(self) -> bool:
        """Monotone map-version check (System::MapChanged via the big-change
        index, src/System.cc:283-294): here any keyframe insertion bumps
        next_seq, which is exactly the version counter."""
        v = int(self.tracker.store.next_seq)
        changed = v != getattr(self, "_last_map_version", -1)
        self._last_map_version = v
        return changed

    @property
    def n_keyframes(self) -> int:
        return int(self.tracker.store.kf_valid.sum())

    @property
    def n_map_points(self) -> int:
        return int(self.tracker.store.pt_valid.sum())

    def tracking_stats(self):
        """Median/mean frame time like the example mains print
        (mono_tum.cc:112-121)."""
        if not self.frame_times:
            return {"median_s": 0.0, "mean_s": 0.0}
        t = sorted(self.frame_times)
        return {"median_s": t[len(t) // 2],
                "mean_s": sum(t) / len(t)}

    # ------------------------------------------------------------------
    def save_trajectory_tum(self, path: str):
        """All tracked frames, TUM format, re-anchored to the current
        (loop-corrected) keyframe poses (System::SaveTrajectoryTUM
        reconstructs Tcw = Tcr * Trw, src/System.cc:323-391)."""
        traj_io.save_tum(path, self.tracker.corrected_trajectory())

    def save_keyframe_trajectory_tum(self, path: str):
        """Keyframe poses only (System::SaveKeyFrameTrajectoryTUM,
        src/System.cc:393-428)."""
        store = self.tracker.store
        kfs = []
        ids = np.nonzero(np.asarray(store.kf_valid))[0]
        order = ids[np.argsort(np.asarray(store.kf_seq)[ids])]
        for k in order:
            kfs.append((int(store.kf_frame_id[k]),
                        float(store.kf_timestamp[k]),
                        np.asarray(store.kf_pose[k])))
        traj_io.save_tum(path, kfs)

    def save_trajectory_kitti(self, path: str):
        traj_io.save_kitti(path, self.tracker.corrected_trajectory())

    # ------------------------------------------------------------------
    def save_map(self, path: str):
        """Serialize the whole map — the reference's TODO (System.h:116-118)
        is one pytree dump here."""
        store = self.tracker.store
        arrays = {f: np.asarray(getattr(store, f))
                  for f in store.__dataclass_fields__
                  if f not in ("scale", "n_levels")}
        meta = {"scale": store.scale, "n_levels": store.n_levels}
        with open(path, "wb") as f:
            pickle.dump({"arrays": arrays, "meta": meta}, f)

    def load_map(self, path: str):
        with open(path, "rb") as f:
            blob = pickle.load(f)
        arrays = {k: jnp.asarray(v) for k, v in blob["arrays"].items()}
        store = MapStore(**arrays, **blob["meta"])
        self.tracker.store = store
        self.tracker.n_kf = int(store.kf_valid.sum())
        if self.tracker.n_kf >= 2:
            self.tracker.state = tracking.LOST  # relocalize into the map
