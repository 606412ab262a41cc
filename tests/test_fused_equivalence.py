"""Fused device step vs host-driven tracking: the two implementations of
the OK-state per-frame step (slam/fused.py vs slam/tracking.Tracker host
path) must stay behaviorally equivalent — same sequence, both must track
every frame with closely matching trajectories (small numeric divergence
from evaluation-order differences is fine; structural divergence is a
bug)."""

import numpy as np
import pytest

from myslam_tpu.io import synthetic
from myslam_tpu.slam import tracking

BF = 45.0
N_FRAMES = 24


def _run(use_fused: bool):
    cam = synthetic.default_camera()
    seq = synthetic.FeatureSequence(cam, n_points=2000, feat_cap=384,
                                    noise_px=0.3, desc_flips=2,
                                    bf=BF, depth_noise=0.3, seed=11)
    cfg = tracking.TrackingConfig(
        kf_cap=32, pt_cap=4096, feat_cap=384,
        local_kf=6, local_pts=1024,
        ba_free=6, ba_fixed=6, ba_pts=1024, ba_obs=6,
        tri_neighbors=3, max_new_points=128,
        sensor=1, bf=BF, th_depth=4.0, min_init_depth_points=150,
        enable_loop_closing=False, use_fused=use_fused)
    tr = tracking.Tracker(cam, cfg)
    centers = {}
    for i in range(N_FRAMES):
        feats, _ = seq.frame(i)
        if tr.process_frame(feats, i, i * 0.1):
            T = np.asarray(tr.Tcw)
            centers[i] = -T[:, :3].T @ T[:, 3]
    return tr, centers, seq


@pytest.fixture(scope="module")
def both_runs():
    return _run(False), _run(True)


class TestFusedEquivalence:
    def test_both_track_all_frames(self, both_runs):
        (tr_h, c_h, _), (tr_f, c_f, _) = both_runs
        assert len(c_h) == N_FRAMES
        assert len(c_f) == N_FRAMES

    def test_trajectories_agree(self, both_runs):
        (tr_h, c_h, seq), (tr_f, c_f, _) = both_runs
        # both must be accurate in absolute (stereo) scale...
        for c, name in ((c_h, "host"), (c_f, "fused")):
            errs = [np.linalg.norm(c[i] - seq.gt_center(i)) for i in c]
            rmse = float(np.sqrt(np.mean(np.square(errs))))
            assert rmse < 0.03, f"{name} rmse {rmse}"
        # ...and close to each other
        div = [np.linalg.norm(c_h[i] - c_f[i]) for i in range(N_FRAMES)]
        assert max(div) < 0.03, f"max host/fused divergence {max(div)}"

    def test_similar_map_structure(self, both_runs):
        (tr_h, *_), (tr_f, *_) = both_runs
        n_h = int(tr_h.store.kf_valid.sum())
        n_f = int(tr_f.store.kf_valid.sum())
        assert abs(n_h - n_f) <= 2, (n_h, n_f)
        p_h = int(tr_h.store.pt_valid.sum())
        p_f = int(tr_f.store.pt_valid.sum())
        assert abs(p_h - p_f) < 0.4 * max(p_h, p_f), (p_h, p_f)


def _run_gappy(use_fused: bool, ids):
    """Same sequence but with dropped frames: the REAL ids must drive the
    c1a / min-gap keyframe rules identically in both paths
    (fused.step(frame_id=...) vs the host Tracker)."""
    cam = synthetic.default_camera()
    seq = synthetic.FeatureSequence(cam, n_points=2000, feat_cap=384,
                                    noise_px=0.3, desc_flips=2,
                                    bf=BF, depth_noise=0.3, seed=11)
    cfg = tracking.TrackingConfig(
        kf_cap=32, pt_cap=4096, feat_cap=384,
        local_kf=6, local_pts=1024,
        ba_free=6, ba_fixed=6, ba_pts=1024, ba_obs=6,
        tri_neighbors=3, max_new_points=128,
        sensor=1, bf=BF, th_depth=4.0, min_init_depth_points=150,
        min_frames_between_kf=3,
        enable_loop_closing=False, use_fused=use_fused)
    tr = tracking.Tracker(cam, cfg)
    for k, i in enumerate(ids):
        feats, _ = seq.frame(k)
        tr.process_frame(feats, i, i * 0.1)
    return tr


class TestGappyFrameIds:
    def test_kf_gap_rules_use_real_ids(self):
        # every 3rd/4th frame dropped: ids advance faster than the count
        ids = [0, 1, 2, 5, 6, 9, 12, 13, 16, 19, 20, 23, 26, 27, 30, 33]
        tr_h = _run_gappy(False, ids)
        tr_f = _run_gappy(True, ids)
        n_h = int(tr_h.store.kf_valid.sum())
        n_f = int(tr_f.store.kf_valid.sum())
        assert abs(n_h - n_f) <= 1, (n_h, n_f)
        # last_kf_frame must be a REAL id in both paths
        assert tr_f.last_kf_frame in ids or tr_f.last_kf_frame <= 1
        assert tr_h.last_kf_frame in ids or tr_h.last_kf_frame <= 1


class TestChunkedTrajectory:
    def test_process_chunk_fills_trajectory(self):
        """Production chunked mode: per-frame (frame_id, timestamp, Tcw)
        surfaces into Tracker.trajectory so SaveTrajectoryTUM works."""
        import jax

        cam = synthetic.default_camera()
        seq = synthetic.FeatureSequence(cam, n_points=2000, feat_cap=384,
                                        noise_px=0.3, desc_flips=2,
                                        bf=BF, depth_noise=0.3, seed=11)
        cfg = tracking.TrackingConfig(
            kf_cap=32, pt_cap=4096, feat_cap=384,
            local_kf=6, local_pts=1024,
            ba_free=6, ba_fixed=6, ba_pts=1024, ba_obs=6,
            tri_neighbors=3, max_new_points=128,
            sensor=1, bf=BF, th_depth=4.0, min_init_depth_points=150,
            enable_loop_closing=False)
        tr = tracking.Tracker(cam, cfg)
        i = 0
        while tr.state != tracking.OK and i < 6:
            feats, _ = seq.frame(i)
            tr.process_frame(feats, i, i * 0.1)
            i += 1
        n0 = len(tr.trajectory)
        CH = 6
        # frame ids with a gap in the middle of the chunk
        ids = np.array([i, i + 1, i + 2, i + 4, i + 5, i + 7])
        chunk = [seq.frame(i + k)[0] for k in range(CH)]
        feats_chunk = jax.tree.map(lambda *xs: np.stack(xs), *chunk)
        tracked = tr.process_chunk(feats_chunk, ids, ids * 0.1)
        assert tracked.all()
        assert len(tr.trajectory) == n0 + CH
        got_ids = [t[0] for t in tr.trajectory[n0:]]
        assert got_ids == ids.tolist()
        # poses must be real per-frame poses (distinct as the camera moves)
        T_first = np.asarray(tr.trajectory[n0][2])
        T_last = np.asarray(tr.trajectory[-1][2])
        assert np.abs(T_first - T_last).max() > 1e-5
