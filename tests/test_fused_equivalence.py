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
