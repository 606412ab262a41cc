"""End-to-end stereo/RGB-D tracking over a synthetic feature sequence.

Stereo bootstrap (Tracking::StereoInitialization, src/Tracking.cc:517-570)
creates a metric map from the first frame, so the estimated trajectory
must match ground truth in ABSOLUTE scale — no Sim3/scale alignment here,
unlike the monocular test.
"""

import numpy as np
import pytest

from myslam_tpu.io import synthetic
from myslam_tpu.slam import tracking

BF = 45.0  # baseline 0.1 m at fx=450


@pytest.fixture(scope="module")
def run_sequence():
    cam = synthetic.default_camera()
    seq = synthetic.FeatureSequence(cam, n_points=3000, feat_cap=512,
                                    noise_px=0.3, desc_flips=3,
                                    bf=BF, depth_noise=0.3)
    cfg = tracking.TrackingConfig(
        kf_cap=64, pt_cap=8192, feat_cap=512,
        local_kf=8, local_pts=2048,
        ba_free=8, ba_fixed=8, ba_pts=2048, ba_obs=8,
        tri_neighbors=4, max_new_points=256,
        sensor=1, bf=BF, th_depth=4.0,
        min_init_depth_points=200)
    tr = tracking.Tracker(cam, cfg)
    n_frames = 40
    tracked = []
    for i in range(n_frames):
        feats, _ = seq.frame(i)
        ok = tr.process_frame(feats, i, i * 0.1)
        tracked.append(ok)
    return tr, seq, tracked


class TestStereoTracking:
    def test_initializes_on_first_frame(self, run_sequence):
        tr, seq, tracked = run_sequence
        assert tracked[0], "stereo must bootstrap from frame 0"
        assert tr.state == tracking.OK

    def test_tracks_all_frames(self, run_sequence):
        tr, seq, tracked = run_sequence
        assert sum(tracked) >= 0.95 * len(tracked)

    def test_metric_scale_trajectory(self, run_sequence):
        """Absolute (unaligned) trajectory error: stereo pins scale."""
        tr, seq, tracked = run_sequence
        errs = []
        for fid, ts, Tcw in tr.trajectory:
            R, t = Tcw[:, :3], Tcw[:, 3]
            center = -R.T @ t
            errs.append(np.linalg.norm(center - seq.gt_center(fid)))
        rmse = float(np.sqrt(np.mean(np.square(errs))))
        assert len(errs) > 30
        assert rmse < 0.05, f"absolute ATE {rmse}"

    def test_map_has_metric_depths(self, run_sequence):
        tr, seq, tracked = run_sequence
        pts = np.asarray(tr.store.pt_xyz)[np.asarray(tr.store.pt_valid)]
        # world points came from rng.uniform(1.5, 4.5) z in the sequence
        assert 1.0 < np.median(pts[:, 2]) < 5.0
