"""End-to-end monocular tracking over a synthetic feature sequence.

The milestone-M1 integration test (SURVEY.md §7 step 4): init -> motion-
model tracking -> local map tracking -> keyframe insertion -> mapping ->
local BA, validated by ATE against exact ground truth.
"""

import numpy as np
import pytest

from myslam_tpu.io import synthetic, trajectory
from myslam_tpu.slam import tracking


@pytest.fixture(scope="module")
def run_sequence():
    cam = synthetic.default_camera()
    seq = synthetic.FeatureSequence(cam, n_points=3000, feat_cap=512,
                                    noise_px=0.3, desc_flips=3)
    cfg = tracking.TrackingConfig(
        kf_cap=64, pt_cap=8192, feat_cap=512,
        local_kf=8, local_pts=2048,
        ba_free=8, ba_fixed=8, ba_pts=2048, ba_obs=8,
        tri_neighbors=4, max_new_points=256)
    tr = tracking.Tracker(cam, cfg)
    n_frames = 60
    tracked = []
    for i in range(n_frames):
        feats, _ = seq.frame(i)
        ok = tr.process_frame(feats, i, i * 0.1)
        tracked.append(ok)
    return tr, seq, tracked


class TestMonocularTracking:
    def test_initializes(self, run_sequence):
        tr, seq, tracked = run_sequence
        assert tr.state == tracking.OK
        assert tr.n_kf >= 2

    def test_tracks_most_frames(self, run_sequence):
        tr, seq, tracked = run_sequence
        # after init, nearly every frame should track
        first = tracked.index(True)
        assert sum(tracked[first:]) >= 0.9 * (len(tracked) - first)

    def test_map_grows(self, run_sequence):
        tr, seq, tracked = run_sequence
        assert int(tr.store.pt_valid.sum()) > 300
        assert tr.n_kf >= 4

    def test_ate_bound(self, run_sequence):
        tr, seq, tracked = run_sequence
        gt = {i: seq.gt_center(i) for i in range(60)}
        rmse, n = trajectory.ate_rmse(tr.trajectory, gt)
        # ~1.2 m trajectory, no loop closure: drift-dominated bound.
        # (Loop closing + global BA — SURVEY §7 step 7 — tighten this.)
        assert n > 40
        assert rmse < 0.12, rmse

    def test_trajectory_io(self, run_sequence, tmp_path):
        tr, *_ = run_sequence
        p = tmp_path / "traj.txt"
        trajectory.save_tum(str(p), tr.trajectory)
        lines = p.read_text().strip().splitlines()
        assert len(lines) == len(tr.trajectory)
        assert len(lines[0].split()) == 8
