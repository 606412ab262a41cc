"""System-level stereo and RGB-D tracking on rendered images.

Exercises the full TrackStereo / TrackRGBD paths (System::TrackStereo
src/System.cc:130-180, System::TrackRGBD src/System.cc:182-217): ORB
extraction, stereo matching / depth sampling, stereo bootstrap, metric
tracking.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from myslam_tpu.io import synthetic
from myslam_tpu.slam import system as system_mod
from myslam_tpu.slam import tracking
from myslam_tpu.utils.config import Settings

W, H = 320, 240
FX = 450.0
BF = 45.0      # baseline 0.1 m
Z_PLANE = 2.0  # the rendered texture plane sits at 2 m
DISP = BF / Z_PLANE  # = 22.5 px constant disparity


def _settings():
    return Settings(fx=FX, fy=FX, cx=W / 2, cy=H / 2, width=W, height=H,
                    n_features=400, n_levels=4, bf=BF, th_depth=35.0)


def _tracking_cfg():
    return tracking.TrackingConfig(
        kf_cap=32, pt_cap=4096, feat_cap=512, n_levels=4,
        local_kf=6, local_pts=1024,
        ba_free=6, ba_fixed=6, ba_pts=1024, ba_obs=6,
        tri_neighbors=3, max_new_points=128,
        enable_loop_closing=False,
        sensor=2, bf=BF, th_depth=3.5, min_init_depth_points=150)


@pytest.fixture(scope="module")
def rgbd_run():
    seq = synthetic.ImageSequence(width=W, height=H, n_frames=14,
                                  step_px=2.0)
    slam = system_mod.System(settings=_settings(), sensor=system_mod.RGBD,
                             tracking_config=_tracking_cfg())
    depth = np.full((H, W), Z_PLANE, np.float32)
    poses = []
    for i in range(12):
        Tcw = slam.track_rgbd(seq.frame(i), depth, timestamp=i * 0.1)
        poses.append(Tcw)
    return slam, poses


class TestRGBD:
    def test_bootstraps_first_frame(self, rgbd_run):
        slam, poses = rgbd_run
        assert poses[0] is not None

    def test_tracks_with_metric_scale(self, rgbd_run):
        """The camera slides step_px*Z/fx = 8.9 mm/frame in metric units;
        RGB-D tracking must recover that absolute scale."""
        slam, poses = rgbd_run
        ok = [p for p in poses if p is not None]
        assert len(ok) >= 10
        step_m = 2.0 * Z_PLANE / FX
        last = poses[-1]
        assert last is not None
        c = -last[:, :3].T @ last[:, 3]
        expect_x = step_m * 11
        assert abs(c[0] - expect_x) < 0.15 * expect_x + 0.005, \
            f"x={c[0]} expected {expect_x}"

    def test_map_points_at_plane_depth(self, rgbd_run):
        slam, _ = rgbd_run
        store = slam.tracker.store
        pts = np.asarray(store.pt_xyz)[np.asarray(store.pt_valid)]
        assert abs(np.median(pts[:, 2]) - Z_PLANE) < 0.1


class TestStereoSystem:
    def test_track_stereo_constant_disparity(self):
        """Right view = texture shifted by the constant plane disparity;
        TrackStereo must bootstrap and produce near-plane map points."""
        disp = int(round(DISP))  # 22 px (slightly off 22.5 -> z=45/22)
        seq = synthetic.ImageSequence(width=W + disp, height=H,
                                      n_frames=10, step_px=2.0)
        slam = system_mod.System(settings=_settings(),
                                 sensor=system_mod.STEREO,
                                 tracking_config=_tracking_cfg())
        tracked = 0
        for i in range(6):
            full = seq.frame(i)
            left, right = full[:, :W], full[:, disp:disp + W]
            if slam.track_stereo(left, right, timestamp=i * 0.1) is not None:
                tracked += 1
        assert tracked >= 5
        store = slam.tracker.store
        pts = np.asarray(store.pt_xyz)[np.asarray(store.pt_valid)]
        assert len(pts) > 100
        z_expect = BF / disp
        assert abs(np.median(pts[:, 2]) - z_expect) < 0.1
