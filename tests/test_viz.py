"""Viewer stack smoke tests (viz/ = headless FrameDrawer/MapDrawer/Viewer,
reference src/FrameDrawer.cc, src/MapDrawer.cc, src/Viewer.cc)."""

import numpy as np

from myslam_tpu.io import synthetic
from myslam_tpu.viz import FrameDrawer, MapDrawer, Viewer


def _tracked_store():
    from myslam_tpu.slam import tracking
    cam = synthetic.default_camera()
    seq = synthetic.FeatureSequence(cam, n_points=1500, feat_cap=256,
                                    noise_px=0.3, desc_flips=2)
    cfg = tracking.TrackingConfig(
        kf_cap=16, pt_cap=2048, feat_cap=256, local_kf=4, local_pts=512,
        ba_free=4, ba_fixed=4, ba_pts=512, ba_obs=4, tri_neighbors=2,
        max_new_points=64, enable_loop_closing=False)
    tr = tracking.Tracker(cam, cfg)
    feats = None
    for i in range(12):
        feats, _ = seq.frame(i)
        tr.process_frame(feats, i, i * 0.1)
    return tr, feats


def test_frame_drawer_overlay():
    tr, feats = _tracked_store()
    img = np.random.default_rng(0).uniform(
        0, 255, (480, 640)).astype(np.float32)
    dets = [{"class_id": 2, "class_name": "car", "score": 0.9,
             "box": (100.0, 120.0, 80.0, 60.0)}]
    out = FrameDrawer().draw(
        img, feats, np.asarray(tr.last_obs) >= 0, dets,
        state=tr.state, n_kfs=tr.n_kf,
        n_points=int(tr.store.pt_valid.sum()))
    assert out.shape == (500, 640, 3)
    assert out.dtype == np.uint8
    # something was drawn (red box pixels exist)
    assert (out[..., 0].astype(int) - out[..., 1] > 100).sum() > 50


def test_map_drawer_render():
    tr, _ = _tracked_store()
    img = MapDrawer().render(tr.store, Tcw=tr.Tcw)
    assert img.ndim == 3 and img.shape[2] == 3
    assert img.std() > 1  # not blank


def test_viewer_writes_artifacts(tmp_path):
    tr, feats = _tracked_store()
    v = Viewer(out_dir=str(tmp_path / "view"), every=1)
    img = np.zeros((480, 640), np.float32)
    v.update(img, feats, None, None, store=tr.store, Tcw=tr.Tcw,
             state=tr.state)
    v.update(img, feats, None, None, store=tr.store, Tcw=tr.Tcw,
             state=tr.state)
    gif = v.finish()
    files = list((tmp_path / "view").iterdir())
    assert any(f.name.startswith("frame_") for f in files)
    assert any(f.name.startswith("map_") for f in files)
    assert gif is not None
