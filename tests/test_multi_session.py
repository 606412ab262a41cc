"""Concurrent-session sharding over the virtual 8-device CPU mesh
(BASELINE config 5; parallel/multi_session.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from myslam_tpu.io import synthetic
from myslam_tpu.parallel.multi_session import MultiSession
from myslam_tpu.slam import tracking

N_SESS = 8
BF = 45.0


def _cfg():
    return tracking.TrackingConfig(
        kf_cap=16, pt_cap=2048, feat_cap=256,
        local_kf=4, local_pts=512,
        ba_free=4, ba_fixed=4, ba_pts=512, ba_obs=4,
        tri_neighbors=2, max_new_points=64,
        sensor=1, bf=BF, th_depth=4.0, min_init_depth_points=100,
        enable_loop_closing=False)


@pytest.mark.skipif(len(jax.devices()) < N_SESS,
                    reason="needs the 8-device virtual mesh")
def test_sessions_track_independently_on_mesh():
    cam = synthetic.default_camera()
    cfg = _cfg()
    mesh = Mesh(np.array(jax.devices()[:N_SESS]), ("session",))

    # one stereo sequence per session with a different world seed
    seqs = [synthetic.FeatureSequence(cam, n_points=1200, feat_cap=256,
                                      noise_px=0.3, desc_flips=2,
                                      bf=BF, depth_noise=0.3, seed=s)
            for s in range(N_SESS)]
    # host-side stereo bootstrap per session (frame 0)
    trackers = []
    for s, seq in enumerate(seqs):
        tr = tracking.Tracker(cam, cfg)
        feats, _ = seq.frame(0)
        assert tr.process_frame(feats, 0, 0.0)
        trackers.append(tr)

    ms = MultiSession(cam, cfg, mesh, n_sessions=N_SESS)
    states = ms.stack([ms.fused.state_from(tr) for tr in trackers])

    n_frames = 10
    for i in range(1, n_frames):
        feats_all = [seqs[s].frame(i)[0] for s in range(N_SESS)]
        feats_stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *feats_all)
        ts = np.full(N_SESS, i * 0.1, np.float32)
        states, infos = ms.step(states, feats_stacked, ts)

    tracked = np.asarray(infos["tracked"])
    assert tracked.all(), f"sessions lost: {np.nonzero(~tracked)[0]}"

    # each session's pose must match ITS OWN ground truth (absolute,
    # stereo scale) — proves the shards really ran distinct problems
    for s in range(N_SESS):
        T = np.asarray(ms.unstack(states, s).Tcw)
        c = -T[:, :3].T @ T[:, 3]
        err = np.linalg.norm(c - seqs[s].gt_center(n_frames - 1))
        assert err < 0.05, f"session {s} err {err}"

    # separate maps: the stores differ across sessions
    pts0 = np.asarray(ms.unstack(states, 0).store.pt_xyz)
    pts1 = np.asarray(ms.unstack(states, 1).store.pt_xyz)
    assert not np.allclose(pts0, pts1)
