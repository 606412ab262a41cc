"""Chunked-mode equivalence: the production path (process_chunk, one
dispatch per chunk of frames) must produce the same trajectory as the
per-frame path (process_frame) on the same sequence — including when
keyframe events (loop closing, culling) fire at chunk boundaries instead
of on their exact frame.

VERDICT-round-2 gap #10: chunk-boundary event semantics were untested.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from myslam_tpu.geom import se3
from myslam_tpu.io import synthetic
from myslam_tpu.slam import tracking

CHUNK = 8
N_FRAMES = 64
BF = 45.0


def _cfg(**kw):
    base = dict(
        kf_cap=48, pt_cap=4096, feat_cap=256,
        local_kf=8, local_pts=1024, ba_free=8, ba_fixed=8, ba_pts=1024,
        ba_obs=8, tri_neighbors=3, max_new_points=128,
        sensor=1, bf=BF, th_depth=4.0, min_init_depth_points=50,
        vocab_words=256, vocab_retrain_every=0)
    base.update(kw)
    return tracking.TrackingConfig(**base)


def _run_per_frame(cfg, seq, n):
    tr = tracking.Tracker(synthetic.default_camera(), cfg)
    for i in range(n):
        feats, _ = seq.frame(i)
        tr.process_frame(feats, i, i * 0.1)
    return tr


def _run_chunked(cfg, seq, n):
    tr = tracking.Tracker(synthetic.default_camera(), cfg)
    i = 0
    # bootstrap per-frame until OK (stereo: first frame)
    while tr.state != tracking.OK and i < 8:
        feats, _ = seq.frame(i)
        tr.process_frame(feats, i, i * 0.1)
        i += 1
    while i + CHUNK <= n:
        import jax
        feats = [seq.frame(j)[0] for j in range(i, i + CHUNK)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *feats)
        tr.process_chunk(stacked, np.arange(i, i + CHUNK),
                         (np.arange(i, i + CHUNK)) * 0.1)
        if tr.state != tracking.OK:
            break
        i += CHUNK
    # tail frames per-frame
    while i < n and tr.state == tracking.OK:
        feats, _ = seq.frame(i)
        tr.process_frame(feats, i, i * 0.1)
        i += 1
    return tr


def _traj_dict(tr):
    out = {}
    for fid, ts, Tcw in tr.trajectory:
        out[int(fid)] = np.asarray(se3.camera_center(jnp.asarray(Tcw)))
    return out


class TestChunkEquivalence:
    @pytest.fixture(scope="class")
    def runs(self):
        cfg = _cfg(enable_loop_closing=False)
        seq = synthetic.FeatureSequence(
            synthetic.default_camera(), n_points=1200, feat_cap=256,
            noise_px=0.3, desc_flips=2, bf=BF, depth_noise=0.3, seed=9)
        a = _run_per_frame(cfg, seq, N_FRAMES)
        b = _run_chunked(cfg, seq, N_FRAMES)
        return a, b

    def test_both_track_the_sequence(self, runs):
        a, b = runs
        assert a.state == tracking.OK and b.state == tracking.OK
        assert len(a.trajectory) >= 0.95 * N_FRAMES
        assert len(b.trajectory) >= 0.95 * N_FRAMES

    def test_trajectories_agree(self, runs):
        a, b = runs
        ta, tb = _traj_dict(a), _traj_dict(b)
        common = sorted(set(ta) & set(tb))
        assert len(common) >= 0.9 * N_FRAMES
        d = np.array([np.linalg.norm(ta[f] - tb[f]) for f in common])
        # same fused step, same data: any drift between modes comes only
        # from event timing; must stay at numerical-noise scale
        assert np.median(d) < 5e-3, float(np.median(d))
        assert d.max() < 5e-2, float(d.max())

    def test_same_keyframe_count_ballpark(self, runs):
        a, b = runs
        assert abs(a.n_kf - b.n_kf) <= max(2, 0.3 * a.n_kf), \
            (a.n_kf, b.n_kf)


class TestChunkLoopClosure:
    """A loop sequence driven in chunks must still detect + correct the
    loop at a chunk boundary and end with a trajectory matching the
    per-frame run."""

    @pytest.fixture(scope="class")
    def loop_runs(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from test_loop_closing import RingScene

        cfg = _cfg(sensor=0, bf=0.0, enable_loop_closing=True,
                   kf_cap=96, pt_cap=8192, feat_cap=512,
                   local_pts=2048, ba_pts=2048,
                   tri_neighbors=6, max_new_points=256)
        cam = synthetic.default_camera()
        n = 110
        seq_a = RingScene(cam, n_points=16000, feat_cap=512, noise_px=0.3,
                          desc_flips=3)
        a = _run_per_frame(cfg, seq_a, n)
        seq_b = RingScene(cam, n_points=16000, feat_cap=512, noise_px=0.3,
                          desc_flips=3)
        b = _run_chunked(cfg, seq_b, n)
        return a, b, n

    def test_chunked_mode_tracks_loop_sequence(self, loop_runs):
        a, b, n = loop_runs
        assert a.state == tracking.OK
        assert b.state == tracking.OK
        assert len(b.trajectory) >= 0.9 * n

    def test_trajectories_agree_with_loop_events(self, loop_runs):
        a, b, n = loop_runs
        ta, tb = _traj_dict(a), _traj_dict(b)
        common = sorted(set(ta) & set(tb))
        assert len(common) >= 0.85 * n
        d = np.array([np.linalg.norm(ta[f] - tb[f]) for f in common])
        # host events fire at different frames (chunk boundaries), so
        # exact equality is not expected — but the two mono trajectories
        # (same scale anchor: identical bootstrap) must stay close
        # relative to the ~3 m orbit radius
        assert np.median(d) < 0.10, float(np.median(d))
