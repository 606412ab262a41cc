"""Relocalization: candidate detection, the batched guided-match ladder,
and the post-init auto-reset (reference src/KeyFrameDatabase.cc:199-311 +
src/Tracking.cc:1348-1509, 481-489)."""

import numpy as np
import jax.numpy as jnp
import pytest

from myslam_tpu.features.frame import FrameFeatures
from myslam_tpu.io import synthetic
from myslam_tpu.matching import vocabulary
from myslam_tpu.slam import relocalization, tracking
from myslam_tpu.slam.tracking import LOST, NOT_INITIALIZED, OK, Tracker


def _make_tracker(enable_loop=True):
    cam = synthetic.default_camera()
    cfg = tracking.TrackingConfig(
        kf_cap=32, pt_cap=4096, feat_cap=512,
        local_kf=6, local_pts=1024, ba_free=6, ba_fixed=6,
        ba_pts=1024, ba_obs=6, tri_neighbors=3, max_new_points=128,
        enable_loop_closing=enable_loop, vocab_words=256)
    return Tracker(cam, cfg), cam


@pytest.fixture(scope="module")
def tracked():
    """A tracker driven over 30 frames with BoW database populated."""
    tr, cam = _make_tracker()
    seq = synthetic.FeatureSequence(cam, n_points=2500, feat_cap=512,
                                    noise_px=0.3)
    n_ok = 0
    for i in range(30):
        feats, _ = seq.frame(i)
        n_ok += bool(tr.process_frame(feats, i, i * 0.1))
    assert n_ok > 20 and tr.n_kf >= 3
    assert tr.loop_closer is not None
    return tr, seq


class TestDetectCandidates:
    def test_own_keyframe_is_top_candidate(self, tracked):
        tr, seq = tracked
        store = tr.store
        lc = tr.loop_closer
        kf_ids = [int(k) for k in np.nonzero(np.asarray(store.kf_valid))[0]]
        kf = kf_ids[len(kf_ids) // 2]
        words = vocabulary.assign_words(
            lc.vocab, store.kf_desc[kf], store.kf_fvalid[kf])
        vec = vocabulary.bow_vector(lc.vocab, words, store.kf_fvalid[kf])
        ids, ok = relocalization.detect_candidates(lc.db, store, vec)
        ids = [int(i) for i, o in zip(np.asarray(ids), np.asarray(ok)) if o]
        assert len(ids) >= 1
        # the keyframe itself (or a covisible neighbor in its group) wins
        from myslam_tpu.mapping import map_store
        W = np.asarray(map_store.covisibility(store))
        assert kf in ids or any(W[kf, i] > 0 for i in ids)

    def test_empty_database(self):
        tr, cam = _make_tracker()
        store = tr.store
        db = vocabulary.KeyFrameDatabase.create(store.kf_cap, 256)
        vec = jnp.zeros(256)
        ids, ok = relocalization.detect_candidates(db, store, vec)
        assert not bool(np.asarray(ok).any())


class TestRelocalize:
    def test_relocalize_after_forced_loss(self, tracked):
        tr, seq = tracked
        # poses the tracker itself produced for these frames (map scale —
        # a monocular map is median-depth normalized, so metric ground
        # truth is only comparable up to a global similarity)
        own = {fid: Tcw for fid, _, Tcw in tr.trajectory}
        # kill tracking
        tr.state = LOST
        tr.velocity = None
        tr._fstate = None
        recovered = None
        for i in range(10, 16):  # revisit previously-seen viewpoints
            feats, _ = seq.frame(i)
            if tr.process_frame(feats, 100 + i, 10.0 + i * 0.1):
                recovered = i
                break
        assert recovered is not None, "relocalization never succeeded"
        assert tr.state == OK
        assert recovered in own
        from myslam_tpu.geom import se3
        c_est = np.asarray(se3.camera_center(tr.Tcw))
        c_ref = np.asarray(se3.camera_center(own[recovered]))
        assert np.linalg.norm(c_est - c_ref) < 0.02, (c_est, c_ref)


class TestAutoReset:
    def test_reset_on_early_loss(self):
        tr, cam = _make_tracker(enable_loop=False)
        seq = synthetic.FeatureSequence(cam, n_points=2500, feat_cap=512,
                                        noise_px=0.3)
        ok_frames = 0
        for i in range(8):
            feats, _ = seq.frame(i)
            ok_frames += bool(tr.process_frame(feats, i, i * 0.1))
        assert tr.state == OK and tr.n_kf <= 5
        # garbage frame: random features nowhere near the map
        rng = np.random.default_rng(0)
        F = 512
        xy = jnp.asarray(rng.uniform(0, 480, (F, 2)), jnp.float32)
        junk = FrameFeatures(
            xy=xy, xy_raw=xy,
            level=jnp.zeros(F, jnp.int32),
            angle=jnp.zeros(F, jnp.float32),
            response=jnp.ones(F, jnp.float32),
            desc=jnp.asarray(
                rng.integers(0, 2**32, (F, 8), dtype=np.uint32)),
            valid=jnp.ones(F, bool))
        tr.process_frame(junk, 99, 9.9)
        # lost <= 5 KFs after init -> full reset (src/Tracking.cc:481-489)
        assert tr.state == NOT_INITIALIZED
        assert tr.n_kf == 0
        assert int(tr.store.kf_valid.sum()) == 0
