"""Distributed paths wired through the PIPELINE (not standalone demos):

- stereo edges through distributed Schur BA (parallel/dist_ba.py),
- whole-map GBA routed through the mesh by a mesh-configured tracker
  (mapping/local_mapping.global_bundle_adjustment(mesh=)),
- the sharded keyframe database behind LoopCloser.detect /
  relocalization.detect_candidates (parallel/loop_search.py).

All on the virtual 8-device CPU mesh (conftest.py); the same collectives
run on a real ICI mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from myslam_tpu.geom import se3
from myslam_tpu.geom.projection import Camera
from myslam_tpu.io import synthetic
from myslam_tpu.mapping import local_mapping
from myslam_tpu.matching import vocabulary
from myslam_tpu.optim import ba
from myslam_tpu.parallel import dist_ba
from myslam_tpu.slam import tracking

CAM = Camera.create(fx=450.0, fy=450.0, cx=320.0, cy=240.0)
BF = 45.0


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return Mesh(np.array(jax.devices()[:8]), ("shard",))


def stereo_problem(K=6, P=240, noise=0.3, seed=3):
    """Synthetic BA problem with mixed mono/stereo edges (edge_ur >= 0
    marks stereo, the g2o EdgeStereoSE3ProjectXYZ analogue,
    reference src/Optimizer.cc:570-607)."""
    rng = np.random.default_rng(seed)
    xyz = np.stack([rng.uniform(-3, 3, P), rng.uniform(-2, 2, P),
                    rng.uniform(4, 9, P)], 1).astype(np.float32)
    poses = np.tile(np.eye(3, 4, dtype=np.float32), (K, 1, 1))
    poses[:, 0, 3] = np.linspace(0, -0.8, K)
    e_kf = np.repeat(np.arange(K), P).astype(np.int32)
    e_pt = np.tile(np.arange(P), K).astype(np.int32)
    pc = np.einsum("eij,ej->ei", poses[e_kf, :, :3], xyz[e_pt]) \
        + poses[e_kf, :, 3]
    u = 450 * pc[:, 0] / pc[:, 2] + 320
    v = 450 * pc[:, 1] / pc[:, 2] + 240
    ur = u - BF / pc[:, 2]
    E = len(e_kf)
    uv = np.stack([u, v], 1) + rng.normal(0, noise, (E, 2))
    ur = ur + rng.normal(0, noise, E)
    # two thirds stereo, one third mono
    ur = np.where(rng.uniform(size=E) < 2 / 3, ur, -1.0).astype(np.float32)
    poses_init = poses.copy()
    for k in range(1, K):
        poses_init[k] = np.asarray(se3.retract(
            jnp.asarray(poses[k]),
            jnp.asarray(np.r_[rng.normal(0, 0.003, 3),
                              rng.normal(0, 0.01, 3)].astype(np.float32))))
    return ba.BAProblem(
        kf_pose=jnp.asarray(poses_init),
        pt_xyz=jnp.asarray(
            xyz + rng.normal(0, 0.03, (P, 3)).astype(np.float32)),
        edge_kf=jnp.asarray(e_kf), edge_pt=jnp.asarray(e_pt),
        edge_uv=jnp.asarray(uv.astype(np.float32)),
        edge_inv_sigma2=jnp.ones(E),
        edge_valid=jnp.ones(E, bool),
        kf_fixed=jnp.zeros(K, bool).at[0].set(True),
        edge_ur=jnp.asarray(ur), bf=BF,
    ), poses, xyz


class TestStereoDistBA:
    def test_stereo_dist_matches_single_device(self, mesh):
        prob, poses_gt, xyz_gt = stereo_problem()
        out_d = dist_ba.distributed_bundle_adjust(CAM, prob, mesh, iters=8)
        out_s = ba.run_lm(CAM, prob, 8, use_huber=True)
        assert float(jnp.abs(out_d.kf_pose - out_s.kf_pose).max()) < 1e-3
        assert float(jnp.median(jnp.linalg.norm(
            out_d.pt_xyz - out_s.pt_xyz, axis=-1))) < 1e-3
        # stereo scale is metric: translations must land on ground truth
        t_err = float(jnp.abs(
            out_d.kf_pose[:, :, 3] - jnp.asarray(poses_gt)[:, :, 3]).max())
        assert t_err < 5e-3, t_err


def _build_tracked_map(mesh=None, n_frames=26):
    """A small real map built by the tracker on synthetic stereo data."""
    cam = synthetic.default_camera()
    cfg = tracking.TrackingConfig(
        kf_cap=16, pt_cap=2048, feat_cap=256,
        local_kf=6, local_pts=512, ba_free=6, ba_fixed=6, ba_pts=512,
        ba_obs=6, tri_neighbors=2, max_new_points=64,
        sensor=1, bf=BF, th_depth=4.0, min_init_depth_points=50,
        vocab_words=128, vocab_retrain_every=0,
        enable_loop_closing=True)
    seq = synthetic.FeatureSequence(
        cam, n_points=900, feat_cap=256, noise_px=0.3, desc_flips=2,
        bf=BF, depth_noise=0.3, seed=4)
    tr = tracking.Tracker(cam, cfg, mesh=mesh)
    for i in range(n_frames):
        feats, _ = seq.frame(i)
        tr.process_frame(feats, i, i * 0.1)
    assert tr.state == tracking.OK
    assert tr.n_kf >= 3
    return tr, cam


class TestMeshedPipeline:
    def test_global_ba_through_mesh_matches_single(self, mesh):
        tr, cam = _build_tracked_map()
        store = tr.store
        single = local_mapping.global_bundle_adjustment(
            store, cam, iters=6, stereo=True, bf=BF)
        dist = local_mapping.global_bundle_adjustment(
            store, cam, iters=6, stereo=True, bf=BF, mesh=mesh)
        kv = np.asarray(store.kf_valid)
        dp = np.abs(np.asarray(single.kf_pose) - np.asarray(dist.kf_pose))
        assert float(dp[kv].max()) < 2e-3, float(dp[kv].max())
        pv = np.asarray(store.pt_valid)
        dx = np.linalg.norm(
            np.asarray(single.pt_xyz) - np.asarray(dist.pt_xyz), axis=-1)
        assert float(np.median(dx[pv])) < 2e-3

    def test_loop_closer_global_ba_uses_mesh(self, mesh):
        """The INTEGRATED path: a mesh-configured tracker's LoopCloser
        runs its whole-map BA through dist_ba (one flag turns any GBA
        distributed — reference role src/Optimizer.cc:41-54 at scale)."""
        tr, cam = _build_tracked_map(mesh=mesh)
        lc = tr.loop_closer
        assert lc is not None and lc.mesh is mesh
        store2 = lc._global_ba(tr.store, cam, iters=4)
        kv = np.asarray(store2.kf_valid)
        assert np.isfinite(np.asarray(store2.kf_pose)[kv]).all()
        # rotations stay on SO(3) after the distributed write-back
        R = np.asarray(store2.kf_pose)[kv][:, :, :3]
        err = max(np.abs(r @ r.T - np.eye(3)).max() for r in R)
        assert err < 1e-5

    def test_sharded_database_matches_dense(self, mesh):
        """LoopCloser's sharded DB returns byte-identical scores to the
        dense single-device query over the live rows."""
        tr, _ = _build_tracked_map(mesh=mesh)
        lc = tr.loop_closer
        K_pad = lc.db.bow.shape[0]
        assert K_pad % 8 == 0
        # the database rows really live sharded across the mesh
        assert len(lc.db.bow.sharding.device_set) == 8
        # query via the sharded path vs a dense host copy
        store = tr.store
        kf_ids = np.nonzero(np.asarray(store.kf_valid))[0]
        vec = vocabulary.bow_vector(
            lc.vocab,
            vocabulary.assign_words(lc.vocab, store.kf_desc[kf_ids[0]],
                                    store.kf_fvalid[kf_ids[0]]),
            store.kf_fvalid[kf_ids[0]])
        s_shard, c_shard = lc.query_db(lc.db, vec)
        dense = vocabulary.KeyFrameDatabase(
            bow=jnp.asarray(np.asarray(lc.db.bow)),
            has=jnp.asarray(np.asarray(lc.db.has)),
            valid=jnp.asarray(np.asarray(lc.db.valid)))
        s_dense, c_dense = vocabulary.query_database(dense, vec)
        np.testing.assert_allclose(np.asarray(s_shard), np.asarray(s_dense),
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(c_shard),
                                      np.asarray(c_dense))

    def test_sharded_reloc_candidates_match_dense(self, mesh):
        from myslam_tpu.slam import relocalization

        tr, _ = _build_tracked_map(mesh=mesh)
        lc = tr.loop_closer
        store = tr.store
        kf_ids = np.nonzero(np.asarray(store.kf_valid))[0]
        k = int(kf_ids[-1])
        vec = vocabulary.bow_vector(
            lc.vocab,
            vocabulary.assign_words(lc.vocab, store.kf_desc[k],
                                    store.kf_fvalid[k]),
            store.kf_fvalid[k])
        ids_s, ok_s = relocalization.detect_candidates(
            lc.db, store, vec, n_cands=4, query_fn=lc.query_db)
        dense = vocabulary.KeyFrameDatabase(
            bow=jnp.asarray(np.asarray(lc.db.bow))[:store.kf_cap],
            has=jnp.asarray(np.asarray(lc.db.has))[:store.kf_cap],
            valid=jnp.asarray(np.asarray(lc.db.valid))[:store.kf_cap])
        ids_d, ok_d = relocalization.detect_candidates(
            dense, store, vec, n_cands=4)
        np.testing.assert_array_equal(np.asarray(ids_s), np.asarray(ids_d))
        np.testing.assert_array_equal(np.asarray(ok_s), np.asarray(ok_d))
        # the self-query must surface the keyframe itself as a candidate
        assert k in np.asarray(ids_s)[np.asarray(ok_s)]
