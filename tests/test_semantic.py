"""Semantic fusion: dynamic-object gating of features and map points."""

import jax.numpy as jnp
import numpy as np
import pytest

from myslam_tpu.features.frame import FrameFeatures
from myslam_tpu.geom import se3
from myslam_tpu.io import synthetic
from myslam_tpu.slam import semantic, tracking
from myslam_tpu.mapping import map_store


def make_feats(xy):
    n = len(xy)
    return FrameFeatures(
        xy=jnp.asarray(xy, jnp.float32), xy_raw=jnp.asarray(xy, jnp.float32),
        level=jnp.zeros(n, jnp.int32), angle=jnp.zeros(n, jnp.float32),
        response=jnp.ones(n, jnp.float32),
        desc=jnp.zeros((n, 8), jnp.uint32), valid=jnp.ones(n, bool))


def det(cls, x, y, w, h, score=0.9):
    return {"class_id": cls, "class_name": str(cls), "score": score,
            "box": (x, y, w, h)}


class TestDynamicObjectGating:
    """End-to-end config-4 proxy (BASELINE: TUM fr3_walking + YOLO
    gating): on a rendered orbit with moving textured sprites, gating
    features/points inside the (oracle) dynamic boxes must keep the
    trajectory accurate while the ungated run degrades. Full-size
    artifact numbers: tools/semantic_bench.py -> SEMANTIC_BENCH.json."""

    def test_gating_protects_ate(self):
        import tools.semantic_bench as sb

        scene = synthetic.DynamicSpriteScene(
            n_sprites=3, sprite_size=80, sprite_speed=4.0,
            width=512, height=384, t_loop=150, n_points=12000)
        ate_g, n_g = sb.run_mode(scene, gated=True, n_frames=48)
        ate_u, n_u = sb.run_mode(scene, gated=False, n_frames=48)
        assert n_g > 40, n_g
        # gated tracking stays accurate despite 3 moving objects
        assert ate_g < 0.03, (ate_g, ate_u)
        # and measurably better than ungated (the fusion claim)
        assert ate_u > ate_g, (ate_g, ate_u)


class TestFeatureMasking:
    def test_inside_box_masked(self):
        feats = make_feats([[100, 100], [300, 300], [105, 95]])
        out = semantic.SemanticFilter().filter_features(
            feats, [det(5, 80, 80, 50, 40)])
        v = np.asarray(out.valid)
        assert list(v) == [False, True, False]

    def test_nondynamic_class_ignored(self):
        feats = make_feats([[100, 100]])
        filt = semantic.SemanticFilter(dynamic_classes=(5,))  # person only
        out = filt.filter_features(feats, [det(2, 80, 80, 50, 40)])  # car
        assert bool(out.valid[0])

    def test_no_detections_noop(self):
        feats = make_feats([[100, 100]])
        out = semantic.SemanticFilter().filter_features(feats, [])
        assert bool(out.valid[0])

    def test_box_cap(self):
        dets = [det(5, 10 * i, 10, 5, 5) for i in range(50)]
        arr = semantic.boxes_to_array(dets, (5,))
        assert arr.shape == (semantic.MAX_BOXES, 4)


class TestPointCulling:
    def test_repeat_offender_culled(self):
        store = map_store.MapStore.create(kf_cap=4, pt_cap=64, feat_cap=16)
        # one valid point in front of the camera at (0,0,5)
        store = store.replace(
            pt_valid=store.pt_valid.at[3].set(True),
            pt_xyz=store.pt_xyz.at[3].set(jnp.array([0.0, 0.0, 5.0])))
        cam = synthetic.default_camera()
        pose = se3.identity()
        obs = jnp.full(16, -1, jnp.int32).at[0].set(3)
        filt = semantic.SemanticFilter(cull_hits=3)
        # projection of (0,0,5) = principal point (320, 240)
        box_hit = [det(5, 300, 220, 40, 40)]
        for _ in range(3):
            store = filt.update_and_cull(store, cam, pose, obs, box_hit)
        assert not bool(store.pt_valid[3])

    def test_single_hit_survives(self):
        store = map_store.MapStore.create(kf_cap=4, pt_cap=64, feat_cap=16)
        store = store.replace(
            pt_valid=store.pt_valid.at[3].set(True),
            pt_xyz=store.pt_xyz.at[3].set(jnp.array([0.0, 0.0, 5.0])))
        cam = synthetic.default_camera()
        obs = jnp.full(16, -1, jnp.int32).at[0].set(3)
        filt = semantic.SemanticFilter(cull_hits=3)
        store = filt.update_and_cull(store, cam, se3.identity(), obs,
                                     [det(5, 300, 220, 40, 40)])
        assert bool(store.pt_valid[3])

    def test_miss_decays(self):
        store = map_store.MapStore.create(kf_cap=4, pt_cap=64, feat_cap=16)
        store = store.replace(
            pt_valid=store.pt_valid.at[3].set(True),
            pt_xyz=store.pt_xyz.at[3].set(jnp.array([0.0, 0.0, 5.0])))
        cam = synthetic.default_camera()
        obs = jnp.full(16, -1, jnp.int32).at[0].set(3)
        filt = semantic.SemanticFilter(cull_hits=3)
        hit = [det(5, 300, 220, 40, 40)]
        miss = [det(5, 10, 10, 20, 20)]
        for boxes in [hit, miss, hit, miss, hit, miss, hit]:
            store = filt.update_and_cull(store, cam, se3.identity(), obs,
                                         boxes)
        assert bool(store.pt_valid[3])  # decay keeps it below the bar


class TestEndToEndGating:
    def test_dynamic_region_has_no_map_points(self):
        """Track a synthetic sequence with a fake 'person' box fixed over
        part of the image: no map point should project inside it."""
        cam = synthetic.default_camera()
        seq = synthetic.FeatureSequence(cam, n_points=3000, feat_cap=512,
                                        noise_px=0.3, desc_flips=3)
        cfg = tracking.TrackingConfig(
            kf_cap=32, pt_cap=4096, feat_cap=512,
            local_kf=6, local_pts=1024, ba_free=6, ba_fixed=6,
            ba_pts=1024, ba_obs=6, tri_neighbors=3, max_new_points=128,
            enable_loop_closing=False)
        tr = tracking.Tracker(cam, cfg)
        filt = semantic.SemanticFilter()
        box = [det(5, 400, 120, 160, 220)]  # static "person" region
        for i in range(20):
            feats, _ = seq.frame(i)
            feats = filt.filter_features(feats, box)
            tr.process_frame(feats, i, i * 0.1)
        assert tr.state == tracking.OK
        # project all map points into frame 19's pose: none inside the box
        store = tr.store
        pc = se3.transform(tr.Tcw, store.pt_xyz)
        z = np.maximum(np.asarray(pc[:, 2]), 1e-9)
        u = 450 * np.asarray(pc[:, 0]) / z + 320
        v = 450 * np.asarray(pc[:, 1]) / z + 240
        valid = np.asarray(store.pt_valid)
        inside = valid & (u > 410) & (u < 550) & (v > 130) & (v < 330)
        # interior margin: features near the edge may sit outside the box
        assert inside.sum() <= 2, inside.sum()
        assert valid.sum() > 200  # map still built elsewhere
