"""Tests for data association (matcher) and place recognition (vocabulary)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myslam_tpu.features.frame import FrameFeatures
from myslam_tpu.geom import se3
from myslam_tpu.geom.projection import Camera
from myslam_tpu.matching import matcher, vocabulary

RNG = np.random.default_rng(42)
CAM = Camera.create(fx=320.0, fy=320.0, cx=320.0, cy=240.0, width=640, height=480)


def random_desc(n):
    return jnp.asarray(RNG.integers(0, 2**32, (n, 8), dtype=np.uint32))


def flip_bits(desc, n_bits, rng):
    """Flip n_bits random bits in each descriptor."""
    d = np.asarray(desc).copy()
    for i in range(d.shape[0]):
        for b in rng.choice(256, n_bits, replace=False):
            d[i, b // 32] ^= np.uint32(1) << np.uint32(b % 32)
    return jnp.asarray(d)


def make_feats(xy, desc, level=None, angle=None, valid=None):
    n = xy.shape[0]
    return FrameFeatures(
        xy=jnp.asarray(xy, jnp.float32),
        xy_raw=jnp.asarray(xy, jnp.float32),
        level=jnp.zeros(n, jnp.int32) if level is None else jnp.asarray(level),
        angle=jnp.zeros(n, jnp.float32) if angle is None else jnp.asarray(angle),
        response=jnp.ones(n, jnp.float32),
        desc=desc,
        valid=jnp.ones(n, bool) if valid is None else jnp.asarray(valid),
    )


class TestPrimitives:
    def test_one_to_one_keeps_best(self):
        # queries 0 and 1 both pick candidate 3; query 1 is closer
        idx = jnp.array([3, 3, 5])
        dist = jnp.array([10, 4, 7])
        ok = jnp.array([True, True, True])
        out = matcher.one_to_one(idx, dist, ok, 8)
        assert list(np.asarray(out)) == [False, True, True]

    def test_rotation_consistency_rejects_outlier_rotation(self):
        n = 64
        aq = jnp.zeros(n)
        ac = jnp.full(n, 0.3)  # dominant rotation 0.3 rad
        ac = ac.at[0].set(2.5)  # one inconsistent match
        ok = jnp.ones(n, bool)
        out = matcher.rotation_consistency(aq, ac, ok)
        assert not bool(out[0]) and int(out.sum()) == n - 1

    def test_predict_scale(self):
        # at max_dist -> level 0; at max_dist/1.2^3 -> level 3
        lvl = matcher.predict_scale(jnp.array([10.0, 10.0 / 1.2**3]),
                                    jnp.array([10.0, 10.0]))
        assert list(np.asarray(lvl)) == [0, 3]


class TestSearchForInitialization:
    def test_recovers_shifted_correspondences(self):
        n = 128
        xy1 = RNG.uniform(60, 420, (n, 2)).astype(np.float32)
        desc = random_desc(n)
        perm = RNG.permutation(n)
        xy2 = xy1[perm] + RNG.normal(0, 1.0, (n, 2)).astype(np.float32)
        desc2 = flip_bits(desc, 8, RNG)[perm]
        f1 = make_feats(xy1, desc)
        f2 = make_feats(xy2, desc2)
        idx, ok = matcher.search_for_initialization(f1, f2)
        assert int(ok.sum()) > n * 0.9
        correct = np.asarray(idx)[np.asarray(ok)] == np.argsort(perm)[np.asarray(ok)]
        assert correct.mean() > 0.99

    def test_window_gate(self):
        xy1 = np.array([[100.0, 100.0]], np.float32)
        xy2 = np.array([[350.0, 100.0]], np.float32)  # 250px away > 100 window
        d = random_desc(1)
        idx, ok = matcher.search_for_initialization(
            make_feats(xy1, d), make_feats(xy2, d))
        assert not bool(ok[0])

    def test_nonlevel0_excluded(self):
        xy = np.array([[100.0, 100.0]], np.float32)
        d = random_desc(1)
        f1 = make_feats(xy, d, level=np.array([1], np.int32))
        f2 = make_feats(xy, d)
        _, ok = matcher.search_for_initialization(f1, f2)
        assert not bool(ok[0])


class TestSearchByProjection:
    def _scene(self, n=96):
        xyz = np.stack([
            RNG.uniform(-2, 2, n), RNG.uniform(-1.5, 1.5, n),
            RNG.uniform(4, 8, n)
        ], axis=1).astype(np.float32)
        return jnp.asarray(xyz)

    def test_motion_model_match(self):
        xyz = self._scene()
        n = xyz.shape[0]
        desc = random_desc(n)
        Tcw = se3.make(jnp.eye(3), jnp.array([0.05, 0.0, 0.02]))
        uv, z = jax.vmap(lambda p: (CAM.fx * p[0] / p[2] + CAM.cx,
                                    CAM.fy * p[1] / p[2] + CAM.cy))(
            se3.transform(Tcw, xyz))
        feats = make_feats(np.stack([np.asarray(uv), np.asarray(z * 0 + 1)], 1) * 0
                           + np.stack([np.asarray(uv),
                                       np.asarray(CAM.fy * se3.transform(Tcw, xyz)[:, 1]
                                                  / se3.transform(Tcw, xyz)[:, 2] + CAM.cy)], 1),
                           flip_bits(desc, 5, RNG))
        idx, ok = matcher.search_by_projection_frame(
            CAM, Tcw, feats, xyz, desc,
            jnp.zeros(n, jnp.int32), jnp.zeros(n), jnp.ones(n, bool), th=15.0)
        inb = np.asarray(feats.xy)
        visible = (inb[:, 0] > 0) & (inb[:, 0] < 640) & (inb[:, 1] > 0) & (inb[:, 1] < 480)
        assert int(ok.sum()) > 0.8 * visible.sum()
        correct = np.asarray(idx)[np.asarray(ok)] == np.nonzero(np.ones(n))[0][np.asarray(ok)]
        assert correct.mean() > 0.95

    def test_local_map_search(self):
        xyz = self._scene()
        n = xyz.shape[0]
        desc = random_desc(n)
        Tcw = se3.identity()
        uvz = np.asarray(se3.transform(Tcw, xyz))
        uv = np.stack([320.0 * uvz[:, 0] / uvz[:, 2] + 320.0,
                       320.0 * uvz[:, 1] / uvz[:, 2] + 240.0], 1)
        feats = make_feats(uv + RNG.normal(0, 0.5, uv.shape),
                           flip_bits(desc, 5, RNG))
        dist = np.linalg.norm(uvz, axis=1)
        normals = jnp.asarray(uvz / dist[:, None])
        # max_dist ~ observed dist for octave-0 points (MapPoint::
        # UpdateNormalAndDepth: mfMaxDistance = dist * 1.2^octave)
        idx, ok, lvl = matcher.search_by_projection_map(
            CAM, Tcw, feats, xyz, desc, normals,
            jnp.asarray(dist * 0.5), jnp.asarray(dist * 1.05),
            jnp.ones(n, bool), th=1.0)
        inimg = (uv[:, 0] > 0) & (uv[:, 0] < 640) & (uv[:, 1] > 0) & (uv[:, 1] < 480)
        assert int(ok.sum()) > 0.8 * inimg.sum()

    def test_sim3_projection_match(self):
        xyz = self._scene()
        n = xyz.shape[0]
        desc = random_desc(n)
        s = 1.5
        R = jnp.eye(3)
        t = jnp.array([0.0, 0.0, 0.0])
        # Scw with scale s: projection identical to SE3 (R, t/s)
        uvz = np.asarray(xyz)
        uv = np.stack([320.0 * uvz[:, 0] / uvz[:, 2] + 320.0,
                       320.0 * uvz[:, 1] / uvz[:, 2] + 240.0], 1)
        feats = make_feats(uv, flip_bits(desc, 4, RNG))
        dist = np.linalg.norm(uvz, axis=1)
        normals = jnp.asarray(uvz / dist[:, None])
        idx, ok = matcher.search_by_projection_sim3(
            CAM, R, t * s, jnp.float32(s), feats, xyz, desc, normals,
            jnp.asarray(dist * 0.5), jnp.asarray(dist * 1.05),
            jnp.ones(n, bool))
        inimg = (uv[:, 0] > 0) & (uv[:, 0] < 640) & (uv[:, 1] > 0) & (uv[:, 1] < 480)
        assert int(ok.sum()) > 0.7 * inimg.sum()


class TestSearchForTriangulation:
    def test_epipolar_gate(self):
        n = 64
        xyz = np.stack([
            RNG.uniform(-2, 2, n), RNG.uniform(-1.5, 1.5, n),
            RNG.uniform(4, 8, n)
        ], axis=1).astype(np.float32)
        T1 = se3.identity()
        T2 = se3.make(jnp.eye(3), jnp.array([-0.3, 0.0, 0.0]))  # baseline
        desc = random_desc(n)

        def proj(T):
            pc = np.asarray(se3.transform(T, jnp.asarray(xyz)))
            return np.stack([320.0 * pc[:, 0] / pc[:, 2] + 320.0,
                             320.0 * pc[:, 1] / pc[:, 2] + 240.0], 1)

        f1 = make_feats(proj(T1), desc)
        f2 = make_feats(proj(T2) + RNG.normal(0, 0.3, (n, 2)), flip_bits(desc, 5, RNG))
        un = jnp.ones(n, bool)
        idx, ok = matcher.search_for_triangulation(CAM, f1, T1, f2, T2, un, un)
        assert int(ok.sum()) > n * 0.8
        correct = np.asarray(idx)[np.asarray(ok)] == np.arange(n)[np.asarray(ok)]
        assert correct.mean() > 0.95

    def test_off_epipolar_rejected(self):
        # same descriptor but candidate far from epipolar line
        T1 = se3.identity()
        T2 = se3.make(jnp.eye(3), jnp.array([-0.3, 0.0, 0.0]))
        d = random_desc(1)
        f1 = make_feats(np.array([[320.0, 240.0]], np.float32), d)
        # epipolar line of center point under pure-x baseline is horizontal;
        # put candidate 80px off vertically
        f2 = make_feats(np.array([[300.0, 320.0]], np.float32), d)
        un = jnp.ones(1, bool)
        _, ok = matcher.search_for_triangulation(CAM, f1, T1, f2, T2, un, un)
        assert not bool(ok[0])


class TestVocabulary:
    @pytest.fixture(scope="class")
    def vocab(self):
        train = jnp.asarray(RNG.integers(0, 2**32, (1024, 8), dtype=np.uint32))
        return vocabulary.train_vocabulary(train, n_words=128, iters=4)

    def test_assignment_stability_clustered(self):
        # descriptors drawn around prototypes (realistic clustered data):
        # k-means words capture clusters, small noise keeps the same word
        protos = np.asarray(random_desc(16))
        samples = np.repeat(protos, 32, axis=0)
        train = flip_bits(jnp.asarray(samples), 10, RNG)
        voc = vocabulary.train_vocabulary(train, n_words=16, iters=6)
        v = jnp.ones(16, bool)
        w1 = vocabulary.assign_words(voc, jnp.asarray(protos), v)
        w2 = vocabulary.assign_words(voc, flip_bits(jnp.asarray(protos), 5, RNG), v)
        assert (np.asarray(w1) == np.asarray(w2)).mean() > 0.9

    def test_self_score_is_one(self, vocab):
        d = random_desc(128)
        v = jnp.ones(128, bool)
        vec = vocabulary.bow_vector(vocab, vocabulary.assign_words(vocab, d, v), v)
        assert abs(float(vocabulary.l1_score(vec, vec)) - 1.0) < 1e-5

    def test_similar_scenes_score_higher(self, vocab):
        d1 = random_desc(256)
        v = jnp.ones(256, bool)
        d2 = flip_bits(d1, 6, RNG)        # same scene, slight noise
        d3 = random_desc(256)              # different scene
        vec = lambda d: vocabulary.bow_vector(
            vocab, vocabulary.assign_words(vocab, d, v), v)
        s_same = float(vocabulary.l1_score(vec(d1), vec(d2)))
        s_diff = float(vocabulary.l1_score(vec(d1), vec(d3)))
        assert s_same > s_diff + 0.1

    def test_database_query(self, vocab):
        db = vocabulary.KeyFrameDatabase.create(16, 128)
        v = jnp.ones(256, bool)
        descs = [random_desc(256) for _ in range(4)]
        vecs = [vocabulary.bow_vector(
            vocab, vocabulary.assign_words(vocab, d, v), v) for d in descs]
        for i, b in enumerate(vecs):
            db = db.add(i, b)
        # query with a noisy copy of KF 2
        q = vocabulary.bow_vector(
            vocab, vocabulary.assign_words(vocab, flip_bits(descs[2], 5, RNG), v), v)
        scores, common = vocabulary.query_database(db, q)
        assert int(jnp.argmax(scores)) == 2
        assert int(common[2]) > 0
        assert float(scores[5]) == -1.0  # empty slot masked

    def test_erase(self, vocab):
        db = vocabulary.KeyFrameDatabase.create(8, 128)
        v = jnp.ones(64, bool)
        d = random_desc(64)
        vec = vocabulary.bow_vector(vocab, vocabulary.assign_words(vocab, d, v), v)
        db = db.add(3, vec).erase(3)
        scores, _ = vocabulary.query_database(db, vec)
        assert float(scores.max()) == -1.0
