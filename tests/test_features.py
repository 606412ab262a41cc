"""Tests for the feature layer: FAST score, uniform selection, orientation,
descriptors, and the full ORB extraction pipeline.

Mirrors the unit-test strategy in SURVEY.md §4: synthetic images with known
corners, invariance checks rather than golden OpenCV bit-compat (descriptors
use this framework's own pattern, see ops/descriptors.py docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myslam_tpu.features.extractor import ORBExtractor, level_budgets
from myslam_tpu.ops import descriptors, fast, hamming, image, orientation, selection


def checkerboard(h=128, w=160, cell=16, lo=40.0, hi=210.0):
    ys, xs = np.mgrid[0:h, 0:w]
    board = ((ys // cell + xs // cell) % 2).astype(np.float32)
    return board * (hi - lo) + lo


def white_square(h=96, w=96, y0=40, x0=40, size=20):
    img = np.zeros((h, w), np.float32)
    img[y0 : y0 + size, x0 : x0 + size] = 255.0
    return img


class TestFast:
    def test_flat_image_no_corners(self):
        img = jnp.full((64, 64), 128.0)
        s = fast.fast_score(img)
        assert float(jnp.max(s)) == 0.0

    def test_square_corners_detected(self):
        img = jnp.asarray(white_square())
        s = fast.nms_3x3(fast.fast_score(img, border=8))
        ys, xs = np.nonzero(np.asarray(s) > 20.0)
        assert len(ys) >= 4
        # every detection should be near one of the 4 square corners
        corners = np.array([[40, 40], [40, 59], [59, 40], [59, 59]])
        for y, x in zip(ys, xs):
            d = np.min(np.abs(corners - [y, x]).sum(axis=1))
            assert d <= 4, (y, x)

    def test_score_monotone_in_contrast(self):
        weak = jnp.asarray(white_square() * 0.2)
        strong = jnp.asarray(white_square())
        assert float(jnp.max(fast.fast_score(strong))) > float(
            jnp.max(fast.fast_score(weak))
        )

    def test_border_masked(self):
        img = jnp.asarray(white_square(y0=2, x0=2, size=10))
        s = fast.fast_score(img, border=16)
        assert float(jnp.max(s)) == 0.0

    def test_nms_keeps_single_peak(self):
        s = jnp.zeros((32, 32)).at[10, 10].set(5.0).at[10, 11].set(4.0)
        out = fast.nms_3x3(s)
        assert float(out[10, 10]) == 5.0
        assert float(out[10, 11]) == 0.0


class TestSelection:
    def test_fixed_shapes_and_budget(self):
        score = jnp.asarray(
            np.random.default_rng(0).uniform(0, 50, size=(120, 160)).astype(np.float32)
        )
        xy, resp, valid = selection.select_uniform(score, 100)
        assert xy.shape == (100, 2) and valid.shape == (100,)
        assert int(valid.sum()) == 100  # dense score map: budget fills

    def test_no_duplicate_picks(self):
        score = jnp.asarray(
            np.random.default_rng(1).uniform(0, 50, size=(64, 64)).astype(np.float32)
        )
        xy, _, valid = selection.select_uniform(score, 50)
        pts = np.asarray(xy)[np.asarray(valid)]
        assert len({(float(x), float(y)) for x, y in pts}) == len(pts)

    def test_spatial_uniformity(self):
        # all-strong dense corners: picks should cover all four quadrants
        score = jnp.asarray(
            np.random.default_rng(2).uniform(25, 50, size=(128, 128)).astype(np.float32)
        )
        xy, _, valid = selection.select_uniform(score, 64)
        pts = np.asarray(xy)[np.asarray(valid)]
        for qy in (0, 1):
            for qx in (0, 1):
                n = np.sum(
                    (pts[:, 1] // 64 == qy) & (pts[:, 0] // 64 == qx)
                )
                assert n >= 8, (qy, qx, n)

    def test_strong_preferred_over_weak(self):
        score = jnp.zeros((60, 60))
        score = score.at[10, 10].set(8.0)    # weak (th7 < s < th20)
        score = score.at[40, 40].set(30.0)   # strong
        xy, _, valid = selection.select_uniform(score, 1, high_th=20.0)
        assert bool(valid[0])
        assert tuple(np.asarray(xy[0])) == (40.0, 40.0)

    def test_weak_kept_when_no_strong(self):
        score = jnp.zeros((60, 60)).at[25, 30].set(8.0)
        xy, _, valid = selection.select_uniform(score, 4, high_th=20.0)
        pts = np.asarray(xy)[np.asarray(valid)]
        assert len(pts) == 1 and tuple(pts[0]) == (30.0, 25.0)

    def test_sparse_map_valid_mask(self):
        score = jnp.zeros((60, 60)).at[20, 20].set(30.0)
        _, _, valid = selection.select_uniform(score, 16)
        assert int(valid.sum()) == 1


class TestOrientation:
    def test_gradient_directions(self):
        # horizontal ramp -> centroid along +x -> angle ~ 0
        ramp = jnp.tile(jnp.arange(64.0)[None, :], (64, 1))
        xy = jnp.array([[32.0, 32.0]])
        a = orientation.ic_angles(ramp, xy, jnp.array([True]))
        assert abs(float(a[0])) < 0.05
        # vertical ramp -> angle ~ pi/2
        a2 = orientation.ic_angles(ramp.T, xy, jnp.array([True]))
        assert abs(float(a2[0]) - np.pi / 2) < 0.05

    def test_rotation_consistency(self):
        # rotating the image by 90 deg shifts IC angle by ~90 deg
        rng = np.random.default_rng(3)
        img = rng.uniform(0, 255, (65, 65)).astype(np.float32)
        img = np.asarray(image.gaussian_blur(jnp.asarray(img)))
        xy = jnp.array([[32.0, 32.0]])
        v = jnp.array([True])
        a0 = float(orientation.ic_angles(jnp.asarray(img), xy, v)[0])
        # np.rot90 CCW: new(x', y') = old(y, H-1-x) — angle increases by pi/2
        a1 = float(orientation.ic_angles(jnp.asarray(np.rot90(img, -1).copy()), xy, v)[0])
        diff = (a1 - a0 + np.pi) % (2 * np.pi) - np.pi
        assert abs(abs(diff) - np.pi / 2) < 0.12


class TestDescriptors:
    def _desc_at(self, img, x, y, angle=0.0):
        blur = image.gaussian_blur(jnp.asarray(img))
        return descriptors.orb_descriptors(
            blur,
            jnp.array([[float(x), float(y)]]),
            jnp.array([angle]),
            jnp.array([True]),
        )[0]

    def test_deterministic(self):
        img = np.random.default_rng(4).uniform(0, 255, (96, 96)).astype(np.float32)
        d1 = self._desc_at(img, 48, 48)
        d2 = self._desc_at(img, 48, 48)
        assert jnp.array_equal(d1, d2)

    def test_distinct_textures_far_apart(self):
        rng = np.random.default_rng(5)
        img = rng.uniform(0, 255, (96, 160)).astype(np.float32)
        d1 = self._desc_at(img, 40, 48)
        d2 = self._desc_at(img, 120, 48)
        dist = int(hamming.hamming_pairs(d1[None], d2[None])[0])
        assert 60 < dist < 200  # random descriptors ~128 apart

    def test_rotation_invariance(self):
        # steering by the patch rotation keeps descriptors close
        rng = np.random.default_rng(6)
        base = rng.uniform(0, 255, (129, 129)).astype(np.float32)
        base = np.asarray(image.gaussian_blur(jnp.asarray(base)))  # band-limit
        rot = np.rot90(base, -1).copy()  # -90deg content rotation at center
        c = 64.0
        d0 = self._desc_at(base, c, c, angle=0.0)
        d1 = self._desc_at(rot, c, c, angle=np.pi / 2)
        dist = int(hamming.hamming_pairs(d0[None], d1[None])[0])
        assert dist < 60, dist

    def test_invalid_zeroed(self):
        img = np.random.default_rng(7).uniform(0, 255, (64, 64)).astype(np.float32)
        blur = image.gaussian_blur(jnp.asarray(img))
        d = descriptors.orb_descriptors(
            blur, jnp.array([[32.0, 32.0]]), jnp.array([0.0]), jnp.array([False])
        )
        assert int(d.sum()) == 0


class TestHamming:
    def test_identity_zero(self):
        d = jnp.asarray(
            np.random.default_rng(8).integers(0, 2**32, (5, 8), dtype=np.uint32)
        )
        assert jnp.array_equal(hamming.hamming_pairs(d, d), jnp.zeros(5, jnp.int32))

    def test_matrix_matches_pairs(self):
        rng = np.random.default_rng(9)
        a = jnp.asarray(rng.integers(0, 2**32, (4, 8), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, (6, 8), dtype=np.uint32))
        M = hamming.hamming_matrix(a, b)
        for i in range(4):
            for j in range(6):
                assert int(M[i, j]) == int(hamming.hamming_pairs(a[i : i + 1], b[j : j + 1])[0])

    def test_best_two_masking(self):
        dist = jnp.array([[5, 3, 9]])
        valid = jnp.array([[True, False, True]])
        b1, b2, idx = hamming.best_two(dist, valid)
        assert int(b1[0]) == 5 and int(idx[0]) == 0 and int(b2[0]) == 9


class TestPyramid:
    def test_shapes_follow_scale(self):
        shapes = image.pyramid_shapes(480, 640, 8, 1.2)
        assert shapes[0] == (480, 640)
        assert shapes[1] == (400, 533)
        assert len(shapes) == 8

    def test_budgets_sum(self):
        b = level_budgets(2000, 8, 1.2)
        assert sum(b) == 2000 and b[0] > b[-1] > 0


class TestExtractorEndToEnd:
    @pytest.fixture(scope="class")
    def extractor(self):
        return ORBExtractor(240, 320, n_features=500)

    def test_full_pipeline(self, extractor):
        img = jnp.asarray(checkerboard(240, 320))
        f = extractor(img)
        n = int(f.valid.sum())
        assert n > 200, n
        assert f.xy.shape == (extractor.capacity, 2)
        assert f.desc.shape == (extractor.capacity, 8)
        # level-0 coords inside the image
        pts = np.asarray(f.xy)[np.asarray(f.valid)]
        assert pts[:, 0].max() < 320 and pts[:, 1].max() < 240
        # multiple pyramid levels fire on a self-similar pattern
        assert len(np.unique(np.asarray(f.level)[np.asarray(f.valid)])) >= 3

    def test_matching_across_shift(self, extractor):
        """Descriptors of the same scene shifted 3px should match better than
        chance by a wide margin — the core invariance tracking relies on."""
        rng = np.random.default_rng(10)
        big = rng.uniform(0, 255, (260, 340)).astype(np.float32)
        big = np.asarray(image.gaussian_blur(jnp.asarray(big), 7, 1.5))
        a = extractor(jnp.asarray(big[:240, :320].copy()))
        b = extractor(jnp.asarray(big[3:243, 3:323].copy()))
        M = hamming.hamming_matrix(a.desc, b.desc)
        b1, b2, idx = hamming.best_two(M, b.valid[None, :].repeat(M.shape[0], 0))
        good = (b1 < 50) & a.valid
        assert int(good.sum()) > 50
        # matched pairs should be displaced by ~(-3, -3)
        xa = np.asarray(a.xy)[np.asarray(good)]
        xb = np.asarray(b.xy)[np.asarray(idx)][np.asarray(good)]
        med = np.median(xb - xa, axis=0)
        assert np.allclose(med, [-3, -3], atol=1.0), med
