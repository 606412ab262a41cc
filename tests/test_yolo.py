"""YOLOv2 detector: topology, decode, NMS, weight-format round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myslam_tpu.models import yolo


class TestTopology:
    @pytest.fixture(scope="class")
    def params(self):
        return yolo.init_params(jax.random.PRNGKey(0))

    def test_head_shape(self, params):
        img = jnp.zeros((1, 416, 416, 3))
        out = yolo.forward(params, img)
        assert out.shape == (1, 13, 13, 5 * (5 + 6))

    def test_decode_shapes_and_ranges(self, params):
        img = jnp.zeros((1, 416, 416, 3))
        head = yolo.forward(params, img)
        boxes, scores = yolo.region_decode(
            head, jnp.asarray(yolo.DEFAULT_ANCHORS), 6)
        assert boxes.shape == (1, 13 * 13 * 5, 4)
        assert scores.shape == (1, 13 * 13 * 5, 6)
        b = np.asarray(boxes[0])
        assert (b[:, :2] >= 0).all() and (b[:, :2] <= 1).all()
        s = np.asarray(scores[0])
        assert (s >= 0).all() and (s <= 1).all()

    def test_param_count_matches_spec(self, params):
        # 18 backbone + 2 head + passthrough conv + concat conv + final
        assert len(params) == 18 + 2 + 3


class TestNMS:
    def test_suppresses_overlapping_same_class(self):
        boxes = jnp.asarray([
            [0.5, 0.5, 0.2, 0.2],
            [0.51, 0.5, 0.2, 0.2],   # heavy overlap, same class
            [0.2, 0.2, 0.1, 0.1],    # separate
        ])
        scores = jnp.asarray([
            [0.9, 0.0], [0.8, 0.0], [0.7, 0.0]])
        b, c, s, keep = yolo.nms(boxes, scores, 0.4, 0.4, max_out=8)
        kept = np.asarray(keep)
        assert kept.sum() == 2
        assert np.asarray(s)[0] == pytest.approx(0.9)

    def test_keeps_overlapping_different_class(self):
        boxes = jnp.asarray([
            [0.5, 0.5, 0.2, 0.2],
            [0.51, 0.5, 0.2, 0.2]])
        scores = jnp.asarray([[0.9, 0.0], [0.0, 0.8]])
        _, _, _, keep = yolo.nms(boxes, scores, 0.4, 0.4, max_out=4)
        assert int(np.asarray(keep).sum()) == 2

    def test_threshold(self):
        boxes = jnp.asarray([[0.5, 0.5, 0.2, 0.2]])
        scores = jnp.asarray([[0.3, 0.1]])
        _, _, _, keep = yolo.nms(boxes, scores, 0.4, 0.4, max_out=4)
        assert int(np.asarray(keep).sum()) == 0


class TestFacade:
    def test_detect_runs_end_to_end(self):
        det = yolo.Yolo(seed=1)
        img = np.random.default_rng(0).uniform(0, 1, (480, 640, 3))
        out = det.detect(img.astype(np.float32))
        # random weights: just verify API shape/sanity
        for d in out:
            x, y, w, h = d["box"]
            assert 0 <= x < 640 and 0 <= y < 480
            assert d["score"] >= 0.4
            assert d["class_name"] in det.class_names

    def test_letterbox_geometry(self):
        img = jnp.zeros((480, 640, 3))
        canvas, scale, px, py = yolo.letterbox(img)
        assert canvas.shape == (416, 416, 3)
        assert scale == pytest.approx(416 / 640)
        assert px == 0 and py == (416 - 312) // 2


class TestWeightFormat:
    def test_round_trip(self, tmp_path):
        """Write a synthetic .weights file in darknet format; load; check
        shapes and BN folding."""
        rng = np.random.default_rng(0)
        specs = []
        cin = 3
        for cout, k, _pool in yolo.BACKBONE:
            specs.append((cout, k, cin, True)); cin = cout
        for cout, k in yolo.HEAD:
            specs.append((cout, k, cin, True)); cin = cout
        specs.append((yolo.PASS_CONV[0], yolo.PASS_CONV[1], 512, True))
        specs.append((1024, 3, 1024 + yolo.PASS_CONV[0] * 4, True))
        specs.append((5 * (5 + 6), 1, 1024, False))

        blobs = [np.array([0, 2, 0], np.int32).tobytes(),
                 np.array([0], np.int64).tobytes()]
        for cout, k, ci, bn in specs:
            if bn:
                blobs.append(np.zeros(cout, np.float32).tobytes())        # beta
                blobs.append(np.ones(cout, np.float32).tobytes())         # gamma
                blobs.append(np.zeros(cout, np.float32).tobytes())        # mean
                blobs.append(np.ones(cout, np.float32).tobytes())         # var
            else:
                blobs.append(rng.normal(size=cout).astype(np.float32).tobytes())
            blobs.append(rng.normal(
                size=cout * ci * k * k).astype(np.float32).tobytes())
        p = tmp_path / "w.weights"
        p.write_bytes(b"".join(blobs))

        params = yolo.load_darknet_weights(str(p))
        assert len(params) == len(specs)
        for (cout, k, ci, bn), cp in zip(specs, params):
            assert cp.w.shape == (k, k, ci, cout)
            assert cp.b.shape == (cout,)
        # gamma=1, var=1, mean=0, beta=0 -> w scaled by ~1/sqrt(1+eps)
        img = jnp.zeros((1, 416, 416, 3))
        out = yolo.forward(params, img)
        assert out.shape == (1, 13, 13, 55)
        assert bool(jnp.all(jnp.isfinite(out)))
