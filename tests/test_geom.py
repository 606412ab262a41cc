"""Unit tests for geom: SE3/Sim3 Lie ops, projection, triangulation, epipolar."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from myslam_tpu.geom import se3, sim3, projection, triangulation, epipolar
from myslam_tpu.geom.projection import Camera


def random_rotation(rng, n=()):
    w = rng.normal(size=n + (3,)) * 1.5
    return np.asarray(se3.exp_so3(jnp.asarray(w, dtype=jnp.float32)))


def random_pose(rng, n=()):
    R = random_rotation(rng, n)
    t = rng.normal(size=n + (3,)).astype(np.float32)
    return np.asarray(se3.make(jnp.asarray(R), jnp.asarray(t)))


class TestSE3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(0)
        xi = jnp.asarray(rng.normal(size=(32, 6)) * 0.7, dtype=jnp.float32)
        T = se3.exp(xi)
        xi2 = se3.log(T)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-5)

    def test_small_angle(self):
        xi = jnp.asarray([[1e-9, 0, 0, 0.1, 0.2, 0.3]], dtype=jnp.float32)
        T = se3.exp(xi)
        np.testing.assert_allclose(
            np.asarray(se3.translation(T))[0], [0.1, 0.2, 0.3], atol=1e-6
        )
        assert not np.any(np.isnan(np.asarray(se3.log(T))))

    def test_compose_inverse(self):
        rng = np.random.default_rng(1)
        Ta = jnp.asarray(random_pose(rng, (8,)))
        Tb = jnp.asarray(random_pose(rng, (8,)))
        Tc = se3.compose(Ta, Tb)
        T_id = se3.compose(Tc, se3.compose(se3.inverse(Tb), se3.inverse(Ta)))
        np.testing.assert_allclose(
            np.asarray(T_id),
            np.broadcast_to(np.asarray(se3.identity()), (8, 3, 4)),
            atol=1e-5,
        )

    def test_transform_matches_matmul(self):
        rng = np.random.default_rng(2)
        T = jnp.asarray(random_pose(rng))
        pts = jnp.asarray(rng.normal(size=(10, 3)), dtype=jnp.float32)
        out = se3.transform(T, pts)
        expected = pts @ np.asarray(se3.rotation(T)).T + np.asarray(se3.translation(T))
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)

    def test_quaternion_roundtrip(self):
        rng = np.random.default_rng(3)
        R = jnp.asarray(random_rotation(rng, (16,)))
        q = se3.to_quaternion(R)
        R2 = se3.from_quaternion(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)

    def test_camera_center(self):
        rng = np.random.default_rng(4)
        T = jnp.asarray(random_pose(rng))
        c = se3.camera_center(T)
        # transforming the center into camera frame gives origin
        np.testing.assert_allclose(np.asarray(se3.transform(T, c)), 0.0, atol=1e-5)


class TestSim3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(5)
        xi = jnp.asarray(rng.normal(size=(16, 7)) * 0.5, dtype=jnp.float32)
        S = sim3.exp(xi)
        xi2 = sim3.log(S)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=3e-5)

    def test_identity_tangent(self):
        S = sim3.exp(jnp.zeros((7,), dtype=jnp.float32))
        R, t, s = S
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-6)

    def test_compose_inverse(self):
        rng = np.random.default_rng(6)
        xa = jnp.asarray(rng.normal(size=(7,)) * 0.5, dtype=jnp.float32)
        xb = jnp.asarray(rng.normal(size=(7,)) * 0.5, dtype=jnp.float32)
        Sa, Sb = sim3.exp(xa), sim3.exp(xb)
        S = sim3.compose(sim3.compose(Sa, Sb), sim3.inverse(Sb))
        Ra, ta, sa = Sa
        R, t, s = S
        np.testing.assert_allclose(np.asarray(R), np.asarray(Ra), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), np.asarray(ta), atol=1e-5)
        np.testing.assert_allclose(np.asarray(s), np.asarray(sa), atol=1e-5)

    def test_transform_scale(self):
        S = sim3.make(jnp.eye(3), jnp.zeros(3), jnp.asarray(2.0))
        pts = jnp.asarray([[1.0, 2.0, 3.0]])
        np.testing.assert_allclose(
            np.asarray(sim3.transform(S, pts)), [[2.0, 4.0, 6.0]], atol=1e-6
        )


def make_camera():
    return Camera.create(fx=520.9, fy=521.0, cx=325.1, cy=249.7,
                         k1=0.05, k2=-0.1, p1=0.001, p2=-0.002,
                         width=640, height=480)


class TestProjection:
    def test_project_backproject(self):
        cam = make_camera()
        rng = np.random.default_rng(7)
        pts = jnp.asarray(
            np.stack([rng.uniform(-1, 1, 50), rng.uniform(-1, 1, 50),
                      rng.uniform(1, 5, 50)], axis=-1), dtype=jnp.float32)
        uv, z = projection.project(cam, pts)
        back = projection.backproject(cam, uv, z)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)

    def test_undistort_inverts_distort(self):
        cam = make_camera()
        rng = np.random.default_rng(8)
        xn = jnp.asarray(rng.uniform(-0.4, 0.4, size=(64, 2)), dtype=jnp.float32)
        xd = projection.distort_normalized(cam, xn)
        uv_dist = jnp.stack([
            xd[:, 0] * cam.fx + cam.cx, xd[:, 1] * cam.fy + cam.cy], axis=-1)
        uv_und = projection.undistort_points(cam, uv_dist)
        expected = np.stack([
            np.asarray(xn[:, 0]) * float(cam.fx) + float(cam.cx),
            np.asarray(xn[:, 1]) * float(cam.fy) + float(cam.cy)], axis=-1)
        np.testing.assert_allclose(np.asarray(uv_und), expected, atol=0.05)

    def test_in_frustum(self):
        cam = make_camera()
        Tcw = se3.identity()
        bounds = (0.0, 640.0, 0.0, 480.0)
        pts = jnp.asarray([
            [0.0, 0.0, 2.0],     # center, visible
            [0.0, 0.0, -2.0],    # behind
            [100.0, 0.0, 2.0],   # out of image
        ], dtype=jnp.float32)
        normals = jnp.asarray([[0, 0, 1.0]] * 3, dtype=jnp.float32)
        vis, uv, dist, cosv = projection.in_frustum(
            cam, Tcw, pts, normals,
            jnp.asarray([0.1] * 3), jnp.asarray([10.0] * 3), bounds)
        assert np.asarray(vis).tolist() == [True, False, False]


class TestTriangulation:
    def test_dlt_exact(self):
        cam = make_camera()
        rng = np.random.default_rng(9)
        T1 = se3.identity()
        T2 = se3.exp(jnp.asarray([0.02, -0.01, 0.03, 0.3, 0.0, 0.05],
                                 dtype=jnp.float32))
        pts = jnp.asarray(
            np.stack([rng.uniform(-1, 1, 40), rng.uniform(-1, 1, 40),
                      rng.uniform(2, 6, 40)], axis=-1), dtype=jnp.float32)
        uv1, _ = projection.project_world(cam, T1, pts)
        uv2, _ = projection.project_world(cam, T2, pts)
        P1 = triangulation.projection_matrix(cam, T1)
        P2 = triangulation.projection_matrix(cam, T2)
        xyz = triangulation.triangulate_dlt(P1, P2, uv1, uv2)
        np.testing.assert_allclose(np.asarray(xyz), np.asarray(pts), atol=2e-2)

    def test_parallax(self):
        T1 = se3.identity()
        T2 = se3.make(jnp.eye(3), jnp.asarray([-1.0, 0.0, 0.0]))
        pt = jnp.asarray([[0.0, 0.0, 1.0]])
        cosp = triangulation.parallax_cos(T1, T2, pt)
        # baseline 1 at depth 1 -> 45 deg parallax
        np.testing.assert_allclose(np.asarray(cosp), np.cos(np.pi / 4), atol=1e-4)


class TestEpipolar:
    def test_fundamental_from_poses(self):
        cam = make_camera()
        rng = np.random.default_rng(10)
        T1 = se3.exp(jnp.asarray(rng.normal(size=6) * 0.1, dtype=jnp.float32))
        T2 = se3.exp(jnp.asarray(rng.normal(size=6) * 0.1 + 0.2, dtype=jnp.float32))
        pts = jnp.asarray(
            np.stack([rng.uniform(-1, 1, 30), rng.uniform(-1, 1, 30),
                      rng.uniform(2, 6, 30)], axis=-1), dtype=jnp.float32)
        uv1, _ = projection.project_world(cam, T1, pts)
        uv2, _ = projection.project_world(cam, T2, pts)
        F12 = epipolar.fundamental_from_poses(cam, T1, T2)
        d = epipolar.epipolar_dist_sq(F12, uv1, uv2)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-2)

    def test_fundamental_8pt(self):
        cam = make_camera()
        rng = np.random.default_rng(11)
        T1 = se3.identity()
        T2 = se3.exp(jnp.asarray([0.05, 0.02, -0.03, 0.4, 0.1, 0.0],
                                 dtype=jnp.float32))
        pts = jnp.asarray(
            np.stack([rng.uniform(-1, 1, 60), rng.uniform(-1, 1, 60),
                      rng.uniform(2, 8, 60)], axis=-1), dtype=jnp.float32)
        uv1, _ = projection.project_world(cam, T1, pts)
        uv2, _ = projection.project_world(cam, T2, pts)
        n1, Tn1 = epipolar.normalize_points(uv1)
        n2, Tn2 = epipolar.normalize_points(uv2)
        Fn = epipolar.fundamental_8pt(n1, n2)
        F = Tn2.T @ Fn @ Tn1
        # x2^T F x1 = 0
        x1h = jnp.concatenate([uv1, jnp.ones((60, 1))], axis=-1)
        x2h = jnp.concatenate([uv2, jnp.ones((60, 1))], axis=-1)
        resid = jnp.einsum("ni,ij,nj->n", x2h, F, x1h)
        scale = np.abs(np.asarray(F)).max()
        assert np.abs(np.asarray(resid)).max() / scale < 0.5

    def test_homography_dlt(self):
        rng = np.random.default_rng(12)
        H_true = np.eye(3) + rng.normal(size=(3, 3)) * 0.1
        x1 = rng.uniform(-1, 1, size=(40, 2))
        x1h = np.concatenate([x1, np.ones((40, 1))], axis=-1)
        x2h = x1h @ H_true.T
        x2 = x2h[:, :2] / x2h[:, 2:]
        H = np.asarray(epipolar.homography_dlt(
            jnp.asarray(x1, dtype=jnp.float32), jnp.asarray(x2, dtype=jnp.float32)))
        H = H / H[2, 2] * H_true[2, 2]
        np.testing.assert_allclose(H, H_true, atol=1e-3)

    def test_decompose_essential(self):
        rng = np.random.default_rng(13)
        R_true = jnp.asarray(random_rotation(rng))
        t_true = np.asarray([0.5, -0.2, 0.1])
        t_true = t_true / np.linalg.norm(t_true)
        E = np.asarray(se3.hat(jnp.asarray(t_true, dtype=jnp.float32))) @ np.asarray(R_true)
        R1, R2, t = epipolar.decompose_essential(jnp.asarray(E, dtype=jnp.float32))
        ok_R = min(np.abs(np.asarray(R1) - np.asarray(R_true)).max(),
                   np.abs(np.asarray(R2) - np.asarray(R_true)).max())
        ok_t = min(np.abs(np.asarray(t) - t_true).max(),
                   np.abs(np.asarray(t) + t_true).max())
        assert ok_R < 1e-4
        assert ok_t < 1e-4


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q"]))
