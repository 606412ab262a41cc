"""Stereo/RGB-D layer tests: matching kernel, depth association, stereo
pose optimization and stereo BA edges (reference behaviors:
Frame::ComputeStereoMatches src/Frame.cc:466-641,
Frame::ComputeStereoFromRGBD src/Frame.cc:643-664, g2o stereo edges used
by Optimizer src/Optimizer.cc:338,570-607)."""

import jax.numpy as jnp
import numpy as np
import pytest

from myslam_tpu.features.extractor import ORBExtractor
from myslam_tpu.geom import se3
from myslam_tpu.geom.projection import Camera
from myslam_tpu.ops import image as img_ops
from myslam_tpu.ops import stereo as stereo_ops
from myslam_tpu.optim import ba, pose_opt


def _texture(h, w, seed=0, pad=0):
    rng = np.random.default_rng(seed)
    tex = rng.uniform(0, 255, (h, w + pad)).astype(np.float32)
    return np.asarray(img_ops.gaussian_blur(jnp.asarray(tex), 7, 1.5))


def test_match_stereo_uniform_disparity():
    """A horizontally shifted image is a constant-depth plane: matched
    disparities must equal the shift to sub-pixel accuracy."""
    h, w, disp = 240, 320, 9
    tex = _texture(h, w, pad=disp)
    left = tex[:, :w]
    right = tex[:, disp:disp + w]  # content moves LEFT in the right view

    ex = ORBExtractor(h, w, n_features=300, n_levels=4)
    fL = ex(jnp.asarray(left))
    fR = ex(jnp.asarray(right))
    bf = 40.0  # baseline*fx -> depth = 40/9
    u_right, depth = stereo_ops.match_stereo(
        fL, fR, jnp.asarray(left), jnp.asarray(right), bf, min_z=0.5)

    got = np.asarray(u_right)
    uL = np.asarray(fL.xy_raw[:, 0])
    ok = got >= 0
    assert ok.sum() > 50, f"too few stereo matches: {ok.sum()}"
    d_err = np.abs((uL[ok] - got[ok]) - disp)
    # majority of disparities within half a pixel of truth
    assert np.median(d_err) < 0.5, f"median disparity err {np.median(d_err)}"
    z = np.asarray(depth)[ok]
    assert np.allclose(np.median(z), bf / disp, rtol=0.1)


def test_stereo_from_depth_roundtrip():
    h, w = 120, 160
    ex = ORBExtractor(h, w, n_features=100, n_levels=2)
    feats = ex(jnp.asarray(_texture(h, w, seed=3)))
    depth_img = jnp.full((h, w), 2.5, jnp.float32)
    bf, factor = 20.0, 5.0
    u_right, depth = stereo_ops.stereo_from_depth(
        feats, depth_img * factor, bf, depth_factor=factor)
    ok = np.asarray(depth) > 0
    assert ok.sum() > 10
    np.testing.assert_allclose(np.asarray(depth)[ok], 2.5, atol=1e-4)
    expect = np.asarray(feats.xy[:, 0])[ok] - bf / 2.5
    np.testing.assert_allclose(np.asarray(u_right)[ok], expect, atol=1e-4)


def _stereo_scene(n=200, seed=0):
    rng = np.random.default_rng(seed)
    cam = Camera.create(fx=400.0, fy=400.0, cx=160.0, cy=120.0,
                        width=320, height=240)
    bf = 0.1 * 400.0
    xyz = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                    rng.uniform(2, 6, n)], 1).astype(np.float32)
    return cam, bf, jnp.asarray(xyz)


def _observe(cam, bf, Tcw, xyz):
    pc = se3.transform(Tcw, xyz)
    u = cam.fx * pc[:, 0] / pc[:, 2] + cam.cx
    v = cam.fy * pc[:, 1] / pc[:, 2] + cam.cy
    ur = u - bf / pc[:, 2]
    return jnp.stack([u, v], 1), ur


def test_pose_opt_stereo_converges_and_fixes_scale():
    """Stereo edges constrain absolute depth: a pure z-translation offset
    (invisible to mono up to scale for a fronto scene) must be recovered."""
    cam, bf, xyz = _stereo_scene()
    T_gt = se3.make(jnp.eye(3), jnp.asarray([0.1, -0.05, 0.3]))
    uv, ur = _observe(cam, bf, T_gt, xyz)
    T0 = se3.make(jnp.eye(3), jnp.zeros(3))
    valid = jnp.ones(xyz.shape[0], bool)
    inv_s2 = jnp.ones(xyz.shape[0])
    Tcw, inlier, n = pose_opt.optimize_pose(
        cam, T0, xyz, uv, inv_s2, valid, u_right=ur, bf=bf)
    assert int(n) > 150
    np.testing.assert_allclose(np.asarray(Tcw), np.asarray(T_gt), atol=1e-3)


def test_pose_opt_stereo_rejects_outliers():
    cam, bf, xyz = _stereo_scene(seed=1)
    T_gt = se3.make(jnp.eye(3), jnp.asarray([0.05, 0.02, -0.1]))
    uv, ur = _observe(cam, bf, T_gt, xyz)
    n = xyz.shape[0]
    rng = np.random.default_rng(0)
    bad = np.zeros(n, bool)
    bad[rng.choice(n, 40, replace=False)] = True
    uv = jnp.where(jnp.asarray(bad)[:, None],
                   uv + jnp.asarray(rng.uniform(30, 80, (n, 2))), uv)
    Tcw, inlier, n_in = pose_opt.optimize_pose(
        cam, se3.identity(), xyz, uv, jnp.ones(n), jnp.ones(n, bool),
        u_right=ur, bf=bf)
    assert int(n_in) >= 150
    inl = np.asarray(inlier)
    assert not np.any(inl & bad), "outliers kept as inliers"
    np.testing.assert_allclose(np.asarray(Tcw), np.asarray(T_gt), atol=5e-3)


def test_ba_with_stereo_edges():
    """Stereo BA must pull perturbed poses/points back AND pin scale: a
    globally scaled map is NOT a stereo optimum (it is a mono gauge mode)."""
    cam, bf, xyz = _stereo_scene(n=150, seed=2)
    K, P = 3, 150
    rng = np.random.default_rng(0)
    poses, uvs, urs = [], [], []
    for k in range(K):
        T = se3.make(jnp.eye(3), jnp.asarray([-0.15 * k, 0.0, 0.02 * k]))
        poses.append(T)
        uv, ur = _observe(cam, bf, T, xyz)
        uvs.append(uv)
        urs.append(ur)
    e_kf = jnp.repeat(jnp.arange(K), P)
    e_pt = jnp.tile(jnp.arange(P), K)
    prob = ba.BAProblem(
        kf_pose=jnp.stack(poses),
        pt_xyz=jnp.asarray(np.asarray(xyz) * 1.06
                           + rng.normal(0, 0.01, (P, 3)).astype(np.float32)),
        edge_kf=e_kf, edge_pt=e_pt,
        edge_uv=jnp.concatenate(uvs),
        edge_inv_sigma2=jnp.ones(K * P),
        edge_valid=jnp.ones(K * P, bool),
        kf_fixed=jnp.zeros(K, bool).at[0].set(True),
        edge_ur=jnp.concatenate(urs),
        bf=bf,
    )
    out, inlier = ba.bundle_adjust(cam, prob, 8, 10)
    err = np.linalg.norm(np.asarray(out.pt_xyz) - np.asarray(xyz), axis=1)
    assert np.median(err) < 5e-3, f"median point err {np.median(err)}"
    assert int(inlier.sum()) > 0.9 * K * P


def test_mono_ba_unchanged_without_ur():
    """edge_ur=None keeps the pure-mono code path (regression guard)."""
    cam, bf, xyz = _stereo_scene(n=80, seed=4)
    T = se3.make(jnp.eye(3), jnp.asarray([0.1, 0.0, 0.0]))
    uv, _ = _observe(cam, bf, T, xyz)
    prob = ba.BAProblem(
        kf_pose=jnp.stack([se3.identity(), T]),
        pt_xyz=xyz + 0.01,
        edge_kf=jnp.concatenate([jnp.zeros(80, jnp.int32),
                                 jnp.ones(80, jnp.int32)]),
        edge_pt=jnp.tile(jnp.arange(80), 2),
        edge_uv=jnp.concatenate([_observe(cam, bf, se3.identity(), xyz)[0],
                                 uv]),
        edge_inv_sigma2=jnp.ones(160),
        edge_valid=jnp.ones(160, bool),
        kf_fixed=jnp.asarray([True, True]),
    )
    out, inlier = ba.bundle_adjust(cam, prob, 5, 5)
    err = np.linalg.norm(np.asarray(out.pt_xyz) - np.asarray(xyz), axis=1)
    assert np.median(err) < 2e-3
