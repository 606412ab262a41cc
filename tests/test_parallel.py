"""Distributed Schur BA on the virtual 8-device CPU mesh.

Validates the multi-chip design of SURVEY.md §5.8 / BASELINE config 5:
collectives (psum) run identically on host-platform devices, so the same
code path is what executes on an ICI mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from myslam_tpu.geom import se3
from myslam_tpu.geom.projection import Camera
from myslam_tpu.optim import ba
from myslam_tpu.parallel import dist_ba

CAM = Camera.create(fx=450.0, fy=450.0, cx=320.0, cy=240.0)


def synthetic_problem(K=6, P=300, noise=0.3, seed=0):
    rng = np.random.default_rng(seed)
    xyz = np.stack([rng.uniform(-3, 3, P), rng.uniform(-2, 2, P),
                    rng.uniform(4, 9, P)], 1).astype(np.float32)
    poses = np.tile(np.eye(3, 4, dtype=np.float32), (K, 1, 1))
    poses[:, 0, 3] = np.linspace(0, -0.8, K)
    # every point observed by every KF
    e_kf = np.repeat(np.arange(K), P).astype(np.int32)
    e_pt = np.tile(np.arange(P), K).astype(np.int32)
    pc = np.einsum("eij,ej->ei", poses[e_kf, :, :3], xyz[e_pt]) + poses[e_kf, :, 3]
    uv = np.stack([450 * pc[:, 0] / pc[:, 2] + 320,
                   450 * pc[:, 1] / pc[:, 2] + 240], 1)
    uv = (uv + rng.normal(0, noise, uv.shape)).astype(np.float32)
    E = len(e_kf)
    # perturb initial estimate
    poses_init = poses.copy()
    for k in range(1, K):
        poses_init[k] = np.asarray(se3.retract(
            jnp.asarray(poses[k]),
            jnp.asarray(np.r_[rng.normal(0, 0.003, 3),
                              rng.normal(0, 0.01, 3)].astype(np.float32))))
    prob = ba.BAProblem(
        kf_pose=jnp.asarray(poses_init),
        pt_xyz=jnp.asarray(xyz + rng.normal(0, 0.03, (P, 3)).astype(np.float32)),
        edge_kf=jnp.asarray(e_kf), edge_pt=jnp.asarray(e_pt),
        edge_uv=jnp.asarray(uv), edge_inv_sigma2=jnp.ones(E),
        edge_valid=jnp.ones(E, bool),
        kf_fixed=jnp.zeros(K, bool).at[0].set(True),
    )
    return prob, poses, xyz


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return Mesh(np.array(jax.devices()[:8]), ("edge",))


class TestDistributedBA:
    def test_converges_to_ground_truth(self, mesh):
        prob, poses_gt, xyz_gt = synthetic_problem()
        out = dist_ba.distributed_bundle_adjust(CAM, prob, mesh, iters=15)
        # monocular gauge: only KF0 is fixed, so global scale is free —
        # align scale via median point-depth ratio before comparing
        s = float(jnp.median(jnp.linalg.norm(jnp.asarray(xyz_gt), axis=-1)
                             / jnp.linalg.norm(out.pt_xyz, axis=-1)))
        # theory: sigma_z ~ z^2/(f*b) * sigma_px / sqrt(K) ~ 0.02 at z~6
        pt_err = float(jnp.median(jnp.linalg.norm(
            s * out.pt_xyz - jnp.asarray(xyz_gt), axis=-1)))
        assert pt_err < 0.04, pt_err
        t_err = float(jnp.abs(
            s * out.kf_pose[:, :, 3] - jnp.asarray(poses_gt)[:, :, 3]).max())
        assert t_err < 2e-2, t_err
        # cost at noise floor
        chi2, _ = ba.edge_chi2_depth(CAM, out)
        assert float(jnp.mean(chi2)) < 0.35

    def test_matches_single_device_ba(self, mesh):
        prob, *_ = synthetic_problem(seed=1)
        out_dist = dist_ba.distributed_bundle_adjust(CAM, prob, mesh, iters=8)
        out_single = ba.run_lm(CAM, prob, 8, use_huber=True)
        # same algorithm, same LM trajectory -> near-identical results
        assert float(jnp.abs(out_dist.kf_pose - out_single.kf_pose).max()) < 1e-3
        assert float(jnp.median(jnp.linalg.norm(
            out_dist.pt_xyz - out_single.pt_xyz, axis=-1))) < 1e-3

    def test_edge_padding(self, mesh):
        prob, *_ = synthetic_problem(K=4, P=101, seed=2)  # E=404, not /8
        out = dist_ba.distributed_bundle_adjust(CAM, prob, mesh, iters=4)
        assert bool(jnp.all(jnp.isfinite(out.kf_pose)))

    def test_graft_dryrun(self, mesh):
        import __graft_entry__
        __graft_entry__.dryrun_multichip(8)
