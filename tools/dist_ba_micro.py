"""Microbench: distributed structured Schur BA vs single-device, CPU mesh.

VERDICT r4 #3 done-criterion: per-iteration time of the point-sharded
distributed path within ~2x of the single-device structured kernels on
the virtual 8-device CPU mesh (collective overhead + replicated solve are
the only extras; on a real ICI mesh the O(E) edge work then scales with
device count).

Usage: python tools/dist_ba_micro.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from myslam_tpu.geom.projection import Camera
from myslam_tpu.optim import ba
from myslam_tpu.parallel import dist_ba

CAM = Camera.create(fx=450.0, fy=450.0, cx=320.0, cy=240.0)


def structured_problem(K=64, P=8192, O=8, seed=0):
    rng = np.random.default_rng(seed)
    xyz = np.stack([rng.uniform(-3, 3, P), rng.uniform(-2, 2, P),
                    rng.uniform(4, 9, P)], 1).astype(np.float32)
    poses = np.tile(np.eye(3, 4, dtype=np.float32), (K, 1, 1))
    poses[:, 0, 3] = np.linspace(0, -0.8, K)
    e_pt = np.repeat(np.arange(P), O)
    e_kf = rng.integers(0, K, P * O).astype(np.int32)
    pc = np.einsum("eij,ej->ei", poses[e_kf, :, :3], xyz[e_pt]) \
        + poses[e_kf, :, 3]
    uv = np.stack([450 * pc[:, 0] / pc[:, 2] + 320,
                   450 * pc[:, 1] / pc[:, 2] + 240], 1)
    uv = (uv + rng.normal(0, 0.3, uv.shape)).astype(np.float32)
    E = P * O
    return ba.BAProblem(
        kf_pose=jnp.asarray(poses),
        pt_xyz=jnp.asarray(xyz + rng.normal(0, 0.02, (P, 3)
                                            ).astype(np.float32)),
        edge_kf=jnp.asarray(e_kf),
        edge_pt=jnp.asarray(e_pt.astype(np.int32)),
        edge_uv=jnp.asarray(uv), edge_inv_sigma2=jnp.ones(E),
        edge_valid=jnp.ones(E, bool),
        kf_fixed=jnp.zeros(K, bool).at[0].set(True),
    ), O


def main():
    prob, O = structured_problem()
    ITERS = 10

    def clock(fn):
        fn()  # compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            best = min(best, time.perf_counter() - t0)
        return best / ITERS * 1e3

    single = clock(lambda: ba.run_lm(CAM, prob, ITERS, use_huber=True,
                                     o_group=O).kf_pose)
    print(f"single-device structured: {single:7.2f} ms/iter")
    # NOTE: this host has 2 physical cores. An 8-virtual-device mesh
    # timeshares 8 shard programs onto them (and runs the replicated
    # reduced solve 8x serially), so only the 2-device row reflects what
    # parallel hardware would do; the 8-device row bounds the collective
    # + replication overhead.
    for n in (2, 8):
        mesh = Mesh(np.array(jax.devices()[:n]), ("pt",))
        dist = clock(lambda: dist_ba.distributed_bundle_adjust(
            CAM, prob, mesh, iters=ITERS, o_group=O).kf_pose)
        print(f"{n}-shard distributed:      {dist:7.2f} ms/iter "
              f"({dist / single:.2f}x)")


if __name__ == "__main__":
    main()
