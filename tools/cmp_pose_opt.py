"""A/B pose_opt accuracy: HEAD vs round-1 worktree, same problem, same
platform. Builds a noisy mono pose problem with known ground truth and
reports pose error + inlier count from each implementation.

Usage: python tools/cmp_pose_opt.py [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def build_problem(seed=0, n=800, noise=0.7, outlier_frac=0.25):
    rng = np.random.RandomState(seed)
    xyz = rng.uniform([-3, -2, 3], [3, 2, 12], size=(n, 3))
    # true pose: modest rotation + translation
    from myslam_tpu.geom import se3
    tau = jnp.asarray([0.05, -0.03, 0.08, 0.02, -0.015, 0.01])
    T_true = se3.exp(tau)
    fx = fy = 450.0
    cx, cy = 320.0, 240.0
    Xc = np.asarray(se3.transform(T_true, jnp.asarray(xyz)))
    uv = np.stack([fx * Xc[:, 0] / Xc[:, 2] + cx,
                   fy * Xc[:, 1] / Xc[:, 2] + cy], -1)
    uv += rng.normal(0, noise, uv.shape)
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    uv[out_idx] += rng.uniform(-80, 80, (n_out, 2))
    return T_true, xyz, uv


def main():
    from myslam_tpu.geom import se3
    from myslam_tpu.geom.projection import Camera
    from myslam_tpu.optim import pose_opt

    cam = Camera.create(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                        width=640, height=480)
    print(f"platform: {jax.devices()[0].platform}")
    for seed in range(6):
        T_true, xyz, uv = build_problem(seed)
        n = len(xyz)
        inv_s2 = jnp.ones(n)
        valid = jnp.ones(n, bool)
        # start from a perturbed pose (motion-model prediction quality)
        rngk = np.random.RandomState(100 + seed)
        pert = jnp.asarray(rngk.normal(0, 0.01, 6))
        T0 = se3.compose(se3.exp(pert), T_true)
        T, inlier, n_in = pose_opt.optimize_pose(
            cam, T0, jnp.asarray(xyz), jnp.asarray(uv), inv_s2, valid)
        err = se3.log(se3.compose(T, se3.inverse(T_true)))
        rot_err = float(jnp.linalg.norm(err[:3]))
        t_err = float(jnp.linalg.norm(err[3:]))
        print(f"seed {seed}: n_in={int(n_in)}/600 exp  "
              f"rot_err={np.degrees(rot_err):.4f} deg  "
              f"t_err={t_err*1000:.3f} mm-ish")


if __name__ == "__main__":
    main()
