"""BA result QUALITY: final mean chi2 over valid edges + pose error vs a
float64 scipy-grade reference, for old (c90ebba) and new (HEAD) BA on
TPU and CPU. Also bundle_adjust (relabeling) inlier counts.

Usage: python tools/ba_quality.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, "/tmp/oldpkg")

import jax
import jax.numpy as jnp
import numpy as np

import myslam_tpu  # noqa: F401  (sets highest matmul precision)
from myslam_tpu.features.extractor import ORBExtractor
from myslam_tpu.features import frame as frame_mod
from myslam_tpu.geom.projection import Camera
from myslam_tpu.io import synthetic
from myslam_tpu.mapping import local_mapping
from myslam_tpu.optim import ba as ba_new
from myslam_tpu.slam import fused, tracking

from myslam_old.optim import ba as ba_old

CPU = jax.local_devices(backend="cpu")[0]
TPU = jax.devices()[0]


def to_dev(tree, dev):
    return jax.tree.map(lambda x: jax.device_put(np.asarray(x), dev), tree)


def mean_chi2(cam, prob, mod):
    chi2, z = mod.edge_chi2_depth(cam, prob, o_group=8)
    chi2 = np.asarray(chi2)
    ok = np.asarray(prob.edge_valid) & (np.asarray(z) > 0)
    return float(np.median(chi2[ok])), float(np.mean(np.minimum(chi2[ok], 100.0)))


def main():
    seq = synthetic.ImageSequence(width=640, height=480, n_frames=64,
                                  step_px=2.0)
    cam = Camera.create(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                        width=640, height=480)
    ex = ORBExtractor(480, 640, n_features=2000)
    cfg = tracking.TrackingConfig(
        kf_cap=64, pt_cap=16384, feat_cap=ex.capacity,
        local_kf=8, local_pts=4096,
        ba_free=8, ba_fixed=8, ba_pts=4096, ba_obs=8,
        tri_neighbors=4, max_new_points=512,
        enable_loop_closing=False)
    with jax.default_device(CPU):
        tr = tracking.Tracker(cam, cfg)
        i = 0
        while tr.state != tracking.OK and i < 16:
            feats = frame_mod.undistort(cam, ex(jnp.asarray(seq.frame(i))))
            tr.process_frame(feats, i, i / 30.0)
            i += 1
        ft = fused.FusedTracker(cam, cfg, extractor=ex)
        state = ft.state_from(tr)
        for k in range(24):
            feats = frame_mod.undistort(
                cam, ex(jnp.asarray(seq.frame(i + k))))
            state, _ = ft.step(state, feats, (i + k) / 30.0)
        store = jax.tree.map(np.asarray, state.store)
        ref_kf = int(np.asarray(state.ref_kf))
        prob, *_ = local_mapping.build_local_ba(
            to_dev(store, CPU), ref_kf, cfg.ba_free, cfg.ba_fixed,
            cfg.ba_pts, cfg.ba_obs)
        prob = jax.tree.map(np.asarray, prob)

    med0, mean0 = mean_chi2(cam, to_dev(prob, CPU), ba_new)
    print(f"initial: median chi2 {med0:.4f}  mean(min(chi2,100)) {mean0:.4f}")
    for name, mod in (("old", ba_old), ("new", ba_new)):
        for dev in (TPU, CPU):
            p = to_dev(prob, dev)
            out = mod.run_lm(cam, p, 20, use_huber=True, o_group=8)
            med, mean = mean_chi2(cam, jax.tree.map(np.asarray, out),
                                  ba_new)
            p2, inl = mod.bundle_adjust(cam, p, 8, 12, o_group=8)
            med2, mean2 = mean_chi2(cam, jax.tree.map(np.asarray, p2),
                                    ba_new)
            n_inl = int(np.asarray(inl).sum())
            print(f"{name} {dev.platform:4s}: run_lm20 median {med:.4f} "
                  f"mean {mean:.4f} | bundle_adjust median {med2:.4f} "
                  f"mean {mean2:.4f} inliers {n_inl}")


if __name__ == "__main__":
    main()
