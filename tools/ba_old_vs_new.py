"""Compare the pre-8b188fc structured BA (c90ebba, imported as
myslam_old) against HEAD's component-major BA on the SAME problem:
TPU-vs-CPU self-divergence per implementation, valid lanes only.

Usage: python tools/ba_old_vs_new.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, "/tmp/oldpkg")

import jax
import jax.numpy as jnp
import numpy as np

import myslam_tpu  # sets highest matmul precision
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
        prob, ks, ps, ef, es = local_mapping.build_local_ba(
            to_dev(store, CPU), ref_kf, cfg.ba_free, cfg.ba_fixed,
            cfg.ba_pts, cfg.ba_obs)
        prob = jax.tree.map(np.asarray, prob)

    kf_free = ~np.asarray(prob.kf_fixed)
    ev = np.asarray(prob.edge_valid)
    pt_live = np.zeros(prob.pt_xyz.shape[0], bool)
    pt_live[np.asarray(prob.edge_pt)[ev]] = True
    print(f"problem: {kf_free.sum()} free KFs, {pt_live.sum()} live pts, "
          f"{ev.sum()} edges")

    for name, mod in (("old (c90ebba)", ba_old), ("new (HEAD)", ba_new)):
        for iters in (1, 2, 4, 8, 20):
            outs = {}
            for dev in (TPU, CPU):
                p = to_dev(prob, dev)
                out = mod.run_lm(cam, p, iters, use_huber=True, o_group=8)
                outs[dev.platform] = jax.tree.map(np.asarray, out)
            a, b = outs["tpu"], outs["cpu"]
            dp = np.abs(a.kf_pose - b.kf_pose)[kf_free].max() \
                if kf_free.any() else 0.0
            dx = np.abs(a.pt_xyz - b.pt_xyz)[pt_live].max()
            print(f"{name:14s} iters={iters:2d}  "
                  f"max|dpose|={dp:.3e}  max|dxyz|={dx:.3e}")


if __name__ == "__main__":
    main()
