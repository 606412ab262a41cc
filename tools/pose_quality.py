"""Pose-optimize QUALITY in-pipeline: old (c90ebba) vs new (HEAD)
implementations on identical mid-sequence frames, on TPU and CPU.
Reports inlier counts per frame per impl per platform.

Usage: python tools/pose_quality.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, "/tmp/oldpkg")

import jax
import jax.numpy as jnp
import numpy as np

import myslam_tpu  # noqa: F401
from myslam_tpu.features.extractor import ORBExtractor
from myslam_tpu.features import frame as frame_mod
from myslam_tpu.geom.projection import Camera
from myslam_tpu.geom import se3
from myslam_tpu.io import synthetic
from myslam_tpu.slam import fused, tracking as trk_new

from myslam_old.slam import tracking as trk_old

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
    cfg = trk_new.TrackingConfig(
        kf_cap=64, pt_cap=16384, feat_cap=ex.capacity,
        local_kf=8, local_pts=4096,
        ba_free=8, ba_fixed=8, ba_pts=4096, ba_obs=8,
        tri_neighbors=4, max_new_points=512,
        enable_loop_closing=False)
    with jax.default_device(CPU):
        tr = trk_new.Tracker(cam, cfg)
        i = 0
        while tr.state != trk_new.OK and i < 16:
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
        T_pred = np.asarray(se3.compose(state.velocity, state.Tcw))
        lo = np.asarray(state.last_obs)
        ll = np.asarray(state.last_level)
        la = np.asarray(state.last_angle)

    for k in range(3):
        with jax.default_device(CPU):
            feats = jax.tree.map(np.asarray, frame_mod.undistort(
                cam, ex(jnp.asarray(seq.frame(i + 30 + k)))))
            obs_mm = np.asarray(trk_new._motion_model_match(
                to_dev(store, CPU), cam, to_dev(T_pred, CPU),
                to_dev(feats, CPU), to_dev(lo, CPU), to_dev(ll, CPU),
                to_dev(la, CPU)))
        line = f"frame +{30+k}: n_mm={int((obs_mm>=0).sum())}  "
        for name, mod in (("old", trk_old), ("new", trk_new)):
            for dev in (TPU, CPU):
                T, o, n = mod._pose_optimize(
                    to_dev(store, dev), cam, to_dev(T_pred, dev),
                    to_dev(feats, dev), to_dev(obs_mm, dev), 0.0,
                    escape=True)
                line += f"{name}-{dev.platform}:{int(n)} "
        print(line, flush=True)

        # local-map stage
        with jax.default_device(CPU):
            pt_ids, _, _ = trk_new._local_map_harvest(
                to_dev(store, CPU), to_dev(obs_mm, CPU), 8, 4096)
            merged, vis = trk_new._local_map_match(
                to_dev(store, CPU), cam, to_dev(T_pred, CPU),
                to_dev(feats, CPU), to_dev(obs_mm, CPU),
                to_dev(np.asarray(pt_ids), CPU))
            merged = np.asarray(merged)
        line = f"  local: n_merged={int((merged>=0).sum())}  "
        for name, mod in (("old", trk_old), ("new", trk_new)):
            for dev in (TPU, CPU):
                T, o, n = mod._pose_optimize(
                    to_dev(store, dev), cam, to_dev(T_pred, dev),
                    to_dev(feats, dev), to_dev(merged, dev), 0.0,
                    escape=True)
                line += f"{name}-{dev.platform}:{int(n)} "
        print(line, flush=True)


if __name__ == "__main__":
    main()
