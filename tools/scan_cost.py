"""Measure the scan-of-steps cost with/without the keyframe cond.

Usage:
  python tools/scan_cost.py            # normal step (frozen state)
  MYSLAM_NO_KF_BRANCH=1 python tools/scan_cost.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from myslam_tpu.features.extractor import ORBExtractor
from myslam_tpu.features import frame as frame_mod
from myslam_tpu.geom.projection import Camera
from myslam_tpu.io import synthetic
from myslam_tpu.slam import fused, tracking

CHUNK = 16


def main():
    seq = synthetic.ImageSequence(width=640, height=480, n_frames=40,
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
    tr = tracking.Tracker(cam, cfg)
    i = 0
    while tr.state != tracking.OK and i < 16:
        img = jnp.asarray(seq.frame(i))
        feats = frame_mod.undistort(cam, ex(img))
        tr.process_frame(feats, i, i / 30.0)
        i += 1
    ft = fused.FusedTracker(cam, cfg, extractor=ex)
    state = ft.state_from(tr).replace(frozen=jnp.asarray(True))

    imgs = np.stack([seq.frame(i + k) for k in range(CHUNK)]).astype(np.uint8)
    ts = (i + np.arange(CHUNK)) / 30.0
    feats_chunk = jax.vmap(
        lambda im: frame_mod.undistort(cam, ex(im.astype(jnp.float32))))(
        jnp.asarray(imgs))
    jax.block_until_ready(feats_chunk.xy)

    def run():
        st, _ = ft.run_chunk(state, feats_chunk, ts)
        jax.block_until_ready(st.Tcw)

    run()
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    tag = "no-kf-branch" if fused._NO_KF_BRANCH else "with-kf-cond"
    print(f"scan of {CHUNK} frozen steps [{tag}]: {best*1e3:.1f} ms "
          f"({best*1e3/CHUNK:.2f} ms/frame)")


if __name__ == "__main__":
    main()
