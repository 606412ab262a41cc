"""Diagnostic: replicate bench.py main() and report per-chunk keyframe
insertions + inlier counts (the KF rate drives the fused-step cost).

Usage: python tools/kf_rate.py [--cpu]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from myslam_tpu.features.extractor import ORBExtractor
from myslam_tpu.features import frame as frame_mod
from myslam_tpu.geom.projection import Camera
from myslam_tpu.io import synthetic
from myslam_tpu.slam import fused, tracking

CHUNK = 16
N_CHUNKS = 6


def main():
    n_frames = CHUNK * N_CHUNKS + 16
    seq = synthetic.ImageSequence(width=640, height=480,
                                  n_frames=n_frames + 2, step_px=2.0)
    cam = Camera.create(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                        width=640, height=480)
    ex = ORBExtractor(480, 640, n_features=2000)
    no_ba = "--no-ba" in sys.argv
    kw = {}
    if "--no-so" in sys.argv:       # disable second-order fuse
        kw["fuse_second_order"] = 0
    cfg = tracking.TrackingConfig(
        kf_cap=64, pt_cap=16384, feat_cap=ex.capacity,
        local_kf=8, local_pts=4096,
        ba_free=8, ba_fixed=8, ba_pts=4096, ba_obs=8,
        ba_iters1=0 if no_ba else 8, ba_iters2=0 if no_ba else 12,
        tri_neighbors=4, max_new_points=512,
        enable_loop_closing=False, **kw)
    tr = tracking.Tracker(cam, cfg)

    i = 0
    while tr.state != tracking.OK and i < 16:
        img = jnp.asarray(seq.frame(i))
        feats = frame_mod.undistort(cam, ex(img))
        tr.process_frame(feats, i, i / 30.0)
        i += 1

    ft = fused.FusedTracker(cam, cfg, extractor=ex)
    state = ft.state_from(tr)

    staged = []
    for c in range(N_CHUNKS):
        imgs = np.stack(
            [seq.frame(i + c * CHUNK + k) for k in range(CHUNK)]
        ).astype(np.uint8)
        ts = (i + c * CHUNK + np.arange(CHUNK)) / 30.0
        staged.append((jax.device_put(imgs), ts))
    jax.block_until_ready([s[0] for s in staged])

    total_kf = 0
    for ci, (imgs, ts) in enumerate(staged):
        t0 = time.perf_counter()
        state, info = ft.run_images(state, imgs, ts)
        info = jax.device_get(info)
        dt = time.perf_counter() - t0
        nk = int(np.asarray(info["new_kf"]).sum())
        total_kf += nk
        n_in = np.asarray(info["n_inliers"])
        print(f"chunk {ci}: {dt*1e3:7.1f} ms  new_kf={nk:2d}  "
              f"inliers min/med/max = {n_in.min()}/"
              f"{int(np.median(n_in))}/{n_in.max()}  "
              f"tracked={int(np.asarray(info['tracked']).sum())}/"
              f"{CHUNK}")
        if "c2" in info:
            for k in range(CHUNK):
                print(f"  f{k:02d} kf={int(info['new_kf'][k])} "
                      f"c1a={int(info['c1a'][k])} c2={int(info['c2'][k])} "
                      f"geo_t={int(info['geo_t'][k])} "
                      f"geo_r={int(info['geo_r'][k])} "
                      f"n_mm={int(info['n_mm'][k])} "
                      f"mm_ok={int(info['mm_ok'][k])} "
                      f"n_mrg={int(info['n_merged'][k])} "
                      f"n_in={int(n_in[k])} "
                      f"ref_trk={int(info['ref_tracked'][k])} "
                      f"base={float(info['base'][k]):.4f} "
                      f"med={float(info['med'][k]):.3f} "
                      f"ang={float(info['ang'][k]):.2f}")
    n_kf = int(np.asarray(state.store.kf_valid).sum())
    n_pt = int(np.asarray(state.store.pt_valid).sum())
    print(f"total new_kf={total_kf} over {CHUNK*N_CHUNKS} frames "
          f"(rate 1/{CHUNK*N_CHUNKS/max(total_kf,1):.1f}); "
          f"arena: {n_kf} KFs, {n_pt} pts")


if __name__ == "__main__":
    main()
