"""Decompose the REAL bench chunk time on-device: staged uint8 images ->
vmapped extraction vs scan-of-steps vs full image-chunk, with keyframe
insertion on and off. Finds where the 19.7 ms/frame of the headline bench
goes when the profiled base step is only ~4.6 ms.

Usage: python tools/chunk_breakdown.py [--cpu]
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
from myslam_tpu.geom import projection
from myslam_tpu.io import synthetic
from myslam_tpu.slam import fused, tracking

CHUNK = 16


def clock(name, fn, reps=4):
    fn()  # compile/warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best*1e3:8.1f} ms   ({best*1e3/CHUNK:6.2f} ms/frame)")
    return best


def main():
    n_frames = CHUNK * 3 + 16
    seq = synthetic.ImageSequence(width=640, height=480,
                                  n_frames=n_frames + 2, step_px=2.0)
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
    state = ft.state_from(tr)

    imgs = np.stack([seq.frame(i + k) for k in range(CHUNK)]).astype(np.uint8)
    ts = (i + np.arange(CHUNK)) / 30.0
    imgs_d = jax.device_put(imgs)
    jax.block_until_ready(imgs_d)

    # --- extraction alone, vmapped over the chunk ---
    extract = ex._build()

    def extract_one(img):
        img = img.astype(jnp.float32)
        feats = extract(img)
        und = projection.undistort_points(cam, feats.xy_raw)
        return feats.replace(xy=jnp.where(feats.valid[:, None], und, 0.0))

    vex = jax.jit(lambda im: jax.vmap(extract_one)(im))
    clock("vmapped extraction [16,480,640]",
          lambda: jax.block_until_ready(vex(imgs_d)))

    feats_chunk = vex(imgs_d)
    jax.block_until_ready(feats_chunk.xy)

    # --- scan of steps alone (pre-extracted feats) ---
    def run_scan():
        st, info = ft.run_chunk(state, feats_chunk, ts)
        jax.block_until_ready(st.Tcw)
        return info

    info = clock("scan of 16 fused steps (feats given)", run_scan)
    st, info = ft.run_chunk(state, feats_chunk, ts)
    print("   new_kf per chunk:", int(np.asarray(info["new_kf"]).sum()),
          " tracked:", int(np.asarray(info["tracked"]).sum()))

    # --- same but keyframe insertion gated off via frozen=True ---
    state_froz = state.replace(frozen=jnp.asarray(True))

    def run_scan_nokf():
        st, _ = ft.run_chunk(state_froz, feats_chunk, ts)
        jax.block_until_ready(st.Tcw)

    clock("scan of 16 fused steps (frozen, no KF)", run_scan_nokf)

    # --- full image chunk (the bench path) ---
    def run_img():
        st, _ = ft.run_images(state, imgs_d, ts)
        jax.block_until_ready(st.Tcw)

    clock("run_images full chunk (bench path)", run_img)

    def run_img_froz():
        st, _ = ft.run_images(state_froz, imgs_d, ts)
        jax.block_until_ready(st.Tcw)

    clock("run_images full chunk (frozen)", run_img_froz)

    # --- link-only floor ---
    tiny = jax.jit(lambda x: x + 1)

    def ping():
        jax.block_until_ready(tiny(jnp.float32(1.0)))

    clock("dispatch/link floor (tiny op)", ping)


if __name__ == "__main__":
    main()
