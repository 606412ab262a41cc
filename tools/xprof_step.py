"""Device trace of ONE fused tracking step; prints the per-op aggregate.

Complements profile_step.py (two-length wall-clock per stage): one
compile, exact on-device op times from the raw xplane.pb.

Usage: python tools/xprof_step.py [--cpu] [--kf]
  --kf  force the keyframe-insertion branch (need_kf taken)
"""

import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from myslam_tpu.features.extractor import ORBExtractor
from myslam_tpu.features import frame as frame_mod
from myslam_tpu.geom.projection import Camera
from myslam_tpu.io import synthetic
from myslam_tpu.slam import fused, tracking


def main():
    seq = synthetic.ImageSequence(width=640, height=480,
                                  n_frames=64, step_px=2.0)
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
    for k in range(24):
        img = jnp.asarray(seq.frame(i + k))
        feats = frame_mod.undistort(cam, ex(img))
        state, _ = ft.step(state, feats, (i + k) / 30.0)
    jax.block_until_ready(state.Tcw)

    img = jnp.asarray(seq.frame(i + 30), dtype=jnp.uint8)

    def one(st):
        return ft.run_images(st, img[None], jnp.zeros(1))

    out = one(state)
    jax.block_until_ready(out[0].Tcw)

    trace_dir = "/tmp/xprof_step"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        jax.block_until_ready(one(state)[0].Tcw)

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        print(f"== plane: {plane.name}")
        ev_meta = plane.event_metadata
        agg = defaultdict(lambda: [0.0, 0])
        for line in plane.lines:
            if "Ops" not in line.name and "Steps" not in line.name:
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                agg[name][0] += ev.duration_ps / 1e6
                agg[name][1] += 1
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
        total = sum(v[0] for v in agg.values())
        print(f"   sum-of-ops {total/1e3:.3f} ms, {len(rows)} distinct")
        for name, (dur, cnt) in rows[:45]:
            print(f"   {dur/1e3:9.3f} ms  x{cnt:5d}  {name[:95]}")


if __name__ == "__main__":
    main()
