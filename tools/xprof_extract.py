"""Device trace of ONE vmapped batch-16 extraction; per-op aggregate.

Usage: python tools/xprof_extract.py [--cpu]
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
import numpy as np

from myslam_tpu.features.extractor import ORBExtractor
from myslam_tpu.geom import projection
from myslam_tpu.geom.projection import Camera
from myslam_tpu.io import synthetic


def main():
    B = 16
    seq = synthetic.ImageSequence(width=640, height=480, n_frames=B + 1,
                                  step_px=2.0)
    cam = Camera.create(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                        width=640, height=480)
    ex = ORBExtractor(480, 640, n_features=2000)
    imgs = jnp.asarray(
        np.stack([seq.frame(k) for k in range(B)]).astype(np.uint8))
    extract = ex._build()

    def extract_one(img):
        img = img.astype(jnp.float32)
        feats = extract(img)
        und = projection.undistort_points(cam, feats.xy_raw)
        return feats.replace(xy=jnp.where(feats.valid[:, None], und, 0.0))

    vex = jax.jit(lambda im: jax.vmap(extract_one)(im))
    out = vex(imgs)
    jax.block_until_ready(out.xy)

    trace_dir = "/tmp/xprof_extract"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        jax.block_until_ready(vex(imgs).xy)

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
        for name, (dur, cnt) in rows[:40]:
            print(f"   {dur/1e3:9.3f} ms  x{cnt:5d}  {name[:110]}")


if __name__ == "__main__":
    main()
