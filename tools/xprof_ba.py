"""Capture a device trace of the local-BA LM loop and print per-op times.

The image's xprof conversion tooling is broken (protobuf mismatch), so
this parses the raw xplane.pb with tensorflow's bundled protobuf instead.

Usage: python tools/xprof_ba.py [--cpu] [--what lm|refine|ba]
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

from micro_ba import make_problem
from myslam_tpu.optim import ba as ba_mod

WHAT = "lm"
for i, a in enumerate(sys.argv):
    if a == "--what":
        WHAT = sys.argv[i + 1]


def main():
    cam, prob = make_problem()
    O = 8

    if WHAT == "lm":
        fn = jax.jit(lambda p: ba_mod.run_lm(cam, p, 20, o_group=O))
    elif WHAT == "refine":
        fn = jax.jit(
            lambda p: ba_mod.refine_points_only(cam, p, 4, o_group=O))
    else:
        fn = jax.jit(lambda p: ba_mod.bundle_adjust(cam, p, 8, 12,
                                                    o_group=O)[0])

    out = fn(prob)
    jax.block_until_ready(out)

    trace_dir = "/tmp/xprof_ba"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        jax.block_until_ready(fn(prob))

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
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
        total = 0.0
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Steps" not in line.name \
                    and "Ops" not in line.name:
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                dur = ev.duration_ps / 1e6  # ps -> us
                agg[name][0] += dur
                agg[name][1] += 1
                total += dur
        if not agg:
            # fall back: dump all line names so we can see the structure
            print("   lines:", [l.name for l in plane.lines])
            continue
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
        print(f"   total {total/1e3:.3f} ms over {len(rows)} distinct ops")
        for name, (dur, cnt) in rows[:40]:
            print(f"   {dur/1e3:9.3f} ms  x{cnt:5d}  {name[:90]}")


if __name__ == "__main__":
    main()
