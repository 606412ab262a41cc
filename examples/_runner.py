"""Shared example-driver loop: the structure of the reference mains
(Examples/Monocular/mono_tum.cc:54-124 and siblings): build the System,
feed frames with optional real-time pacing, print median/mean tracking
time, save trajectories."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def add_common_args(ap):
    ap.add_argument("settings", help="OpenCV-YAML settings file "
                    "(slam_cfg/config.yaml format)")
    ap.add_argument("--out", default="KeyFrameTrajectory.txt",
                    help="keyframe trajectory output (TUM format)")
    ap.add_argument("--full-out", default="",
                    help="optional per-frame trajectory output")
    ap.add_argument("--kitti-out", default="",
                    help="optional per-frame trajectory in KITTI format")
    ap.add_argument("--realtime", action="store_true",
                    help="pace frames to dataset timestamps "
                    "(mono_tum.cc:98-106)")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--platform", default="",
                    help="force a JAX platform (cpu / tpu)")


def apply_platform(args):
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)


def run_loop(slam, items, track_one, realtime=False, max_frames=0):
    """items: [(timestamp, ...payload)]; track_one(slam, item) -> Tcw."""
    times = []
    n_tracked = 0
    if max_frames:
        items = items[:max_frames]
    for i, item in enumerate(items):
        t0 = time.perf_counter()
        Tcw = track_one(slam, item)
        dt = time.perf_counter() - t0
        times.append(dt)
        n_tracked += Tcw is not None
        if realtime and i + 1 < len(items):
            wait = items[i + 1][0] - item[0] - dt
            if wait > 0:
                time.sleep(wait)
    return times, n_tracked


def report(slam, times, n_tracked, args):
    st = sorted(times)
    print("-------")
    print(f"tracked {n_tracked}/{len(times)} frames")
    if st:
        print(f"median tracking time: {st[len(st) // 2]:.4f}s")
        print(f"mean tracking time:   {sum(st) / len(st):.4f}s")
    slam.save_keyframe_trajectory_tum(args.out)
    print(f"keyframe trajectory saved to {args.out}")
    if args.full_out:
        slam.save_trajectory_tum(args.full_out)
    if args.kitti_out:
        slam.save_trajectory_kitti(args.kitti_out)
