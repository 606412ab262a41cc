"""Stereo SLAM on a KITTI odometry sequence.

The fork's CMake declares a stereo_kitti target whose source was deleted
(reference CMakeLists.txt:99-103); this restores the driver against the
library's fully-implemented stereo path:
  python examples/stereo_kitti.py <settings.yaml> <sequence_dir>
The settings file must define Camera.bf and ThDepth (stereo calibration).
"""

import argparse

from _runner import add_common_args, apply_platform, report, run_loop


def main():
    ap = argparse.ArgumentParser()
    add_common_args(ap)
    ap.add_argument("sequence",
                    help="KITTI sequence dir (times.txt + image_0/1)")
    args = ap.parse_args()
    apply_platform(args)

    from myslam_tpu.io import datasets
    from myslam_tpu.slam import system as system_mod

    items = datasets.load_kitti_stereo(args.sequence)
    print(f"{len(items)} stereo pairs in the sequence")
    slam = system_mod.System(settings=args.settings,
                             sensor=system_mod.STEREO)

    def track_one(slam, item):
        t, left, right = item
        return slam.track_stereo(datasets.read_image(left),
                                 datasets.read_image(right), t)

    times, n = run_loop(slam, items, track_one, args.realtime,
                        args.max_frames)
    report(slam, times, n, args)
    slam.shutdown()


if __name__ == "__main__":
    main()
