"""Monocular SLAM on a KITTI odometry sequence.

Equivalent of the reference driver Examples/Monocular/mono_kitti.cc:
  python examples/mono_kitti.py <settings.yaml> <sequence_dir>
"""

import argparse

from _runner import add_common_args, apply_platform, report, run_loop


def main():
    ap = argparse.ArgumentParser()
    add_common_args(ap)
    ap.add_argument("sequence",
                    help="KITTI sequence dir (times.txt + image_0/)")
    args = ap.parse_args()
    apply_platform(args)

    from myslam_tpu.io import datasets
    from myslam_tpu.slam import system as system_mod

    items = datasets.load_kitti(args.sequence)
    print(f"{len(items)} images in the sequence")
    slam = system_mod.System(settings=args.settings,
                             sensor=system_mod.MONOCULAR)

    def track_one(slam, item):
        t, path = item
        return slam.track_monocular(datasets.read_image(path), t)

    times, n = run_loop(slam, items, track_one, args.realtime,
                        args.max_frames)
    report(slam, times, n, args)
    slam.shutdown()


if __name__ == "__main__":
    main()
