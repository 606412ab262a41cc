"""RGB-D SLAM on a TUM RGB-D sequence.

The fork's CMake declares an rgbd_tum target whose source was deleted
(reference CMakeLists.txt:88-92); this restores the driver against the
library's fully-implemented RGB-D path:
  python examples/rgbd_tum.py <settings.yaml> <sequence_dir> \
      [--association assoc.txt]
The settings file must define Camera.bf, ThDepth and DepthMapFactor.
"""

import argparse

from _runner import add_common_args, apply_platform, report, run_loop


def main():
    ap = argparse.ArgumentParser()
    add_common_args(ap)
    ap.add_argument("sequence", help="TUM sequence dir (rgb.txt+depth.txt)")
    ap.add_argument("--association", default="",
                    help="precomputed association file "
                    "(upstream rgbd_tum.cc format)")
    args = ap.parse_args()
    apply_platform(args)

    from myslam_tpu.io import datasets
    from myslam_tpu.slam import system as system_mod

    items = datasets.load_tum_rgbd(args.sequence,
                                   args.association or None)
    print(f"{len(items)} rgb-depth pairs in the sequence")
    slam = system_mod.System(settings=args.settings, sensor=system_mod.RGBD)

    def track_one(slam, item):
        t, rgb, depth = item
        return slam.track_rgbd(datasets.read_image(rgb),
                               datasets.read_depth(depth), t)

    times, n = run_loop(slam, items, track_one, args.realtime,
                        args.max_frames)
    report(slam, times, n, args)
    slam.shutdown()


if __name__ == "__main__":
    main()
