"""Stereo SLAM on a EuRoC MAV sequence, with rectification.

The reference's CMake declares a stereo_euroc target whose source was
deleted from the fork (reference CMakeLists.txt:110-116); this restores
the driver against the library's fully-implemented stereo path. The
settings file must carry the LEFT.*/RIGHT.* opencv-matrix rectification
nodes (K, D, R, P — the calibration surface upstream stereo_euroc.cc
feeds to cv::initUndistortRectifyMap) plus Camera.bf for the rectified
pair:
  python examples/stereo_euroc.py <settings.yaml> <cam0_dir> <cam1_dir> \
      <times_file>
"""

import argparse

from _runner import add_common_args, apply_platform, report, run_loop


def main():
    ap = argparse.ArgumentParser()
    add_common_args(ap)
    ap.add_argument("cam0_dir", help="EuRoC mav0/cam0 directory (left)")
    ap.add_argument("cam1_dir", help="EuRoC mav0/cam1 directory (right)")
    ap.add_argument("times_file", help="timestamp file (ns per line)")
    args = ap.parse_args()
    apply_platform(args)

    from myslam_tpu.io import datasets, rectify
    from myslam_tpu.slam import system as system_mod
    from myslam_tpu.utils import config

    items = datasets.load_euroc_stereo(args.cam0_dir, args.cam1_dir,
                                       args.times_file)
    print(f"{len(items)} stereo pairs in the sequence")
    settings = config.load_settings(args.settings)
    rectifier = (rectify.StereoRectifier(settings)
                 if "LEFT.K" in settings.matrices else None)
    if rectifier is None:
        print("no LEFT.*/RIGHT.* rectification nodes — assuming "
              "pre-rectified input")
    slam = system_mod.System(settings=args.settings,
                             sensor=system_mod.STEREO)

    def track_one(slam, item):
        t, left, right = item
        l_img = datasets.read_image(left)
        r_img = datasets.read_image(right)
        if rectifier is not None:
            l_img, r_img = rectifier(l_img, r_img)
        return slam.track_stereo(l_img, r_img, t)

    times, n = run_loop(slam, items, track_one, args.realtime,
                        args.max_frames)
    report(slam, times, n, args)
    slam.shutdown()


if __name__ == "__main__":
    main()
