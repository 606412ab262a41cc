"""YOLOv2 detection demo over an image list — and, optionally, the
semantic-SLAM loop the reference left commented out.

Equivalent of the reference driver Examples/Monocular/mono_robotcar.cc:
its ACTIVE main (mono_robotcar.cc:43-125) only runs Yolo::detect over an
image list and writes an annotated video; the full SLAM main is commented
out (mono_robotcar.cc:128-260). This driver does both:

  # detection-only (the reference's active behavior):
  python examples/mono_robotcar.py <image_list> --times time.txt \
      --weights yolo.weights --out-dir robotcar_out

  # detection fused into monocular SLAM (--slam, the extension the
  # BASELINE asks for — dynamic-class map-point gating):
  python examples/mono_robotcar.py <image_list> --times time.txt \
      --weights yolo.weights --slam --settings config.yaml
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CLASS_NAMES = ["bicycle", "bus", "car", "dog", "motorbike", "person"]
# (reference Examples/Monocular/darknet_cfg/coco.names — 6 classes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("image_list", help="text file with one image path per "
                    "line (00imagefile.txt style)")
    ap.add_argument("--times", default="", help="timestamp file "
                    "(slam_cfg/time.txt style)")
    ap.add_argument("--root", default="", help="prefix for image paths")
    ap.add_argument("--weights", default="", help="darknet .weights file "
                    "(random init if omitted)")
    ap.add_argument("--thresh", type=float, default=0.40)
    ap.add_argument("--out-dir", default="robotcar_out")
    ap.add_argument("--slam", action="store_true",
                    help="run full semantic SLAM instead of detect-only")
    ap.add_argument("--settings", default="", help="SLAM settings yaml "
                    "(required with --slam)")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--platform", default="")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    from PIL import Image

    from myslam_tpu.io import datasets
    from myslam_tpu.models import yolo as yolo_mod
    from myslam_tpu.viz import FrameDrawer

    items = datasets.load_image_list(
        args.image_list, args.times or None, args.root)
    if args.max_frames:
        items = items[: args.max_frames]
    print(f"{len(items)} images")

    if args.weights:
        params = yolo_mod.load_darknet_weights(args.weights)
    else:
        import jax
        params = yolo_mod.init_params(jax.random.PRNGKey(0))
        print("WARNING: random YOLO weights (no --weights given)")
    det = yolo_mod.Yolo(params, thresh=args.thresh,
                        class_names=CLASS_NAMES)

    os.makedirs(args.out_dir, exist_ok=True)
    drawer = FrameDrawer()

    slam = None
    if args.slam:
        from myslam_tpu.slam import system as system_mod
        slam = system_mod.System(settings=args.settings,
                                 sensor=system_mod.MONOCULAR, detector=det)

    det_times = []
    for i, (t, path) in enumerate(items):
        gray = datasets.read_image(path)
        rgb = np.stack([gray] * 3, -1)
        t0 = time.perf_counter()
        detections = det.detect(rgb / 255.0)
        det_times.append(time.perf_counter() - t0)
        if slam is not None:
            slam.track_monocular(gray, t, detections=detections)
        overlay = drawer.draw(gray, detections=detections,
                              class_names=CLASS_NAMES,
                              state=1 if slam is None
                              else slam.tracker.state)
        Image.fromarray(overlay).save(
            os.path.join(args.out_dir, f"{i:06d}.png"))
        print(f"[{i}] {len(detections)} detections "
              f"({det_times[-1] * 1e3:.1f} ms)")

    st = sorted(det_times)
    print(f"median detect time: {st[len(st) // 2] * 1e3:.1f} ms")
    if slam is not None:
        slam.save_keyframe_trajectory_tum(
            os.path.join(args.out_dir, "KeyFrameTrajectory.txt"))
        slam.shutdown()


if __name__ == "__main__":
    main()
