"""Dataset loaders for the reference's evaluation formats.

Re-implements the loaders of the example mains: TUM `rgb.txt` association
lists (mono_tum.cc:129-156), KITTI odometry `times.txt` + image_0
(mono_kitti.cc:127-157), EuRoC cam0 + separate timestamp file
(mono_euroc.cc:34-48), and the fork's RobotCar list + time.txt pairing
(mono_robotcar.cc commented loader + slam_cfg/time.txt).

Images load as float32 [H, W] grayscale in [0, 255] via PIL if available;
a PGM/PPM fallback parser keeps the loaders dependency-free.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np


def _load_gray(path: str) -> np.ndarray:
    try:
        from PIL import Image
        img = Image.open(path).convert("L")
        return np.asarray(img, dtype=np.float32)
    except ImportError:
        return _load_pnm_gray(path)


def _load_pnm_gray(path: str) -> np.ndarray:
    """Minimal PGM (P2/P5) / PPM (P6) reader."""
    with open(path, "rb") as f:
        data = f.read()
    toks = []
    i = 0
    while len(toks) < 4 and i < len(data):
        # skip whitespace/comments
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        toks.append(data[i:j])
        i = j
    magic = toks[0].decode()
    w, h = int(toks[1]), int(toks[2])
    i += 1  # single whitespace after maxval
    if magic == "P5":
        img = np.frombuffer(data[i : i + w * h], np.uint8).reshape(h, w)
        return img.astype(np.float32)
    if magic == "P6":
        rgb = np.frombuffer(data[i : i + 3 * w * h], np.uint8).reshape(h, w, 3)
        return (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
                + 0.114 * rgb[..., 2]).astype(np.float32)
    if magic == "P2":
        vals = np.array(data[i:].split(), np.float32)[: w * h]
        return vals.reshape(h, w)
    raise ValueError(f"unsupported image format {magic} in {path}")


def load_tum(sequence_dir: str) -> List[Tuple[float, str]]:
    """TUM RGB-D association: parse `rgb.txt` lines `timestamp path`
    (LoadImages in mono_tum.cc:129-156). Returns [(t, abs_path)]."""
    out = []
    with open(os.path.join(sequence_dir, "rgb.txt")) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            t, rel = line.split()[:2]
            out.append((float(t), os.path.join(sequence_dir, rel)))
    return out


def load_kitti(sequence_dir: str) -> List[Tuple[float, str]]:
    """KITTI odometry grayscale: times.txt + image_0/%06d.png
    (LoadImages in mono_kitti.cc:127-157)."""
    with open(os.path.join(sequence_dir, "times.txt")) as f:
        times = [float(x) for x in f.read().split()]
    img_dir = os.path.join(sequence_dir, "image_0")
    return [(t, os.path.join(img_dir, f"{i:06d}.png"))
            for i, t in enumerate(times)]


def load_euroc(cam_dir: str, times_file: str) -> List[Tuple[float, str]]:
    """EuRoC: timestamp file with ns stamps, images at data/<stamp>.png
    (LoadImages in mono_euroc.cc:34-48)."""
    out = []
    with open(times_file) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            stamp = line.split(",")[0].split()[0]
            out.append((int(stamp) * 1e-9,
                        os.path.join(cam_dir, "data", stamp + ".png")))
    return out


def load_euroc_stereo(cam0_dir: str, cam1_dir: str,
                      times_file: str) -> List[Tuple[float, str, str]]:
    """EuRoC stereo: ns-stamp times file, left at cam0/data/<stamp>.png,
    right at cam1/data/<stamp>.png (the stereo_euroc driver the
    reference's CMake declares at CMakeLists.txt:110-116 but whose
    source was deleted from the fork; pairing per upstream
    stereo_euroc.cc LoadImages)."""
    out = []
    with open(times_file) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            stamp = line.split(",")[0].split()[0]
            out.append((int(stamp) * 1e-9,
                        os.path.join(cam0_dir, "data", stamp + ".png"),
                        os.path.join(cam1_dir, "data", stamp + ".png")))
    return out


def load_image_list(list_file: str, times_file: str = None,
                    root: str = "") -> List[Tuple[float, str]]:
    """Plain image list + optional separate timestamp file (the fork's
    RobotCar pairing: 00imagefile.txt-style list with slam_cfg/time.txt,
    mono_robotcar.cc:63-76)."""
    with open(list_file) as f:
        paths = [line.strip() for line in f if line.strip()]
    if times_file:
        with open(times_file) as f:
            times = [float(x) for x in f.read().split()]
    else:
        times = [i / 30.0 for i in range(len(paths))]
    return [(t, os.path.join(root, p)) for t, p in zip(times, paths)]


def load_kitti_stereo(sequence_dir: str) -> List[Tuple[float, str, str]]:
    """KITTI odometry stereo: times.txt + image_0 (left) / image_1 (right)
    pairs (the stereo_kitti driver the fork's CMake declares at
    CMakeLists.txt:99-103 but whose source was deleted; loader per
    upstream stereo_kitti.cc)."""
    with open(os.path.join(sequence_dir, "times.txt")) as f:
        times = [float(x) for x in f.read().split()]
    d0 = os.path.join(sequence_dir, "image_0")
    d1 = os.path.join(sequence_dir, "image_1")
    return [(t, os.path.join(d0, f"{i:06d}.png"),
             os.path.join(d1, f"{i:06d}.png"))
            for i, t in enumerate(times)]


def load_tum_rgbd(sequence_dir: str, association_file: str = None,
                  max_dt: float = 0.02) -> List[Tuple[float, str, str]]:
    """TUM RGB-D rgb+depth pairs.

    With an association file (the format upstream rgbd_tum.cc expects:
    `t_rgb rgb/... t_depth depth/...` per line), parse it directly;
    otherwise associate rgb.txt and depth.txt by nearest timestamp within
    max_dt (what TUM's associate.py does offline).
    Returns [(t, rgb_path, depth_path)].
    """
    if association_file:
        out = []
        with open(association_file) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                v = line.split()
                out.append((float(v[0]),
                            os.path.join(sequence_dir, v[1]),
                            os.path.join(sequence_dir, v[3])))
        return out
    rgb = load_tum(sequence_dir)
    depth = []
    with open(os.path.join(sequence_dir, "depth.txt")) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            t, rel = line.split()[:2]
            depth.append((float(t), os.path.join(sequence_dir, rel)))
    d_times = np.array([t for t, _ in depth])
    out = []
    for t, rgb_path in rgb:
        j = int(np.argmin(np.abs(d_times - t)))
        if abs(d_times[j] - t) <= max_dt:
            out.append((t, rgb_path, depth[j][1]))
    return out


def read_depth(path: str, factor: float = 1.0) -> np.ndarray:
    """[H, W] float32 depth from a 16-bit PNG. factor divides raw units
    into meters (TUM stores depth*5000); leave at 1.0 when the System
    applies Settings.depth_map_factor itself (src/Tracking.cc:146-151)."""
    try:
        from PIL import Image
        raw = np.asarray(Image.open(path), dtype=np.float32)
    except ImportError:
        raw = _load_pnm_gray(path)
    return raw / factor


def load_ground_truth_tum(path: str) -> dict:
    """TUM groundtruth.txt -> {timestamp: [tx, ty, tz]} camera centers."""
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = line.split()
            out[float(vals[0])] = np.array(
                [float(v) for v in vals[1:4]], np.float32)
    return out


def read_image(path: str) -> np.ndarray:
    """[H, W] float32 grayscale in [0, 255]."""
    return _load_gray(path)
