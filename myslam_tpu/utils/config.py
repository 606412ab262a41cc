"""Config loading: the reference's cv::FileStorage YAML surface.

Parses the same keys as the reference settings files
(Examples/Monocular/slam_cfg/config.yaml:8-57, read in
Tracking::Tracking, src/Tracking.cc:57-151): Camera.fx/fy/cx/cy,
Camera.k1/k2/p1/p2/k3, Camera.fps, Camera.RGB, ORBextractor.nFeatures/
scaleFactor/nLevels/iniThFAST/minThFAST, Viewer.* (accepted, unused in
headless mode). OpenCV-style YAML ("%YAML:1.0" header) is handled.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class Settings:
    fx: float = 450.0
    fy: float = 450.0
    cx: float = 320.0
    cy: float = 240.0
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    fps: float = 30.0
    rgb: int = 1
    width: int = 640
    height: int = 480
    n_features: int = 2000
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: int = 20
    min_th_fast: int = 7
    # stereo / RGB-D (reference Tracking.cc:136-151: mbf, mThDepth,
    # mDepthMapFactor)
    bf: float = 0.0
    th_depth: float = 35.0          # in baseline units (Camera.bf/fx * this)
    depth_map_factor: float = 1.0
    # pretrained DBoW2 vocabulary text file (the reference loads one at
    # startup, src/System.cc:62-76); empty = train from the data seen
    vocab_path: str = ""
    extras: dict = field(default_factory=dict)
    # opencv-matrix nodes (LEFT.K / LEFT.D / LEFT.R / LEFT.P / RIGHT.*
    # — the stereo-rectification calibration the reference's
    # stereo_euroc.cc reads with cv::FileStorage), name -> nested list
    matrices: dict = field(default_factory=dict)


_KEY_MAP = {
    "Camera.fx": "fx", "Camera.fy": "fy", "Camera.cx": "cx",
    "Camera.cy": "cy", "Camera.k1": "k1", "Camera.k2": "k2",
    "Camera.p1": "p1", "Camera.p2": "p2", "Camera.k3": "k3",
    "Camera.fps": "fps", "Camera.RGB": "rgb",
    "Camera.width": "width", "Camera.height": "height",
    "ORBextractor.nFeatures": "n_features",
    "ORBextractor.scaleFactor": "scale_factor",
    "ORBextractor.nLevels": "n_levels",
    "ORBextractor.iniThFAST": "ini_th_fast",
    "ORBextractor.minThFAST": "min_th_fast",
    "Camera.bf": "bf",
    "ThDepth": "th_depth",
    "DepthMapFactor": "depth_map_factor",
}

_INT_KEYS = {"rgb", "width", "height", "n_features", "n_levels",
             "ini_th_fast", "min_th_fast"}

# string-valued keys (everything else parses as float or lands in extras)
_STR_KEYS = {"Vocabulary.path": "vocab_path", "Vocabulary.file": "vocab_path"}


def _parse_matrices(text: str):
    """Extract `NAME: !!opencv-matrix\\n rows:.. cols:.. data:[..]` nodes
    (the format cv::FileStorage writes and the reference's stereo
    examples read for LEFT/RIGHT rectification calibration).

    Returns (matrices, spans): spans are the exact (start, end) character
    ranges of the matched nodes, so the flat key-value pass can blank them
    out instead of guessing how many lines a node body occupies (bodies
    vary: dt is optional, data arrays wrap across lines)."""
    out = {}
    spans = []
    pat = re.compile(
        r"^([\w.]+)\s*:\s*!!opencv-matrix\s*\n"
        r"(?:\s+\w+:.*\n)*?"
        r"\s+rows\s*:\s*(\d+)\s*\n"
        r"\s+cols\s*:\s*(\d+)\s*\n"
        r"(?:\s+dt\s*:.*\n)?"
        r"\s+data\s*:\s*\[([^\]]*)\]", re.MULTILINE)
    for m in pat.finditer(text):
        name, rows, cols = m.group(1), int(m.group(2)), int(m.group(3))
        vals = [float(v) for v in
                m.group(4).replace("\n", " ").split(",") if v.strip()]
        out[name] = [vals[r * cols:(r + 1) * cols] for r in range(rows)]
        spans.append(m.span())
    return out, spans


def load_settings(path: str) -> Settings:
    """Parse an OpenCV-YAML settings file (flat `key: value` pairs plus
    opencv-matrix nodes)."""
    s = Settings()
    with open(path) as f:
        text = f.read()
    s.matrices, spans = _parse_matrices(text)
    # blank the matrix-node spans (preserving newlines) so the flat pass
    # below cannot mis-consume the line after a node body
    chars = list(text)
    for a, b in spans:
        for i in range(a, b):
            if chars[i] != "\n":
                chars[i] = " "
    text = "".join(chars)
    for line in text.splitlines():
            line = line.split("#")[0].strip()
            m = re.match(r"^([\w.]+)\s*:\s*(.+)$", line)
            if not m:
                continue
            key, raw = m.group(1), m.group(2).strip().strip('"')
            if key.startswith("%"):
                continue
            if key in _STR_KEYS:
                setattr(s, _STR_KEYS[key], raw)
                continue
            try:
                val = float(raw)
            except ValueError:
                s.extras[key] = raw
                continue
            attr = _KEY_MAP.get(key)
            if attr is None:
                s.extras[key] = val
            elif attr in _INT_KEYS:
                setattr(s, attr, int(val))
            else:
                setattr(s, attr, val)
    return s
