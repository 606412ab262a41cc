"""Viewer — the reference's GL viewer loop as a headless artifact writer.

Reference: src/Viewer.cc:56-140 runs a Pangolin window at ~30 Hz with
camera-follow and show-points/graph toggles plus a cv::imshow of the
FrameDrawer output. A TPU deployment is headless, so the equivalent is an
artifact stream: every N-th tracked frame, write the frame overlay and
the map render to an output directory (and optionally assemble a GIF at
shutdown). Attach via System(use_viewer=True) or drive manually.
"""

from __future__ import annotations

import os

import numpy as np

from .frame_drawer import FrameDrawer
from .map_drawer import MapDrawer


class Viewer:
    def __init__(self, out_dir: str = "viewer_out", every: int = 10,
                 draw_map: bool = True):
        self.out_dir = out_dir
        self.every = max(1, every)
        self.draw_map = draw_map
        self.frame_drawer = FrameDrawer()
        self.map_drawer = MapDrawer()
        self._n = 0
        os.makedirs(out_dir, exist_ok=True)

    def update(self, image, feats=None, tracked_mask=None, detections=None,
               store=None, Tcw=None, state: int = 1):
        """Record one frame (rate-limited by `every`)."""
        self._n += 1
        if (self._n - 1) % self.every:
            return
        from PIL import Image

        i = self._n - 1
        n_kfs = int(np.asarray(store.kf_valid).sum()) if store is not None \
            else 0
        n_pts = int(np.asarray(store.pt_valid).sum()) if store is not None \
            else 0
        overlay = self.frame_drawer.draw(
            image, feats, tracked_mask, detections, state, n_kfs, n_pts)
        Image.fromarray(overlay).save(
            os.path.join(self.out_dir, f"frame_{i:06d}.png"))
        if self.draw_map and store is not None:
            self.map_drawer.save(
                store, os.path.join(self.out_dir, f"map_{i:06d}.png"),
                Tcw=Tcw)

    def finish(self, gif_name: str = "sequence.gif", duration_ms: int = 200):
        """Assemble recorded overlays into a GIF (the headless analogue of
        the demo's MJPG video writer, mono_robotcar.cc:102-116)."""
        from PIL import Image

        frames = sorted(
            f for f in os.listdir(self.out_dir) if f.startswith("frame_"))
        if not frames:
            return None
        imgs = [Image.open(os.path.join(self.out_dir, f)) for f in frames]
        path = os.path.join(self.out_dir, gif_name)
        imgs[0].save(path, save_all=True, append_images=imgs[1:],
                     duration=duration_ms, loop=0)
        return path
