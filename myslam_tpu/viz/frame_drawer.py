"""2D frame overlay drawing — FrameDrawer equivalent.

Reference: src/FrameDrawer.cc:38-203 draws tracked keypoints (green
squares + dots), initialization match lines, YOLO detection boxes, and a
status bar with state text and live counters onto the current image. This
renders the same overlay into a numpy RGB array via PIL.
"""

from __future__ import annotations

import numpy as np

GREEN = (40, 220, 40)
BLUE = (80, 120, 255)
RED = (230, 60, 60)
YELLOW = (240, 220, 60)

STATE_TEXT = {0: "TRYING TO INITIALIZE", 1: "SLAM MODE", 2: "LOST"}


class FrameDrawer:
    """Stateless renderer: call draw(...) with the data to overlay."""

    def draw(self, image, feats=None, tracked_mask=None, detections=None,
             state: int = 1, n_kfs: int = 0, n_points: int = 0,
             class_names=None):
        """Render the tracking overlay.

        Args:
          image: [H, W] gray or [H, W, 3] RGB, float [0,255] or uint8.
          feats: FrameFeatures (raw coords are drawn, like the reference
            draws mvCurrentKeys — FrameDrawer.cc:77-123).
          tracked_mask: [N] bool — features with a map-point association
            (green); others drawn dim.
          detections: iterable of dicts with 'box' (x, y, w, h) in pixels,
            'class_id', optional 'score' — the models.yolo.Yolo.detect
            surface; overlay like the demo main (mono_robotcar.cc:88-101).
          state/n_kfs/n_points: status bar (FrameDrawer::DrawTextInfo,
            FrameDrawer.cc:129-166).
        Returns [H+20, W, 3] uint8.
        """
        from PIL import Image, ImageDraw

        img = np.asarray(image)
        if img.dtype != np.uint8:
            img = np.clip(img, 0, 255).astype(np.uint8)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        H, W = img.shape[:2]
        pil = Image.fromarray(img)
        d = ImageDraw.Draw(pil)

        n_tracked = 0
        if feats is not None:
            xy = np.asarray(feats.xy_raw)
            valid = np.asarray(feats.valid)
            tm = (np.asarray(tracked_mask) if tracked_mask is not None
                  else np.zeros(len(xy), bool))
            for i in np.nonzero(valid)[0]:
                x, y = float(xy[i, 0]), float(xy[i, 1])
                if tm[i]:
                    n_tracked += 1
                    d.rectangle([x - 3, y - 3, x + 3, y + 3], outline=GREEN)
                    d.point([x, y], fill=GREEN)
                else:
                    d.point([x, y], fill=BLUE)

        if detections:
            for det in detections:
                x0, y0, bw, bh = [float(v) for v in det["box"]]
                d.rectangle([x0, y0, x0 + bw, y0 + bh], outline=RED,
                            width=2)
                label = det.get("class_name",
                                str(det.get("class_id", "?")))
                if class_names is not None:
                    ci = int(det.get("class_id", 0))
                    if 0 <= ci < len(class_names):
                        label = class_names[ci]
                if "score" in det:
                    label += f" {100 * det['score']:.0f}%"
                d.text((x0 + 2, max(y0 - 11, 0)), label, fill=RED)

        out = Image.new("RGB", (W, H + 20), (0, 0, 0))
        out.paste(pil, (0, 0))
        d2 = ImageDraw.Draw(out)
        txt = (f"{STATE_TEXT.get(state, '?')} | KFs: {n_kfs} "
               f"MPs: {n_points} Matches: {n_tracked}")
        d2.text((5, H + 4), txt, fill=(255, 255, 255))
        return np.asarray(out)
