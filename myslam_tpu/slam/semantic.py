"""Semantic-SLAM fusion: YOLO detections gating dynamic-object features.

The reference advertises "Semantic-SLAM: combine YOLO2 and ORBSLAM2"
(README.md:1-2) but never wires the detector into the SLAM loop — its only
semantic main runs YOLO side-by-side (mono_robotcar.cc:43-125, SLAM loop
commented out). This module implements the fusion the reference implies
(BASELINE config 4: "YOLO2 semantic detection gating dynamic-object map
points"):

- features landing inside a dynamic-class detection box are masked BEFORE
  tracking/mapping, so people/vehicles never become map points;
- map points whose recent observations repeatedly project into dynamic
  boxes are culled (a parked car that starts moving).

All gating is array math: a [F, D] point-in-box test tile.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..features.frame import FrameFeatures
from ..mapping import map_store
from ..mapping.map_store import MapStore

# Dynamic classes among the deployment's 6 (darknet_cfg/coco.names:
# bicycle, bus, car, dog, motorbike, person)
DEFAULT_DYNAMIC_CLASSES = (0, 1, 2, 3, 4, 5)  # all six are movable objects

MAX_BOXES = 32


def boxes_to_array(detections: Sequence[dict],
                   dynamic_classes: Sequence[int]) -> np.ndarray:
    """Detections (models.yolo.Yolo.detect output) -> [MAX_BOXES, 4]
    (x0, y0, x1, y1), padded with empty boxes."""
    arr = np.zeros((MAX_BOXES, 4), np.float32)
    n = 0
    for d in detections:
        if d["class_id"] not in dynamic_classes or n >= MAX_BOXES:
            continue
        x, y, w, h = d["box"]
        arr[n] = (x, y, x + w, y + h)
        n += 1
    return arr


@jax.jit
def mask_dynamic_features(feats: FrameFeatures, boxes) -> FrameFeatures:
    """Invalidate features inside any dynamic box (boxes [D, 4] xyxy;
    empty boxes are all-zero). One [F, D] containment tile."""
    xy = feats.xy_raw
    nonempty = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
    inside = (
        (xy[:, None, 0] >= boxes[None, :, 0])
        & (xy[:, None, 0] <= boxes[None, :, 2])
        & (xy[:, None, 1] >= boxes[None, :, 1])
        & (xy[:, None, 1] <= boxes[None, :, 3])
        & nonempty[None, :]
    )
    dynamic = jnp.any(inside, axis=1)
    return feats.replace(valid=feats.valid & ~dynamic)


@jax.jit
def flag_dynamic_points(store: MapStore, cam_pose, cam, boxes, obs):
    """Count current-frame map points whose projection falls in a dynamic
    box (for observation-history culling). Returns [P]-sized increment
    mask over point ids present in `obs`."""
    from ..geom import se3
    pid = jnp.clip(obs, 0, store.pt_cap - 1)
    valid = (obs >= 0) & store.pt_valid[pid]
    pc = se3.transform(cam_pose, store.pt_xyz[pid])
    z = jnp.maximum(pc[:, 2], 1e-9)
    u = cam.fx * pc[:, 0] / z + cam.cx
    v = cam.fy * pc[:, 1] / z + cam.cy
    nonempty = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
    inside = (
        (u[:, None] >= boxes[None, :, 0]) & (u[:, None] <= boxes[None, :, 2])
        & (v[:, None] >= boxes[None, :, 1]) & (v[:, None] <= boxes[None, :, 3])
        & nonempty[None, :]
    )
    hit = valid & jnp.any(inside, axis=1)
    flags = jnp.zeros(store.pt_cap, jnp.int32).at[
        jnp.where(hit, pid, store.pt_cap)].add(1, mode="drop")
    return flags


@dataclass
class SemanticFilter:
    """Stateful gate: per-point dynamic-hit counters with decay; points hit
    in >= `cull_hits` recent frames are erased from the map."""

    dynamic_classes: Sequence[int] = DEFAULT_DYNAMIC_CLASSES
    cull_hits: int = 3
    hit_counters: Optional[jnp.ndarray] = None

    def filter_features(self, feats: FrameFeatures,
                        detections: Sequence[dict]) -> FrameFeatures:
        boxes = boxes_to_array(detections, self.dynamic_classes)
        if not (boxes[:, 2] > boxes[:, 0]).any():
            return feats
        return mask_dynamic_features(feats, jnp.asarray(boxes))

    def update_and_cull(self, store: MapStore, cam, cam_pose, obs,
                        detections: Sequence[dict]) -> MapStore:
        """After tracking a frame: bump hit counters for map points inside
        dynamic boxes, decay the rest, cull repeat offenders."""
        if self.hit_counters is None or \
                self.hit_counters.shape[0] != store.pt_cap:
            self.hit_counters = jnp.zeros(store.pt_cap, jnp.int32)
        boxes = boxes_to_array(detections, self.dynamic_classes)
        if not (boxes[:, 2] > boxes[:, 0]).any():
            return store
        flags = flag_dynamic_points(
            store, cam_pose, cam, jnp.asarray(boxes), obs)
        # +1 net per hit frame, -1 per miss frame (floor 0): a point must be
        # flagged in ~cull_hits MORE frames than not, recently, to be culled
        self.hit_counters = jnp.maximum(
            self.hit_counters + 2 * flags - 1, 0)
        kill = (self.hit_counters >= self.cull_hits) & store.pt_valid
        self.hit_counters = jnp.where(kill, 0, self.hit_counters)
        return map_store.erase_points(store, kill)
