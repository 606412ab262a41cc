"""Pinhole camera model: projection, undistortion, frustum tests.

Replaces the reference's scattered cv::Mat camera math (Frame::isInFrustum
src/Frame.cc:269-325, Frame::UndistortKeyPoints src/Frame.cc:404-434) with
batched, jittable array functions.

Camera intrinsics travel as a small named tuple pytree so they can cross jit
boundaries without retracing.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from . import se3


@struct.dataclass
class Camera:
    """Pinhole + radial-tangential distortion (OpenCV convention).

    width/height are static pytree aux data so jitted consumers can use them
    as Python numbers without retracing on intrinsics changes."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray
    k3: jnp.ndarray
    width: int = struct.field(pytree_node=False, default=640)
    height: int = struct.field(pytree_node=False, default=480)

    @classmethod
    def create(cls, fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0,
               width=640, height=480):
        f = lambda v: jnp.asarray(v, dtype=jnp.float32)
        return cls(f(fx), f(fy), f(cx), f(cy), f(k1), f(k2), f(p1), f(p2),
                   f(k3), int(width), int(height))

    @property
    def K(self):
        """3x3 intrinsic matrix."""
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack([
            jnp.stack([self.fx, z, self.cx]),
            jnp.stack([z, self.fy, self.cy]),
            jnp.stack([z, z, o]),
        ])

    @property
    def inv_fx(self):
        return 1.0 / self.fx

    @property
    def inv_fy(self):
        return 1.0 / self.fy


def project(cam: Camera, xyz_cam):
    """Camera-frame points [..., 3] -> pixel coords [..., 2] and depth [...].

    No distortion: the pipeline matches in undistorted pixel space, like the
    reference (keypoints are undistorted once at extraction,
    src/Frame.cc:404-434, and all projections use the pinhole model only,
    e.g. src/ORBmatcher.cc:1370-1387).
    """
    z = xyz_cam[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * xyz_cam[..., 0] / safe_z + cam.cx
    v = cam.fy * xyz_cam[..., 1] / safe_z + cam.cy
    return jnp.stack([u, v], axis=-1), z


def project_world(cam: Camera, Tcw, xyz_world):
    """World points through pose Tcw -> pixels, depth."""
    return project(cam, se3.transform(Tcw, xyz_world))


def backproject(cam: Camera, uv, depth):
    """Undistorted pixels [..., 2] + depth [...] -> camera-frame points [..., 3]."""
    x = (uv[..., 0] - cam.cx) * cam.inv_fx * depth
    y = (uv[..., 1] - cam.cy) * cam.inv_fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def distort_normalized(cam: Camera, xn):
    """Apply radial-tangential distortion to normalized coords [..., 2]."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
    xd = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(cam: Camera, uv, iters: int = 8):
    """Distorted pixel coords [..., 2] -> undistorted pixel coords.

    Fixed-point iteration of the inverse distortion map (what
    cv::undistortPoints does internally); `iters` fixed for static shapes.
    """
    xd = (uv[..., 0] - cam.cx) * cam.inv_fx
    yd = (uv[..., 1] - cam.cy) * cam.inv_fy
    x, y = xd, yd
    for _ in range(iters):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
        dx = 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
        dy = cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
        x = (xd - dx) / radial
        y = (yd - dy) / radial
    u = x * cam.fx + cam.cx
    v = y * cam.fy + cam.cy
    return jnp.stack([u, v], axis=-1)


def image_bounds(cam: Camera):
    """Undistorted image bounds (min_x, max_x, min_y, max_y) — reference
    Frame::ComputeImageBounds (src/Frame.cc:436-464) undistorts the 4 corners."""
    w, h = float(cam.width), float(cam.height)
    corners = jnp.array(
        [[0.0, 0.0], [w, 0.0], [0.0, h], [w, h]], dtype=jnp.float32
    )
    und = undistort_points(cam, corners)
    min_x = jnp.minimum(und[0, 0], und[2, 0])
    max_x = jnp.maximum(und[1, 0], und[3, 0])
    min_y = jnp.minimum(und[0, 1], und[1, 1])
    max_y = jnp.maximum(und[2, 1], und[3, 1])
    return min_x, max_x, min_y, max_y


def in_frustum(cam: Camera, Tcw, xyz_world, normals, min_dist, max_dist,
               bounds, view_cos_limit: float = 0.5):
    """Batched Frame::isInFrustum (src/Frame.cc:269-325).

    Args:
      xyz_world: [P, 3] map-point positions.
      normals:   [P, 3] mean viewing directions.
      min_dist/max_dist: [P] scale-invariance band (x0.8 / x1.2 applied by
        caller, matching MapPoint::GetMinDistanceInvariance,
        src/MapPoint.cc:373-383).
      bounds: (min_x, max_x, min_y, max_y) undistorted image bounds.
    Returns:
      visible [P] bool, uv [P, 2], dist [P], view_cos [P].
    """
    xyz_cam = se3.transform(Tcw, xyz_world)
    uv, z = project(cam, xyz_cam)
    min_x, max_x, min_y, max_y = bounds
    pos_depth = z > 0.0
    in_image = (
        (uv[..., 0] >= min_x) & (uv[..., 0] <= max_x)
        & (uv[..., 1] >= min_y) & (uv[..., 1] <= max_y)
    )
    cam_center = se3.camera_center(Tcw)
    po = xyz_world - cam_center
    dist = jnp.linalg.norm(po, axis=-1)
    in_band = (dist >= min_dist) & (dist <= max_dist)
    view_cos = jnp.sum(po * normals, axis=-1) / jnp.maximum(dist, 1e-9)
    good_angle = view_cos > view_cos_limit
    visible = pos_depth & in_image & in_band & good_angle
    return visible, uv, dist, view_cos
