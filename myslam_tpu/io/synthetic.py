"""Synthetic sequence generation for tests, examples and benchmarks.

The environment has no datasets and no network, so validation follows
SURVEY.md §4: rendered synthetic sequences with exact ground truth. Two
flavors:

- `FeatureSequence`: camera trajectory over a 3D point cloud with stable
  per-point descriptors -> FrameFeatures directly (fast; exercises
  everything above feature extraction).
- `ImageSequence`: renders textured images of a fronto-textured world so
  the full extractor runs too (integration/bench path).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..features.frame import FrameFeatures
from ..geom import se3
from ..geom.projection import Camera


def default_camera(width=640, height=480):
    return Camera.create(fx=450.0, fy=450.0, cx=width / 2, cy=height / 2,
                         width=width, height=height)


def orbit_pose(i: int, radius: float = 0.0, step: float = 0.02,
               yaw_rate: float = 0.004):
    """Sideways-translating trajectory with handheld-style rotational and
    depth jitter (fr1_xyz-like). The jitter is NOT cosmetic: a pure
    sideways translation with a fronto-parallel scene is the textbook
    bas-relief degeneracy — depth and pose trade off along a nearly flat
    cost mode and monocular BA cannot pin the structure. Real handheld
    sequences (what the reference is validated on) always carry rotation
    that breaks this; the synthetic must too."""
    rx = 0.015 * np.sin(0.37 * i) + 0.01 * np.sin(0.11 * i)     # pitch
    ry = yaw_rate * i + 0.02 * np.sin(0.23 * i)                  # yaw
    rz = 0.012 * np.sin(0.31 * i + 1.0)                          # roll
    cx_, sx_ = np.cos(rx), np.sin(rx)
    cy_, sy_ = np.cos(ry), np.sin(ry)
    cz_, sz_ = np.cos(rz), np.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx_, -sx_], [0, sx_, cx_]])
    Ry = np.array([[cy_, 0, sy_], [0, 1, 0], [-sy_, 0, cy_]])
    Rz = np.array([[cz_, -sz_, 0], [sz_, cz_, 0], [0, 0, 1]])
    R = (Ry @ Rx @ Rz).astype(np.float32)
    t = np.array([-step * i, 0.01 * np.sin(0.1 * i),
                  0.02 * np.sin(0.17 * i)], np.float32)
    return se3.make(jnp.asarray(R), jnp.asarray(t))


class FeatureSequence:
    """Deterministic synthetic world of N points with 256-bit descriptors;
    each frame yields FrameFeatures with observation noise + descriptor bit
    noise, plus ground-truth camera centers for ATE."""

    def __init__(self, cam: Camera, n_points: int = 4000,
                 feat_cap: int = 1024, noise_px: float = 0.3,
                 desc_flips: int = 4, seed: int = 0,
                 pose_fn=orbit_pose, bf: float = 0.0,
                 depth_noise: float = 0.0):
        self.cam = cam
        self.feat_cap = feat_cap
        self.noise_px = noise_px
        self.desc_flips = desc_flips
        self.pose_fn = pose_fn
        self.bf = bf                  # > 0: emit stereo u_right/depth
        self.depth_noise = depth_noise
        rng = np.random.default_rng(seed)
        self.rng = rng
        self.xyz = np.stack([
            rng.uniform(-4, 4, n_points),
            rng.uniform(-2.5, 2.5, n_points),
            rng.uniform(1.5, 4.5, n_points),
        ], 1).astype(np.float32)
        self.desc = rng.integers(0, 2**32, (n_points, 8), dtype=np.uint32)
        # fixed per-point detection priority: the SAME landmarks are
        # "detected" whenever visible (like stable corners), instead of a
        # fresh random subset per frame
        self.priority = rng.uniform(0, 1, n_points)

    def gt_center(self, i: int) -> np.ndarray:
        return np.asarray(se3.camera_center(self.pose_fn(i)))

    def frame(self, i: int):
        cam = self.cam
        T = self.pose_fn(i)
        pc = np.asarray(se3.transform(T, jnp.asarray(self.xyz)))
        z = pc[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            u = float(cam.fx) * pc[:, 0] / z + float(cam.cx)
            v = float(cam.fy) * pc[:, 1] / z + float(cam.cy)
        vis = (z > 0.5) & (u > 20) & (u < cam.width - 20) \
            & (v > 20) & (v < cam.height - 20)
        idx = np.nonzero(vis)[0]
        idx = idx[np.argsort(self.priority[idx])][: self.feat_cap]
        idx = np.sort(idx)
        m = len(idx)
        F = self.feat_cap

        xy = np.zeros((F, 2), np.float32)
        xy[:m, 0] = u[idx] + self.rng.normal(0, self.noise_px, m)
        xy[:m, 1] = v[idx] + self.rng.normal(0, self.noise_px, m)
        desc = np.zeros((F, 8), np.uint32)
        desc[:m] = self.desc[idx]
        if self.desc_flips:
            for _ in range(self.desc_flips):
                bit = self.rng.integers(0, 256, m)
                desc[np.arange(m), bit // 32] ^= (
                    np.uint32(1) << (bit % 32).astype(np.uint32))
        valid = np.zeros(F, bool)
        valid[:m] = True
        u_right = depth = None
        if self.bf > 0:
            # The right-image column is its OWN measurement with noise
            # independent of the left keypoint (as in real rectified
            # stereo); depth is derived from the measured disparity like
            # Frame::ComputeStereoMatches (src/Frame.cc:629-640). Using
            # correlated noise here (ur = u_noisy - bf/z) makes the pose
            # cost land in a spurious nearby local minimum — see
            # tests/test_tracking_stereo.py.
            ur_clean = u[idx] - self.bf / np.maximum(z[idx], 1e-6)
            sig = self.depth_noise if self.depth_noise else self.noise_px
            dd = np.full(F, -1.0, np.float32)
            rr = np.full(F, -1.0, np.float32)
            rr[:m] = ur_clean + self.rng.normal(0, sig, m)
            disp = np.maximum(xy[:m, 0] - rr[:m], 0.01)
            dd[:m] = self.bf / disp
            u_right, depth = jnp.asarray(rr), jnp.asarray(dd)
        feats = FrameFeatures(
            xy=jnp.asarray(xy), xy_raw=jnp.asarray(xy),
            level=jnp.zeros(F, jnp.int32),
            angle=jnp.zeros(F, jnp.float32),
            response=jnp.ones(F, jnp.float32),
            desc=jnp.asarray(desc),
            valid=jnp.asarray(valid),
            u_right=u_right,
            depth=depth,
        )
        gt_ids = np.full(F, -1, np.int64)
        gt_ids[:m] = idx
        return feats, gt_ids


class ImageSequence:
    """Renders a textured fronto-parallel world plane and a camera sliding
    along it — produces [H, W] grayscale images for the full pipeline."""

    def __init__(self, width=640, height=480, n_frames=100,
                 step_px: float = 3.0, seed: int
                 = 0):
        rng = np.random.default_rng(seed)
        self.step = step_px
        pad = int(step_px * n_frames) + 64
        tex = rng.uniform(0, 255, (height + 64, width + pad)).astype(np.float32)
        # band-limit so descriptors are stable under subpixel shifts
        from ..ops import image as img_ops
        self.tex = np.asarray(img_ops.gaussian_blur(
            jnp.asarray(tex), 7, 1.5))
        self.width, self.height = width, height
        self.n_frames = n_frames

    def frame(self, i: int) -> np.ndarray:
        x0 = int(round(self.step * i))
        return self.tex[32:32 + self.height, x0:x0 + self.width].copy()

    def gt_center(self, i: int) -> np.ndarray:
        # planar texture at depth 1 with fx=1px: translation ~ step*i px
        return np.array([self.step * i, 0.0, 0.0], np.float32)


class Rendered3DScene:
    """Render a NON-PLANAR 3D scene with a genuine revisit.

    A TEXTURED cylindrical "room" wall around the origin, raycast per
    pixel; the camera orbits inside looking radially outward, sweeping
    the whole wall and returning to its start — a true loop (the texture
    is periodic in azimuth, so the revisit sees exactly the surface it
    saw at the start). Band-limited random texture gives ORB the rich,
    stable local gradients real imagery has (point-sprite renders make
    degenerate descriptors: a smooth blob's BRIEF comparisons sit at
    noise level and its pyramid level flickers). Frames are [H, W]
    float32 grayscale, suitable for writing to disk as PGM and replaying
    through the dataset drivers (the stand-in for TUM fr1/fr2; reference
    validation is dataset replay, SURVEY.md §4).
    """

    def __init__(self, width=512, height=384, n_points=9000,
                 wall_radius=6.0, orbit_radius=2.5, t_loop=72,
                 fx=380.0, fy=380.0, seed=3):
        rng = np.random.default_rng(seed)
        # n_points kept for API compatibility: it scales texture detail.
        # Texture resolution is kept WELL BELOW the screen sampling rate
        # (~0.5 texture px per screen px at the orbit distance): at 1:1
        # the per-frame bilinear resampling aliases, and detection
        # repeatability collapses phase-dependently along the orbit.
        tex_w = 2048
        tex_h = 512
        from ..ops import image as img_ops
        import jax.numpy as _jnp
        # multi-octave band-limited texture: structure at several scales
        # keeps BRIEF comparisons decisively signed under the per-frame
        # resampling/warp of the raycast (a single-octave blur leaves
        # near-equal pairs that flip, inflating Hamming distances).
        # Azimuthally periodic: blur with the seam tiled.
        acc = np.zeros((tex_h, tex_w), np.float32)
        for octave_w, sigma in [(1.0, 0.8), (2.0, 1.8), (4.0, 4.0)]:
            n = rng.uniform(-1, 1, (tex_h, tex_w)).astype(np.float32)
            n3 = np.concatenate([n[:, -32:], n, n[:, :32]], axis=1)
            n3 = np.asarray(img_ops.gaussian_blur(
                _jnp.asarray(n3), 13, sigma))
            acc += octave_w * n3[:, 32:-32]
        self.tex = (acc - acc.min()) / max(acc.max() - acc.min(), 1e-6) \
            * 235.0 + 10.0
        self.tex_w, self.tex_h = tex_w, tex_h
        self.wall_radius = wall_radius
        self.y_extent = 6.0       # wall height mapped onto the texture
        self.width, self.height = width, height
        self.fx, self.fy = fx, fy
        self.cx, self.cy = width / 2.0, height / 2.0
        self.orbit_radius = orbit_radius
        self.t_loop = t_loop

    def pose(self, i: int):
        """World-to-camera [3,4]: camera on the orbit circle, optical
        axis radially outward (toward the wall)."""
        a = 2 * np.pi * i / self.t_loop
        c, s = np.cos(a), np.sin(a)
        C = np.array([self.orbit_radius * s,
                      0.08 * np.sin(0.23 * i),
                      -self.orbit_radius * c], np.float32)
        # look outward: camera +z (view) = radial direction (s, 0, -c)
        Rwc = np.array([[c, 0.0, s],
                        [0.0, 1.0, 0.0],
                        [-s, 0.0, c]], np.float32)
        Rcw = Rwc.T
        t = -Rcw @ C
        return np.concatenate([Rcw, t[:, None]], axis=1)

    def gt_center(self, i: int) -> np.ndarray:
        T = self.pose(i)
        return -T[:, :3].T @ T[:, 3]

    def frame(self, i: int) -> np.ndarray:
        """Raycast the textured cylinder wall, 2x supersampled
        (antialiasing — aliasing breaks frame-to-frame detection
        repeatability)."""
        return self.render_pose(self.pose(i))

    def frame_right(self, i: int, baseline: float) -> np.ndarray:
        """Right-camera view: the camera displaced by `baseline` along
        its own +x axis (a rectified stereo rig)."""
        T = self.pose(i).copy()
        T[:, 3] = T[:, 3] - np.array([baseline, 0.0, 0.0], np.float32)
        return self.render_pose(T)

    def render_pose(self, T) -> np.ndarray:
        big = self._render(T, 2)
        return 0.25 * (big[0::2, 0::2] + big[0::2, 1::2]
                       + big[1::2, 0::2] + big[1::2, 1::2])

    def _render(self, T, ss: int = 1) -> np.ndarray:
        Rcw, t = T[:, :3], T[:, 3]
        Rwc = Rcw.T
        C = -Rwc @ t
        u, v = np.meshgrid(
            (np.arange(self.width * ss, dtype=np.float32) + 0.5) / ss - 0.5,
            (np.arange(self.height * ss, dtype=np.float32) + 0.5) / ss - 0.5)
        d_cam = np.stack([(u - self.cx) / self.fx,
                          (v - self.cy) / self.fy,
                          np.ones_like(u)], axis=-1)       # [H, W, 3]
        d = d_cam @ Rwc.T                                  # world dirs
        # intersect x^2 + z^2 = r^2 (cylinder axis = y)
        dx, dz = d[..., 0], d[..., 2]
        cx_, cz = C[0], C[2]
        a = dx * dx + dz * dz
        b = 2.0 * (cx_ * dx + cz * dz)
        c = cx_ * cx_ + cz * cz - self.wall_radius ** 2
        disc = np.maximum(b * b - 4 * a * c, 0.0)
        s = (-b + np.sqrt(disc)) / np.maximum(2 * a, 1e-12)
        hit = C[None, None, :] + s[..., None] * d           # world point
        theta = np.arctan2(hit[..., 0], -hit[..., 2])       # azimuth
        ty = hit[..., 1]
        # texture lookup: periodic in azimuth, clamped in height
        px = (theta / (2 * np.pi)) % 1.0 * self.tex_w
        py = np.clip((ty / self.y_extent + 0.5) * (self.tex_h - 2),
                     0, self.tex_h - 2)
        x0 = np.floor(px).astype(np.int64) % self.tex_w
        x1 = (x0 + 1) % self.tex_w
        y0 = np.floor(py).astype(np.int64)
        fxp = (px - np.floor(px)).astype(np.float32)
        fyp = (py - y0).astype(np.float32)
        t00 = self.tex[y0, x0]
        t01 = self.tex[y0, x1]
        t10 = self.tex[y0 + 1, x0]
        t11 = self.tex[y0 + 1, x1]
        img = ((1 - fyp) * ((1 - fxp) * t00 + fxp * t01)
               + fyp * ((1 - fxp) * t10 + fxp * t11))
        # no view-dependent shading: a camera-anchored brightness gradient
        # sliding over the texture flips near-equal BRIEF comparisons
        # frame to frame (measured: it alone pushes true-match Hamming
        # distances past TH_LOW on band-limited texture)
        return np.clip(img, 0, 255).astype(np.float32)

    def write_tum_sequence(self, out_dir: str, n_frames: int):
        """Write PGM frames + rgb.txt + groundtruth.txt in TUM layout."""
        import os
        os.makedirs(os.path.join(out_dir, "rgb"), exist_ok=True)
        lines, gt = [], []
        for i in range(n_frames):
            img = self.frame(i).astype(np.uint8)
            rel = f"rgb/{i:04d}.pgm"
            with open(os.path.join(out_dir, rel), "wb") as f:
                f.write(b"P5\n%d %d\n255\n" % (self.width, self.height))
                f.write(img.tobytes())
            t = i / 30.0
            lines.append(f"{t:.6f} {rel}")
            C = self.gt_center(i)
            gt.append(f"{t:.6f} {C[0]} {C[1]} {C[2]} 0 0 0 1")
        with open(os.path.join(out_dir, "rgb.txt"), "w") as f:
            f.write("# synthetic rendered 3D orbit\n")
            f.write("\n".join(lines) + "\n")
        with open(os.path.join(out_dir, "groundtruth.txt"), "w") as f:
            f.write("\n".join(gt) + "\n")

    def write_euroc_stereo_sequence(self, out_dir: str, n_frames: int,
                                    baseline: float):
        """Write a EuRoC-layout stereo sequence: mav0/cam0/data/<ns>.png
        + mav0/cam1/data/<ns>.png (PGM payload — the dataset reader
        sniffs content, not extension), a ns times file, and
        groundtruth.txt (TUM rows for the LEFT camera)."""
        import os
        d0 = os.path.join(out_dir, "mav0", "cam0", "data")
        d1 = os.path.join(out_dir, "mav0", "cam1", "data")
        os.makedirs(d0, exist_ok=True)
        os.makedirs(d1, exist_ok=True)
        stamps, gt = [], []
        for i in range(n_frames):
            ns = int(i / 30.0 * 1e9)
            for d, img in ((d0, self.frame(i)),
                           (d1, self.frame_right(i, baseline))):
                with open(os.path.join(d, f"{ns}.png"), "wb") as f:
                    f.write(b"P5\n%d %d\n255\n" % (self.width, self.height))
                    f.write(img.astype(np.uint8).tobytes())
            stamps.append(str(ns))
            C = self.gt_center(i)
            gt.append(f"{ns * 1e-9:.6f} {C[0]} {C[1]} {C[2]} 0 0 0 1")
        with open(os.path.join(out_dir, "times.txt"), "w") as f:
            f.write("\n".join(stamps) + "\n")
        with open(os.path.join(out_dir, "groundtruth.txt"), "w") as f:
            f.write("\n".join(gt) + "\n")
        return (os.path.join(out_dir, "mav0", "cam0"),
                os.path.join(out_dir, "mav0", "cam1"),
                os.path.join(out_dir, "times.txt"))


class DynamicSpriteScene:
    """Rendered3DScene plus MOVING textured sprites with ground-truth
    boxes — the rendered stand-in for BASELINE config 4 (TUM fr3_walking
    with YOLO gating; reference capability surface yolo.cpp:129-194).

    Each sprite is a feathered, band-limited-textured square translating
    across the image independently of the camera — exactly the geometry
    violation a walking person causes: its ORB features are stable and
    matchable frame-to-frame but inconsistent with the static world, so
    an ungated tracker triangulates and tracks them as (moving) map
    points. `boxes(i)` returns oracle detections in the semantic
    filter's format, standing in for the YOLO detector (the detector is
    validated separately against darknet weights, tests/test_yolo.py;
    renders are out of its training domain)."""

    def __init__(self, n_sprites: int = 3, sprite_size: int = 96,
                 sprite_speed: float = 4.0, seed: int = 11, **scene_kw):
        self.base = Rendered3DScene(**scene_kw)
        self.width, self.height = self.base.width, self.base.height
        self.t_loop = self.base.t_loop
        rng = np.random.default_rng(seed)
        from ..ops import image as img_ops
        import jax.numpy as _jnp
        S = sprite_size
        yy, xx = np.mgrid[0:S, 0:S].astype(np.float32)
        r = np.maximum(np.abs(xx - S / 2), np.abs(yy - S / 2)) / (S / 2)
        feather = np.clip((0.95 - r) / 0.12, 0.0, 1.0)   # soft edge
        self.sprites = []
        for k in range(n_sprites):
            acc = np.zeros((S, S), np.float32)
            for sigma, w in [(1.2, 1.0), (3.0, 2.0)]:
                n = rng.uniform(-1, 1, (S, S)).astype(np.float32)
                acc += w * np.asarray(img_ops.gaussian_blur(
                    _jnp.asarray(n), 13, sigma))
            tex = (acc - acc.min()) / max(acc.max() - acc.min(), 1e-6) \
                * 210.0 + 20.0
            x0 = rng.uniform(0, self.width)
            y0 = rng.uniform(0.15, 0.55) * self.height
            vx = sprite_speed * rng.uniform(0.8, 1.3) * (1 if k % 2 else -1)
            vy = sprite_speed * rng.uniform(-0.15, 0.15)
            self.sprites.append((tex, feather, x0, y0, vx, vy))
        self.S = S

    def _sprite_pos(self, sp, i):
        tex, feather, x0, y0, vx, vy = sp
        span_x = self.width + 2 * self.S
        x = (x0 + vx * i) % span_x - self.S
        y = np.clip(y0 + vy * i, -self.S // 2,
                    self.height - self.S // 2)
        return int(round(x)), int(round(y))

    def gt_center(self, i: int):
        return self.base.gt_center(i)

    def frame(self, i: int) -> np.ndarray:
        img = self.base.frame(i).copy()
        H, W = img.shape
        for sp in self.sprites:
            tex, feather = sp[0], sp[1]
            x, y = self._sprite_pos(sp, i)
            xs0, ys0 = max(x, 0), max(y, 0)
            xs1, ys1 = min(x + self.S, W), min(y + self.S, H)
            if xs1 <= xs0 or ys1 <= ys0:
                continue
            tx0, ty0 = xs0 - x, ys0 - y
            t = tex[ty0:ty0 + ys1 - ys0, tx0:tx0 + xs1 - xs0]
            a = feather[ty0:ty0 + ys1 - ys0, tx0:tx0 + xs1 - xs0]
            img[ys0:ys1, xs0:xs1] = (1 - a) * img[ys0:ys1, xs0:xs1] + a * t
        return img

    def boxes(self, i: int, margin: int = 6):
        """Oracle detections for frame i in the semantic det format."""
        out = []
        for sp in self.sprites:
            x, y = self._sprite_pos(sp, i)
            out.append({"class_id": 14, "class_name": "person",
                        "score": 0.95,
                        "box": (float(x - margin), float(y - margin),
                                float(self.S + 2 * margin),
                                float(self.S + 2 * margin))})
        return out
