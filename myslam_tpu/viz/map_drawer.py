"""Map rendering — MapDrawer equivalent.

Reference: src/MapDrawer.cc:44-221 renders map points, keyframe frusta,
the covisibility graph and the current camera with Pangolin GL. Headless
equivalent: matplotlib figures (top-down XZ and 3D) saved to PNG or
returned as RGB arrays — the natural artifact for a TPU deployment.
"""

from __future__ import annotations

import numpy as np


def _centers_and_axes(store):
    from ..geom import se3
    import jax.numpy as jnp

    valid = np.asarray(store.kf_valid)
    ids = np.nonzero(valid)[0]
    poses = np.asarray(store.kf_pose)[ids]
    centers = np.stack([-(p[:, :3].T @ p[:, 3]) for p in poses]) \
        if len(ids) else np.zeros((0, 3))
    fwd = np.stack([p[2, :3] for p in poses]) if len(ids) else centers
    return ids, centers, fwd


class MapDrawer:
    """Renders MapStore state. All methods are pure reads."""

    def __init__(self, point_size: float = 1.0, kf_size: float = 0.05):
        self.point_size = point_size
        self.kf_size = kf_size

    def figure(self, store, Tcw=None, show_graph: bool = True,
               elev_3d: bool = False):
        """Build a matplotlib Figure of the current map (points gray,
        reference/local structure like MapDrawer::DrawMapPoints +
        DrawKeyFrames + DrawCurrentCamera, MapDrawer.cc:44-156)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        pts = np.asarray(store.pt_xyz)[np.asarray(store.pt_valid)]
        ids, centers, fwd = _centers_and_axes(store)

        fig = plt.figure(figsize=(7, 7), dpi=100)
        if elev_3d:
            ax = fig.add_subplot(projection="3d")
            if len(pts):
                ax.scatter(pts[:, 0], pts[:, 2], -pts[:, 1],
                           s=self.point_size, c="0.4", linewidths=0)
            if len(centers):
                ax.plot(centers[:, 0], centers[:, 2], -centers[:, 1],
                        "b.-", markersize=3, linewidth=0.7)
            ax.set_xlabel("x"), ax.set_ylabel("z"), ax.set_zlabel("-y")
        else:
            ax = fig.add_subplot()
            if len(pts):
                ax.scatter(pts[:, 0], pts[:, 2], s=self.point_size,
                           c="0.4", linewidths=0)
            if len(centers):
                ax.plot(centers[:, 0], centers[:, 2], "b.-",
                        markersize=4, linewidth=0.8, label="keyframes")
                # covisibility graph (MapDrawer::DrawKeyFrames graph part)
                if show_graph and len(ids) > 1:
                    from ..mapping import map_store as ms
                    W = np.asarray(ms.covisibility(store))
                    for a_i, a in enumerate(ids):
                        for b_i, b in enumerate(ids):
                            if b <= a or W[a, b] < 15:
                                continue
                            ax.plot([centers[a_i, 0], centers[b_i, 0]],
                                    [centers[a_i, 2], centers[b_i, 2]],
                                    "g-", linewidth=0.3, alpha=0.5)
            if Tcw is not None:
                T = np.asarray(Tcw)
                c = -T[:, :3].T @ T[:, 3]
                ax.plot([c[0]], [c[2]], "r^", markersize=9,
                        label="current camera")
            ax.set_xlabel("x [m]"), ax.set_ylabel("z [m]")
            ax.set_aspect("equal", adjustable="datalim")
            ax.legend(loc="upper right", fontsize=8)
        ax.set_title(f"{len(pts)} map points, {len(centers)} keyframes")
        fig.tight_layout()
        return fig

    def render(self, store, Tcw=None, **kw):
        """Map render as an RGB uint8 array."""
        fig = self.figure(store, Tcw, **kw)
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
        import matplotlib.pyplot as plt
        plt.close(fig)
        return buf

    def save(self, store, path: str, Tcw=None, **kw):
        fig = self.figure(store, Tcw, **kw)
        fig.savefig(path)
        import matplotlib.pyplot as plt
        plt.close(fig)
