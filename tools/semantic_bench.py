"""BASELINE config-4 proxy benchmark: detector-gated vs ungated SLAM on a
rendered sequence with MOVING dynamic objects.

Renders the revisit orbit with textured sprites translating across the
image (io/synthetic.DynamicSpriteScene — the fr3_walking stand-in), runs
the System once with oracle dynamic-object detections feeding the
semantic filter and once without, and records both similarity-aligned
ATEs in SEMANTIC_BENCH.json. The delta is the end-to-end evidence for
the semantic-fusion claim (reference capability surface yolo.cpp:129-194;
the fork never wired its detector into tracking, SURVEY.md §0).

Usage: python tools/semantic_bench.py [--cpu] [--frames N]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

N_FRAMES = 96
for i, a in enumerate(sys.argv):
    if a == "--frames":
        N_FRAMES = int(sys.argv[i + 1])


def umeyama_ate(est, gt):
    est = np.asarray(est, np.float64)
    gt = np.asarray(gt, np.float64)
    mu_e, mu_g = est.mean(0), gt.mean(0)
    E, G = est - mu_e, gt - mu_g
    U, S, Vt = np.linalg.svd(G.T @ E / len(est))
    D = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        D[2, 2] = -1
    R = U @ D @ Vt
    var_e = (E * E).sum() / len(est)
    s = np.trace(np.diag(S) @ D) / max(var_e, 1e-12)
    res = (s * (R @ E.T)).T + mu_g - gt
    return float(np.sqrt((res * res).sum(1).mean()))


def run_mode(scene, gated: bool, n_frames: int):
    from myslam_tpu.geom import se3
    from myslam_tpu.utils.config import Settings
    from myslam_tpu.slam import tracking
    from myslam_tpu.slam.semantic import SemanticFilter
    from myslam_tpu.slam.system import System

    import jax.numpy as jnp

    s = Settings(width=scene.width, height=scene.height,
                 fx=scene.base.fx, fy=scene.base.fy,
                 cx=scene.width / 2.0, cy=scene.height / 2.0)
    cfg = tracking.TrackingConfig(
        kf_cap=64, pt_cap=16384, local_kf=8, local_pts=4096,
        ba_free=8, ba_fixed=8, ba_pts=4096, ba_obs=8,
        tri_neighbors=4, max_new_points=512,
        enable_loop_closing=False)
    sysm = System(settings=s, tracking_config=cfg,
                  semantic_filter=SemanticFilter(dynamic_classes=(14,))
                  if gated else None)
    est, gt = [], []
    for i in range(n_frames):
        img = scene.frame(i)
        dets = scene.boxes(i) if gated else None
        Tcw = sysm.track_monocular(img, i / 30.0, detections=dets)
        if Tcw is not None:
            C = -Tcw[:, :3].T @ Tcw[:, 3]
            est.append(C)
            gt.append(scene.gt_center(i))
    n_tracked = len(est)
    ate = umeyama_ate(np.stack(est), np.stack(gt)) if n_tracked > 10 \
        else float("inf")
    return ate, n_tracked


def main():
    from myslam_tpu.io.synthetic import DynamicSpriteScene

    scene = DynamicSpriteScene(
        n_sprites=3, sprite_size=96, sprite_speed=4.0,
        width=640, height=480, t_loop=180, fx=450.0, fy=450.0,
        n_points=16000)
    ate_g, n_g = run_mode(scene, gated=True, n_frames=N_FRAMES)
    ate_u, n_u = run_mode(scene, gated=False, n_frames=N_FRAMES)
    out = {
        "metric": "semantic_gating_ate_delta",
        "frames": N_FRAMES,
        "sprites": 3,
        "ate_gated_m": round(ate_g, 4),
        "ate_ungated_m": round(ate_u, 4),
        "tracked_gated": n_g,
        "tracked_ungated": n_u,
        "delta_m": round(ate_u - ate_g, 4),
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SEMANTIC_BENCH.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
