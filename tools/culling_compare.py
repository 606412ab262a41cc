"""Long-sequence keyframe-culling policy comparison (VERDICT r4 #10).

Runs the rendered revisit orbit under both kf_culling policies
("pressure" = cull only under arena pressure; "reference" = the always-on
90%-redundancy rule of LocalMapping::KeyFrameCulling,
src/LocalMapping.cc:634-720) at 192 and 408 frames, with loop closing
on, and records ATE / final keyframe count / loop closures per cell.

Usage: python tools/culling_compare.py [--cpu] [--short]
Writes CULLING_COMPARE.json and prints one JSON line per cell.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def run_cell(policy: str, n_frames: int, t_loop: int):
    import jax.numpy as jnp

    from myslam_tpu.features.extractor import ORBExtractor
    from myslam_tpu.features import frame as frame_mod
    from myslam_tpu.geom.projection import Camera
    from myslam_tpu.geom import se3
    from myslam_tpu.io import synthetic
    from myslam_tpu.slam import tracking

    scene = synthetic.Rendered3DScene(width=640, height=480,
                                      t_loop=t_loop, fx=450.0, fy=450.0,
                                      n_points=16000)
    cam = Camera.create(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                        width=640, height=480)
    ex = ORBExtractor(480, 640, n_features=2000)
    cfg = tracking.TrackingConfig(
        kf_cap=128, pt_cap=16384, feat_cap=ex.capacity,
        local_kf=8, local_pts=4096,
        ba_free=8, ba_fixed=8, ba_pts=4096, ba_obs=8,
        tri_neighbors=4, max_new_points=512,
        enable_loop_closing=True, vocab_words=1024,
        vocab_retrain_every=24, kf_culling=policy)
    tr = tracking.Tracker(cam, cfg)
    tr.extractor = ex

    i = 0
    while tr.state != tracking.OK and i < 16:
        feats = frame_mod.undistort(cam, ex(jnp.asarray(
            scene.frame(i), jnp.float32)))
        tr.process_frame(feats, i, i / 30.0)
        i += 1
    assert tr.state == tracking.OK

    CH = 8
    t0 = time.perf_counter()
    while i + CH <= n_frames:
        imgs = np.stack([scene.frame(i + k) for k in range(CH)]
                        ).astype(np.uint8)
        if tr.state == tracking.OK:
            tr.process_image_chunk(jax.device_put(imgs),
                                   np.arange(i, i + CH),
                                   (i + np.arange(CH)) / 30.0)
        else:
            for j in range(CH):
                feats = frame_mod.undistort(cam, ex(jnp.asarray(
                    imgs[j], jnp.float32)))
                tr.process_frame(feats, i + j, (i + j) / 30.0)
        i += CH
    wall = time.perf_counter() - t0

    est, gt = [], []
    for fid, _, Tcw in tr.corrected_trajectory():
        est.append(np.asarray(se3.camera_center(jnp.asarray(Tcw))))
        gt.append(scene.gt_center(int(fid)))
    # similarity-aligned ATE (same as bench.py)
    est, gt = np.stack(est), np.stack(gt)
    mu_e, mu_g = est.mean(0), gt.mean(0)
    E, G = est - mu_e, gt - mu_g
    U, S, Vt = np.linalg.svd(G.T @ E / len(est))
    D = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        D[2, 2] = -1
    R = U @ D @ Vt
    s = np.trace(np.diag(S) @ D) / max((E * E).sum() / len(est), 1e-12)
    res = (s * (R @ E.T)).T + mu_g - gt
    ate = float(np.sqrt((res * res).sum(1).mean()))
    n_loops = (len(tr.loop_closer.state.loop_edges)
               if tr.loop_closer is not None else 0)
    return {
        "policy": policy, "frames": int(n_frames), "t_loop": int(t_loop),
        "ate_rmse_m": round(ate, 4), "n_kf": int(tr.n_kf),
        "loop_closures": int(n_loops), "wall_s": round(wall, 1),
    }


def main():
    cells = [(192, 180), (408, 384)]
    if "--short" in sys.argv:
        cells = [(192, 180)]
    rows = []
    for n_frames, t_loop in cells:
        for policy in ("pressure", "reference"):
            row = run_cell(policy, n_frames, t_loop)
            print(json.dumps(row))
            rows.append(row)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "CULLING_COMPARE.json"), "w") as f:
        json.dump(rows, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
