"""Instrumented replica of bench.py --full (CPU-friendly): per-chunk
tracking health, arena fill, keyframe insertions, loop-detect status.

Usage: python tools/full_debug.py [--cpu] [--frames N] [--kf-cap N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from myslam_tpu.features.extractor import ORBExtractor
from myslam_tpu.features import frame as frame_mod
from myslam_tpu.geom.projection import Camera
from myslam_tpu.geom import se3
from myslam_tpu.io import synthetic
from myslam_tpu.slam import tracking


def arg(name, default):
    if name in sys.argv:
        return int(sys.argv[sys.argv.index(name) + 1])
    return default


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


def main():
    CHUNK_F = 8
    n_frames = arg("--frames", 192)
    kf_cap = arg("--kf-cap", 128)
    scene = synthetic.Rendered3DScene(width=640, height=480, t_loop=180,
                                      fx=450.0, fy=450.0, n_points=16000)
    cam = Camera.create(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                        width=640, height=480)
    ex = ORBExtractor(480, 640, n_features=2000)
    cfg = tracking.TrackingConfig(
        kf_cap=kf_cap, pt_cap=16384, feat_cap=ex.capacity,
        local_kf=8, local_pts=4096,
        ba_free=8, ba_fixed=8, ba_pts=4096, ba_obs=8,
        tri_neighbors=4, max_new_points=512,
        enable_loop_closing=True, vocab_words=1024,
        vocab_retrain_every=24)
    tr = tracking.Tracker(cam, cfg)
    tr.extractor = ex

    images = np.stack([scene.frame(i) for i in range(n_frames)]
                      ).astype(np.uint8)
    ts = np.arange(n_frames) / 30.0

    i = 0
    while tr.state != tracking.OK and i < 16:
        feats = frame_mod.undistort(cam, ex(jnp.asarray(
            images[i], jnp.float32)))
        tr.process_frame(feats, i, float(ts[i]))
        i += 1
    assert tr.state == tracking.OK, "bootstrap failed"
    print(f"bootstrapped at frame {i}")

    while i + CHUNK_F <= n_frames:
        fids = np.arange(i, i + CHUNK_F)
        t0 = time.perf_counter()
        if tr.state == tracking.OK:
            tracked = tr.process_image_chunk(
                jnp.asarray(images[i:i + CHUNK_F]), fids,
                ts[i:i + CHUNK_F])
            n_trk = int(np.asarray(tracked).sum())
        else:
            n_trk = 0
            for j in range(CHUNK_F):
                feats = frame_mod.undistort(cam, ex(jnp.asarray(
                    images[i + j], jnp.float32)))
                ok = tr.process_frame(feats, int(fids[j]),
                                      float(ts[i + j]))
                n_trk += int(bool(ok))
        dt = time.perf_counter() - t0
        n_kf = int(np.asarray(tr.store.kf_valid).sum())
        n_pt = int(np.asarray(tr.store.pt_valid).sum())
        lc = tr.loop_closer
        n_loops = len(lc.state.loop_edges) if lc is not None else 0
        n_groups = len(lc.state.groups) if lc is not None else 0
        print(f"f{i:3d}: trk={n_trk}/{CHUNK_F} state={tr.state} "
              f"kf={n_kf}/{kf_cap} pt={n_pt} n_in={tr.n_last_inliers} "
              f"loops={n_loops} groups={n_groups} {dt*1e3:6.0f} ms",
              flush=True)
        i += CHUNK_F

    est, gt = [], []
    for fid, _, Tcw in tr.corrected_trajectory():
        est.append(np.asarray(se3.camera_center(jnp.asarray(Tcw))))
        gt.append(scene.gt_center(int(fid)))
    ate = umeyama_ate(np.stack(est), np.stack(gt))
    print(f"ATE={ate:.4f} m over {len(est)} poses; "
          f"loops={len(tr.loop_closer.state.loop_edges) if tr.loop_closer else 0}")


if __name__ == "__main__":
    main()
