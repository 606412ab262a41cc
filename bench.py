"""Benchmark: end-to-end monocular SLAM frames/s per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The pipeline benched is the reference's per-frame hot path (ORB
extraction at the production config of slam_cfg/config.yaml — 640x480,
2000 features, 8 levels — plus motion-model tracking, pose optimization,
local-map tracking and keyframe mapping with local Schur BA; SURVEY.md
§3.2). It runs in the framework's production mode: the ENTIRE per-frame
step is one fused device program (slam/fused.py) scanned over chunks of
frames, so the host syncs once per chunk. Baseline: the reference's
upstream-documented ~30 ms/frame tracking on a desktop CPU (BASELINE.md,
~33 fps).

Runs on whatever platform JAX defaults to (the real TPU chip under the
driver; pass --cpu to force host CPU).

--full: the FULL pipeline — loop closing enabled, on a rendered 3D orbit
sequence with a genuine revisit (io/synthetic.Rendered3DScene) — through
Tracker.process_image_chunk (extraction + tracking on device, host
keyframe events incl. loop closing at chunk boundaries). Prints ONE JSON
line carrying BOTH fps and the similarity-aligned ATE, so throughput work
cannot silently regress accuracy. The reference never narrows its
pipeline for measurement (LocalMapping::Run always executes the full
loop, src/LocalMapping.cc:48-113) — this mode is the honest comparison.
"""

import json
import os
import sys
import time

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

BASELINE_FPS = 33.0  # reference tracking thread, desktop CPU (BASELINE.md)
CHUNK = 16
N_CHUNKS = 6
WARM_CHUNKS = 2


def _umeyama_ate(est, gt):
    """Similarity-aligned RMSE between [N,3] trajectories (monocular
    trajectories are up to scale; TUM evaluation practice)."""
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


def main_full():
    """Full-pipeline bench: fps + ATE from one run."""
    import time

    import jax.numpy as jnp

    from myslam_tpu.features.extractor import ORBExtractor
    from myslam_tpu.features import frame as frame_mod
    from myslam_tpu.geom.projection import Camera
    from myslam_tpu.geom import se3
    from myslam_tpu.io import synthetic
    from myslam_tpu.slam import tracking

    CHUNK_F = 8
    # 2 deg/frame orbit (TUM-like angular rate); the full revolution
    # revisits the start so loop closing genuinely fires
    scene = synthetic.Rendered3DScene(width=640, height=480, t_loop=180,
                                      fx=450.0, fy=450.0, n_points=16000)
    n_frames = 192  # t_loop + revisit margin
    cam = Camera.create(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                        width=640, height=480)
    ex = ORBExtractor(480, 640, n_features=2000)
    # kf_cap 128: a 192-frame 360-degree orbit needs ~60-90 keyframes of
    # coverage; 64 saturated the arena mid-orbit (insertion starved, map
    # froze, tracking lost before the revisit)
    cfg = tracking.TrackingConfig(
        kf_cap=128, pt_cap=16384, feat_cap=ex.capacity,
        local_kf=8, local_pts=4096,
        ba_free=8, ba_fixed=8, ba_pts=4096, ba_obs=8,
        tri_neighbors=4, max_new_points=512,
        enable_loop_closing=True, vocab_words=1024,
        vocab_retrain_every=24)
    tr = tracking.Tracker(cam, cfg)
    tr.extractor = ex

    # render + stage everything up front (dataset IO is not the metric)
    images = np.stack([scene.frame(i) for i in range(n_frames)]
                      ).astype(np.uint8)
    ts = np.arange(n_frames) / 30.0

    # host-paced bootstrap
    i = 0
    while tr.state != tracking.OK and i < 16:
        feats = frame_mod.undistort(cam, ex(jnp.asarray(
            images[i], jnp.float32)))
        tr.process_frame(feats, i, float(ts[i]))
        i += 1
    assert tr.state == tracking.OK, "bootstrap failed"

    staged = []
    while i + CHUNK_F <= n_frames:
        staged.append((jax.device_put(images[i:i + CHUNK_F]),
                       np.arange(i, i + CHUNK_F), ts[i:i + CHUNK_F]))
        i += CHUNK_F
    jax.block_until_ready([s[0] for s in staged])

    # warm the compile caches with the first chunk replayed
    t0 = time.perf_counter()
    tr.process_image_chunk(*staged[0])
    warm = time.perf_counter() - t0

    chunk_times = []
    n_frames_timed = 0
    n_lost_chunks = 0
    for imgs, fids, tss in staged[1:]:
        t0 = time.perf_counter()
        if tr.state == tracking.OK:
            tracked = tr.process_image_chunk(imgs, fids, tss)
            if not tracked.all():
                n_lost_chunks += 1
                print(f"# chunk {int(fids[0])}: tracked "
                      f"{int(tracked.sum())}/{len(fids)}, state={tr.state}",
                      file=sys.stderr)
        else:
            # lost mid-run: per-frame relocalization until OK again
            # (the recovery cost counts against the fps, as it should)
            for j in range(len(fids)):
                feats = frame_mod.undistort(cam, ex(jnp.asarray(
                    imgs[j], jnp.float32)))
                tr.process_frame(feats, int(fids[j]), float(tss[j]))
        chunk_times.append(time.perf_counter() - t0)
        n_frames_timed += len(fids)
    total = sum(chunk_times)
    fps = n_frames_timed / total

    est, gt = [], []
    for fid, _, Tcw in tr.corrected_trajectory():
        est.append(np.asarray(se3.camera_center(jnp.asarray(Tcw))))
        gt.append(scene.gt_center(int(fid)))
    ate = _umeyama_ate(np.stack(est), np.stack(gt))
    n_loops = (len(tr.loop_closer.state.loop_edges)
               if tr.loop_closer is not None else 0)
    line = {
        "metric": "slam_full_pipeline_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "ate_rmse_m": round(ate, 4),
        "frames": int(n_frames_timed),
        "loop_closures": int(n_loops),
    }
    print(json.dumps(line))
    # tracked artifact so loop-closing + ATE can't silently regress
    # between rounds (VERDICT r4 #2); reference measurement practice:
    # mono_tum.cc:112-121 records per-run tracking stats
    import platform as _platform
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "FULLBENCH.json"), "w") as f:
        json.dump({**line,
                   "platform": jax.devices()[0].platform,
                   "host": _platform.node()}, f, indent=1)
        f.write("\n")


def main():
    import jax.numpy as jnp

    from myslam_tpu.features.extractor import ORBExtractor
    from myslam_tpu.features import frame as frame_mod
    from myslam_tpu.geom.projection import Camera
    from myslam_tpu.io import synthetic
    from myslam_tpu.slam import fused, tracking

    n_frames = CHUNK * N_CHUNKS + 16
    seq = synthetic.ImageSequence(width=640, height=480,
                                  n_frames=n_frames + 2, step_px=2.0)
    cam = Camera.create(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                        width=640, height=480)
    ex = ORBExtractor(480, 640, n_features=2000)
    cfg = tracking.TrackingConfig(
        kf_cap=64, pt_cap=16384, feat_cap=ex.capacity,
        local_kf=8, local_pts=4096,
        ba_free=8, ba_fixed=8, ba_pts=4096, ba_obs=8,
        tri_neighbors=4, max_new_points=512,
        enable_loop_closing=False)
    tr = tracking.Tracker(cam, cfg)

    # host-paced bootstrap (two-view init), then switch to fused chunks
    i = 0
    while tr.state != tracking.OK and i < 16:
        img = jnp.asarray(seq.frame(i))
        feats = frame_mod.undistort(cam, ex(img))
        tr.process_frame(feats, i, i / 30.0)
        i += 1

    ft = fused.FusedTracker(cam, cfg, extractor=ex)
    state = ft.state_from(tr)

    # stage inputs on device as uint8 (a real deployment feeds frames over
    # local PCIe/DMA; the bench link is a WAN tunnel) — tracking fps is the
    # compute metric
    staged = []
    for c in range(N_CHUNKS):
        imgs = np.stack(
            [seq.frame(i + c * CHUNK + k) for k in range(CHUNK)]
        ).astype(np.uint8)
        ts = (i + c * CHUNK + np.arange(CHUNK)) / 30.0
        staged.append((jax.device_put(imgs), ts))
    jax.block_until_ready([s[0] for s in staged])

    chunk_times = []
    for imgs, ts in staged:
        t0 = time.perf_counter()
        state, info = ft.run_images(state, imgs, ts)
        jax.block_until_ready(state.Tcw)
        chunk_times.append(time.perf_counter() - t0)

    steady = sorted(chunk_times[WARM_CHUNKS:])
    med = steady[len(steady) // 2] / CHUNK
    fps = 1.0 / med
    print(json.dumps({
        "metric": "slam_tracking_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    if "--full" in sys.argv:
        main_full()
    else:
        main()
