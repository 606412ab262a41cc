"""Divergence hunt: run each map-surgery / matching op on the SAME
mid-sequence state on BOTH the TPU and host CPU backends and report the
max deviation. The op that corrupts the map on TPU shows up here.

Usage: python tools/tpu_vs_cpu_ops.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from myslam_tpu.features.extractor import ORBExtractor
from myslam_tpu.features import frame as frame_mod
from myslam_tpu.geom.projection import Camera
from myslam_tpu.geom import se3
from myslam_tpu.io import synthetic
from myslam_tpu.mapping import local_mapping, map_store
from myslam_tpu.slam import fused, tracking

CPU = jax.local_devices(backend="cpu")[0]
TPU = jax.devices()[0]
print("backends:", TPU.platform, CPU.platform)


def to_dev(tree, dev):
    return jax.tree.map(lambda x: jax.device_put(np.asarray(x), dev), tree)


def cmp(name, fn, *args):
    """Run fn on both devices, compare all float/int leaves."""
    out_t = jax.tree.map(np.asarray, fn(*to_dev(args, TPU)))
    out_c = jax.tree.map(np.asarray, fn(*to_dev(args, CPU)))
    lt, lc = jax.tree.leaves(out_t), jax.tree.leaves(out_c)
    worst = 0.0
    n_int_diff = 0
    for a, b in zip(lt, lc):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype == np.bool_ or np.issubdtype(a.dtype, np.integer):
            n_int_diff += int((a != b).sum())
        else:
            d = np.abs(a.astype(np.float64) - b.astype(np.float64))
            scale = np.maximum(np.abs(b.astype(np.float64)), 1.0)
            worst = max(worst, float((d / scale).max()) if d.size else 0.0)
    print(f"{name:34s} max_rel_f={worst:.3e}  int_mismatches={n_int_diff}")


def main():
    # build a mid-sequence state on CPU (authoritative geometry)
    seq = synthetic.ImageSequence(width=640, height=480, n_frames=64,
                                  step_px=2.0)
    cam = Camera.create(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                        width=640, height=480)
    ex = ORBExtractor(480, 640, n_features=2000)
    cfg = tracking.TrackingConfig(
        kf_cap=64, pt_cap=16384, feat_cap=ex.capacity,
        local_kf=8, local_pts=4096,
        ba_free=8, ba_fixed=8, ba_pts=4096, ba_obs=8,
        tri_neighbors=4, max_new_points=512,
        enable_loop_closing=False)
    with jax.default_device(CPU):
        tr = tracking.Tracker(cam, cfg)
        i = 0
        while tr.state != tracking.OK and i < 16:
            img = jnp.asarray(seq.frame(i))
            feats = frame_mod.undistort(cam, ex(img))
            tr.process_frame(feats, i, i / 30.0)
            i += 1
        ft = fused.FusedTracker(cam, cfg, extractor=ex)
        state = ft.state_from(tr)
        for k in range(24):
            img = jnp.asarray(seq.frame(i + k))
            feats = frame_mod.undistort(cam, ex(img))
            state, _ = ft.step(state, feats, (i + k) / 30.0)
        feats = frame_mod.undistort(cam, ex(jnp.asarray(seq.frame(i + 30))))
    store = jax.tree.map(np.asarray, state.store)
    feats = jax.tree.map(np.asarray, feats)
    n_kf = int(store.kf_valid.sum())
    print(f"state: {n_kf} KFs, {int(store.pt_valid.sum())} pts")

    bf = float(cfg.bf)
    T_pred = np.asarray(se3.compose(state.velocity, state.Tcw))
    last_obs = np.asarray(state.last_obs)
    last_level = np.asarray(state.last_level)
    last_angle = np.asarray(state.last_angle)

    # ---- per-frame stages ----
    cmp("motion_model_match",
        lambda s, T, f, lo, ll, la: tracking._motion_model_match(
            s, cam, T, f, lo, ll, la),
        store, T_pred, feats, last_obs, last_level, last_angle)

    with jax.default_device(CPU):
        obs_mm = np.asarray(tracking._motion_model_match(
            to_dev(store, CPU), cam, to_dev(T_pred, CPU),
            to_dev(feats, CPU), to_dev(last_obs, CPU),
            to_dev(last_level, CPU), to_dev(last_angle, CPU)))

    cmp("pose_optimize",
        lambda s, T, f, o: tracking._pose_optimize(
            s, cam, T, f, o, bf, escape=True),
        store, T_pred, feats, obs_mm)

    cmp("local_map_harvest",
        lambda s, o: tracking._local_map_harvest(
            s, o, cfg.local_kf, cfg.local_pts),
        store, obs_mm)

    with jax.default_device(CPU):
        pt_ids, _, _ = tracking._local_map_harvest(
            to_dev(store, CPU), to_dev(obs_mm, CPU),
            cfg.local_kf, cfg.local_pts)
        pt_ids = np.asarray(pt_ids)

    cmp("local_map_match",
        lambda s, T, f, o, p: tracking._local_map_match(
            s, cam, T, f, o, p),
        store, T_pred, feats, obs_mm, pt_ids)

    # ---- map-surgery stages ----
    cmp("incidence", map_store.incidence, store)
    cmp("covisibility", map_store.covisibility, store)
    cmp("observation_count", map_store.observation_count, store)
    cmp("observation_table(all pts)",
        lambda s: map_store.observation_table(
            s, jnp.arange(s.pt_cap), 8), store)
    own = store.kf_obs[int(np.asarray(state.ref_kf))]
    cmp("refresh_point_stats",
        lambda s, o: map_store.refresh_point_stats(
            s, jnp.where(o >= 0, o, -1)), store, own)
    cmp("cull_points",
        lambda s: local_mapping.cull_points(
            s, int(np.asarray(state.ref_kf))), store)

    ref_kf = int(np.asarray(state.ref_kf))
    nb_ids, _ = local_mapping.top_covisible(
        to_dev(store, CPU), ref_kf, cfg.tri_neighbors)
    nb0 = int(np.maximum(np.asarray(nb_ids)[0], 0))
    cmp("top_covisible",
        lambda s: local_mapping.top_covisible(s, ref_kf,
                                              cfg.tri_neighbors), store)
    cmp("triangulate_and_insert",
        lambda s: local_mapping._triangulate_and_insert(
            s, cam, ref_kf, nb0, cfg.max_new_points, refresh=False),
        store)
    cmp("fuse_into_keyframe",
        lambda s, o: local_mapping.fuse_into_keyframe(
            s, cam, nb0, o, o >= 0), store, own)

    from myslam_tpu.optim import ba as ba_mod
    with jax.default_device(CPU):
        prob, ks, ps, ef, es = local_mapping.build_local_ba(
            to_dev(store, CPU), ref_kf, cfg.ba_free, cfg.ba_fixed,
            cfg.ba_pts, cfg.ba_obs)
        prob = jax.tree.map(np.asarray, prob)
    cmp("build_local_ba",
        lambda s: local_mapping.build_local_ba(
            s, ref_kf, cfg.ba_free, cfg.ba_fixed, cfg.ba_pts,
            cfg.ba_obs)[0], store)
    cmp("bundle_adjust chi2 relabel",
        lambda p: ba_mod.edge_chi2_depth(cam, p, o_group=cfg.ba_obs),
        prob)
    cmp("bundle_adjust (8+12)",
        lambda p: ba_mod.bundle_adjust(cam, p, 8, 12,
                                       o_group=cfg.ba_obs), prob)
    print("done")


if __name__ == "__main__":
    main()
