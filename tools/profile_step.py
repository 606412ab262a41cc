"""Per-stage on-device timing of the fused tracking step.

Each stage is scanned ITERS times inside ONE jitted program with a
loop-carried data dependency (so XLA cannot hoist the body), then the
whole dispatch is wall-clocked: per-iteration time ~= (t_total - t_link)
/ ITERS with the ~41 ms axon link amortized away.

Usage: python tools/profile_step.py [--cpu] [--iters N]
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
from myslam_tpu.mapping import local_mapping, map_store
from myslam_tpu.slam import fused, tracking

ITERS = 32
SKIP = 0
for i, a in enumerate(sys.argv):
    if a == "--iters":
        ITERS = int(sys.argv[i + 1])
    if a == "--skip":
        SKIP = int(sys.argv[i + 1])

_STAGE_N = [0]


def timed(name, fn, *args):
    _STAGE_N[0] += 1
    if _STAGE_N[0] <= SKIP:
        return 0.0
    return _timed(name, fn, *args)


def _timed(name, fn, *args):
    """fn(*args) -> pytree; scan it ITERS times with a carried dep."""

    def body(carry, _):
        out = fn(*args, carry)
        # fold a scalar from the output back into the carry
        leaves = jax.tree.leaves(out)
        s = sum(jnp.sum(l).astype(jnp.float32) for l in leaves
                if jnp.issubdtype(l.dtype, jnp.floating))
        return carry * 0.5 + s * 1e-30, None

    run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=ITERS)[0])
    run2 = jax.jit(
        lambda c: jax.lax.scan(body, c, None, length=2 * ITERS)[0])
    c0 = jnp.float32(1e-6)
    run(c0).block_until_ready()  # compile
    run2(c0).block_until_ready()
    reps = 3
    best = best2 = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        run(c0).block_until_ready()
        best = min(best, time.perf_counter() - t0)
        t0 = time.perf_counter()
        run2(c0).block_until_ready()
        best2 = min(best2, time.perf_counter() - t0)
    # two lengths cancel the constant dispatch/link overhead exactly
    per = (best2 - best) / ITERS * 1e3
    print(f"{name:34s} {per:8.3f} ms/iter   (dispatch {best*1e3:7.1f} ms)")
    return per


def main():
    n_boot = 16
    seq = synthetic.ImageSequence(width=640, height=480,
                                  n_frames=64, step_px=2.0)
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

    i = 0
    while tr.state != tracking.OK and i < n_boot:
        img = jnp.asarray(seq.frame(i))
        feats = frame_mod.undistort(cam, ex(img))
        tr.process_frame(feats, i, i / 30.0)
        i += 1

    ft = fused.FusedTracker(cam, cfg, extractor=ex)
    state = ft.state_from(tr)
    # advance ~24 frames so the map is mid-sequence realistic
    for k in range(24):
        img = jnp.asarray(seq.frame(i + k))
        feats = frame_mod.undistort(cam, ex(img))
        state, _ = ft.step(state, feats, (i + k) / 30.0)
    jax.block_until_ready(state.Tcw)
    n_kf = int(state.store.kf_valid.sum())
    n_pt = int(state.store.pt_valid.sum())
    print(f"state: {n_kf} KFs, {n_pt} points")

    img = jnp.asarray(seq.frame(i + 30), dtype=jnp.float32)
    feats = frame_mod.undistort(cam, ex(img))
    jax.block_until_ready(feats.xy)
    store = state.store
    bf = float(cfg.bf)

    # ---- full step ----
    step = ft._build_step()

    def full_step(c):
        st2, info = step(state, feats.replace(
            xy=feats.xy + c * 1e-30), i + 30.0, jnp.int32(i + 30))
        return (st2.Tcw, info["n_inliers"])
    timed("full fused step", full_step)

    # same step with the keyframe branch gated OFF (frame gap too small):
    # the difference is the cost of one keyframe insertion
    def base_step(c):
        st2, info = step(state, feats.replace(
            xy=feats.xy + c * 1e-30), i + 30.0, state.last_kf_frame)
        return (st2.Tcw, info["n_inliers"])
    timed("fused step (no-KF gate)", base_step)

    # ---- extraction ----
    extract = ex._build()

    def do_extract(c):
        f = extract(img + c)
        return (f.xy, f.desc.astype(jnp.float32) * 0)
    timed("ORB extraction", do_extract)

    # ---- stages ----
    T_pred = se3.compose(state.velocity, state.Tcw)

    def mm_match(c):
        obs = tracking._motion_model_match(
            store, cam, se3.retract(T_pred, jnp.zeros(6) + c * 1e-30),
            feats, state.last_obs, state.last_level, state.last_angle)
        return (obs.astype(jnp.float32),)
    timed("motion_model_match", mm_match)

    obs_mm = tracking._motion_model_match(
        store, cam, T_pred, feats, state.last_obs, state.last_level,
        state.last_angle)

    def pose_opt_fast(c):
        T, o, n = tracking._pose_optimize(
            store, cam, se3.retract(T_pred, jnp.zeros(6) + c * 1e-30),
            feats, obs_mm, bf, escape=False)
        return (T, n.astype(jnp.float32))
    timed("pose_optimize (no escape)", pose_opt_fast)

    def pose_opt_esc(c):
        T, o, n = tracking._pose_optimize(
            store, cam, se3.retract(T_pred, jnp.zeros(6) + c * 1e-30),
            feats, obs_mm, bf, escape=True)
        return (T, n.astype(jnp.float32))
    timed("pose_optimize (escape)", pose_opt_esc)

    def harvest(c):
        pt_ids, lids, lon = tracking._local_map_harvest(
            store, jnp.where(obs_mm >= 0, obs_mm, -1) + (c * 1e-30).astype(jnp.int32),
            cfg.local_kf, cfg.local_pts)
        return (pt_ids.astype(jnp.float32),)
    timed("local_map_harvest", harvest)

    pt_ids, _, _ = tracking._local_map_harvest(
        store, obs_mm, cfg.local_kf, cfg.local_pts)

    def lm_match(c):
        merged, vis = tracking._local_map_match(
            store, cam, se3.retract(state.Tcw, jnp.zeros(6) + c * 1e-30),
            feats, obs_mm, pt_ids)
        return (merged.astype(jnp.float32),)
    timed("local_map_match", lm_match)

    def bump(c):
        s2 = map_store.bump_counters(
            store, pt_ids, jnp.where(obs_mm >= 0, obs_mm, -1))
        return (s2.pt_visible.astype(jnp.float32) + c * 1e-30,)
    timed("bump_counters", bump)

    # derived structures
    def inc(c):
        B = map_store.incidence(store)
        return (B.astype(jnp.float32) + c * 1e-30,)
    timed("incidence [K,P]", inc)

    def cov(c):
        W = map_store.covisibility(store)
        return (W.astype(jnp.float32) + c * 1e-30,)
    timed("covisibility [K,K]", cov)

    def ocnt(c):
        o = map_store.observation_count(store)
        return (o.astype(jnp.float32) + c * 1e-30,)
    timed("observation_count [P]", ocnt)

    # ---- keyframe branch internals ----
    from myslam_tpu.optim import ba as ba_mod

    def cull(c):
        s2 = local_mapping.cull_points(store, state.ref_kf)
        return (s2.pt_valid.astype(jnp.float32) + c * 1e-30,)
    timed("cull_points", cull)

    nb_ids, _ = local_mapping.top_covisible(store, state.ref_kf,
                                            cfg.tri_neighbors)
    nb0 = jnp.maximum(nb_ids[0], 0)

    def tri(c):
        s2 = local_mapping._triangulate_and_insert(
            store, cam, state.ref_kf, nb0 + (c * 1e-30).astype(jnp.int32),
            cfg.max_new_points, refresh=False)
        return (s2.pt_xyz,)
    timed("triangulate+insert (1 nb)", tri)

    own = store.kf_obs[state.ref_kf]

    def fuse1(c):
        s2 = local_mapping.fuse_into_keyframe(
            store, cam, nb0 + (c * 1e-30).astype(jnp.int32), own, own >= 0)
        return (s2.pt_xyz,)
    timed("fuse_into_keyframe (1 call)", fuse1)

    def refresh(c):
        s2 = map_store.refresh_point_stats(
            store, jnp.where(own >= 0, own, -1) + (c * 1e-30).astype(jnp.int32))
        return (s2.pt_desc.astype(jnp.float32),)
    timed("refresh_point_stats", refresh)

    def obs_table(c):
        a, b, o = map_store.observation_table(
            store, jnp.where(own >= 0, own, -1) + (c * 1e-30).astype(jnp.int32),
            o_max=16)
        return (a.astype(jnp.float32),)
    timed("observation_table (2048 ids)", obs_table)

    def add_kf(c):
        s2, kid = map_store.add_keyframe(
            store, se3.retract(state.Tcw, jnp.zeros(6) + c * 1e-30),
            feats, obs_mm, jnp.int32(99), jnp.float32(3.3))
        return (s2.kf_pose,)
    timed("add_keyframe", add_kf)

    def alloc(c):
        slots = map_store.allocate_points(
            store, feats.valid & (obs_mm < 0 + (c * 1e-30).astype(jnp.int32)))
        return (slots.astype(jnp.float32),)
    timed("allocate_points", alloc)

    def med_depth(c):
        m = local_mapping.scene_median_depth(
            store, state.ref_kf + (c * 1e-30).astype(jnp.int32))
        return (m,)
    timed("scene_median_depth", med_depth)

    def topcov(c):
        ids, w = local_mapping.top_covisible(
            store, state.ref_kf + (c * 1e-30).astype(jnp.int32),
            cfg.tri_neighbors)
        return (w.astype(jnp.float32),)
    timed("top_covisible", topcov)

    def build_ba(c):
        prob, ks, ps, ef, es = local_mapping.build_local_ba(
            store, state.ref_kf + (c * 1e-30).astype(jnp.int32),
            cfg.ba_free, cfg.ba_fixed, cfg.ba_pts, cfg.ba_obs)
        return (prob.kf_pose, prob.pt_xyz)
    timed("build_local_ba", build_ba)

    prob, ks, ps, ef, es = local_mapping.build_local_ba(
        store, state.ref_kf, cfg.ba_free, cfg.ba_fixed, cfg.ba_pts,
        cfg.ba_obs)

    def run_ba(c):
        p2, inl = ba_mod.bundle_adjust(
            cam, prob._replace(pt_xyz=prob.pt_xyz + c * 1e-30),
            cfg.ba_iters1, cfg.ba_iters2, o_group=cfg.ba_obs)
        return (p2.kf_pose, p2.pt_xyz)
    timed("bundle_adjust (8+12 its)", run_ba)

    def one_lm(c):
        p2 = ba_mod.run_lm(cam, prob._replace(pt_xyz=prob.pt_xyz + c * 1e-30),
                           1, use_huber=True, o_group=cfg.ba_obs)
        return (p2.kf_pose, p2.pt_xyz)
    timed("run_lm 1 iter", one_lm)

    def refine_pts(c):
        p2 = ba_mod.refine_points_only(
            cam, prob._replace(pt_xyz=prob.pt_xyz + c * 1e-30), 1,
            o_group=cfg.ba_obs)
        return (p2.pt_xyz,)
    timed("refine_points_only 1 iter", refine_pts)

    prob2, inl = ba_mod.bundle_adjust(cam, prob, 1, 1, o_group=cfg.ba_obs)

    def apply_ba(c):
        s2 = local_mapping.apply_local_ba(
            store, prob2._replace(pt_xyz=prob2.pt_xyz + c * 1e-30),
            inl, ks, ps, ef, es)
        return (s2.kf_pose,)
    timed("apply_local_ba", apply_ba)
    print("done")


if __name__ == "__main__":
    main()
