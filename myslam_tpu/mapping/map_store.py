"""MapStore: the global map as fixed-capacity SoA arrays.

TPU-native replacement for the reference's pointer-graph map
(include/KeyFrame.h, include/MapPoint.h, include/Map.h and their mutex
web): keyframes and landmarks live in preallocated arenas with validity
masks; every structural operation (insert, observe, cull, fuse) is a pure
scatter/gather program returning a new store. There are NO mutexes — the
tracking/mapping/loop stages exchange whole map versions (SURVEY.md §5.8).

Representation:
- keyframe arena [K_cap]: pose, per-feature arrays [K_cap, F_cap], and the
  observation matrix kf_obs [K_cap, F_cap] i32 (point id per feature, -1 if
  none) — the single source of truth for the observation graph. Replaces
  KeyFrame::mvpMapPoints AND MapPoint::mObservations.
- point arena [P_cap]: position, normal, scale-invariance band,
  representative descriptor, visible/found counters, reference-KF link.
- derived structures (covisibility weights, per-point observation tables,
  BA edge lists) are COMPUTED from kf_obs by dense masked reductions; at
  SLAM scale (512 KF x 2048 feat) these are ~1M-element ops, cheaper on
  TPU than maintaining incremental adjacency (reference
  KeyFrame::UpdateConnections, src/KeyFrame.cc:289-379).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from ..geom import se3
from ..ops import hamming

NO_POINT = -1


@struct.dataclass
class MapStore:
    # --- keyframes ---
    kf_pose: jnp.ndarray       # [K, 3, 4] Tcw
    kf_valid: jnp.ndarray      # [K] bool
    kf_seq: jnp.ndarray        # [K] i32 monotone insertion number (arena
                               #   slots are reused after culling, so slot
                               #   index is NOT an age; seq is — reference
                               #   KeyFrame::mnId, include/KeyFrame.h:131)
    next_seq: jnp.ndarray      # [] i32 next sequence number
    kf_frame_id: jnp.ndarray   # [K] i32 source frame index
    kf_timestamp: jnp.ndarray  # [K] f32
    kf_xy: jnp.ndarray         # [K, F, 2] undistorted keypoint coords
    kf_level: jnp.ndarray      # [K, F] i32
    kf_angle: jnp.ndarray      # [K, F] f32
    kf_desc: jnp.ndarray       # [K, F, 8] u32
    kf_fvalid: jnp.ndarray     # [K, F] bool
    kf_obs: jnp.ndarray        # [K, F] i32 point id / NO_POINT
    kf_ur: jnp.ndarray         # [K, F] f32 stereo right column (-1 = mono
                               #   observation; KeyFrame::mvuRight,
                               #   include/KeyFrame.h:163)
    # --- points ---
    pt_xyz: jnp.ndarray        # [P, 3]
    pt_valid: jnp.ndarray      # [P] bool
    pt_normal: jnp.ndarray     # [P, 3]
    pt_desc: jnp.ndarray       # [P, 8] u32 representative descriptor
    pt_min_dist: jnp.ndarray   # [P] scale-invariance band (raw, callers
    pt_max_dist: jnp.ndarray   # [P]  apply the 0.8/1.2 margins)
    pt_ref_kf: jnp.ndarray     # [P] i32
    pt_ref_level: jnp.ndarray  # [P] i32 octave at the reference observation
    pt_first_kf: jnp.ndarray   # [P] i32 (culling rules use KF age)
    pt_visible: jnp.ndarray    # [P] i32 tracking counters
    pt_found: jnp.ndarray      # [P] i32  (MapPoint::mnVisible/mnFound)
    # spanning tree: parent arena slot per keyframe (-1 = root/unset).
    # The reference maintains this in KeyFrame::mpParent (first
    # UpdateConnections sets parent = max-weight covisible KF,
    # src/KeyFrame.cc:289-379) and repairs it on culling
    # (KeyFrame::SetBadFlag, src/KeyFrame.cc:453-545); the essential
    # graph optimizer consumes the edges (src/Optimizer.cc:846-932).
    kf_parent: jnp.ndarray     # [K] i32

    # static config
    scale: float = struct.field(pytree_node=False, default=1.2)
    n_levels: int = struct.field(pytree_node=False, default=8)

    @property
    def kf_cap(self) -> int:
        return self.kf_pose.shape[0]

    @property
    def pt_cap(self) -> int:
        return self.pt_xyz.shape[0]

    @property
    def feat_cap(self) -> int:
        return self.kf_obs.shape[1]

    @classmethod
    def create(cls, kf_cap: int = 256, pt_cap: int = 16384,
               feat_cap: int = 2048, scale: float = 1.2, n_levels: int = 8):
        f32 = jnp.float32
        return cls(
            kf_pose=jnp.tile(jnp.eye(3, 4, dtype=f32), (kf_cap, 1, 1)),
            kf_valid=jnp.zeros(kf_cap, bool),
            kf_seq=jnp.full(kf_cap, -1, jnp.int32),
            next_seq=jnp.asarray(0, jnp.int32),
            kf_frame_id=jnp.full(kf_cap, -1, jnp.int32),
            kf_timestamp=jnp.zeros(kf_cap, f32),
            kf_xy=jnp.zeros((kf_cap, feat_cap, 2), f32),
            kf_level=jnp.zeros((kf_cap, feat_cap), jnp.int32),
            kf_angle=jnp.zeros((kf_cap, feat_cap), f32),
            kf_desc=jnp.zeros((kf_cap, feat_cap, 8), jnp.uint32),
            kf_fvalid=jnp.zeros((kf_cap, feat_cap), bool),
            kf_obs=jnp.full((kf_cap, feat_cap), NO_POINT, jnp.int32),
            kf_ur=jnp.full((kf_cap, feat_cap), -1.0, f32),
            pt_xyz=jnp.zeros((pt_cap, 3), f32),
            pt_valid=jnp.zeros(pt_cap, bool),
            pt_normal=jnp.zeros((pt_cap, 3), f32),
            pt_desc=jnp.zeros((pt_cap, 8), jnp.uint32),
            pt_min_dist=jnp.zeros(pt_cap, f32),
            pt_max_dist=jnp.zeros(pt_cap, f32),
            pt_ref_kf=jnp.full(pt_cap, -1, jnp.int32),
            pt_ref_level=jnp.zeros(pt_cap, jnp.int32),
            pt_first_kf=jnp.full(pt_cap, -1, jnp.int32),
            pt_visible=jnp.zeros(pt_cap, jnp.int32),
            pt_found=jnp.zeros(pt_cap, jnp.int32),
            kf_parent=jnp.full(kf_cap, -1, jnp.int32),
            scale=scale, n_levels=n_levels,
        )

    def level_sigma2(self, levels):
        return jnp.power(jnp.float32(self.scale * self.scale),
                         levels.astype(jnp.float32))


# ---------------------------------------------------------------------------
# insertion
# ---------------------------------------------------------------------------

@jax.jit
def add_keyframe(store: MapStore, pose, feats, obs, frame_id, timestamp):
    """Insert a keyframe into the first free arena slot.

    Args:
      feats: FrameFeatures of the frame.
      obs: [F] i32 point id per feature (tracking's current associations).
    Returns (store, kf_id). If the arena is full, kf_id points at slot 0 —
    the host checks capacity (n_keyframes) before inserting.
    """
    kf_id = jnp.argmin(store.kf_valid)  # first False
    return store.replace(
        kf_pose=store.kf_pose.at[kf_id].set(pose),
        kf_valid=store.kf_valid.at[kf_id].set(True),
        kf_seq=store.kf_seq.at[kf_id].set(store.next_seq),
        next_seq=store.next_seq + 1,
        kf_frame_id=store.kf_frame_id.at[kf_id].set(frame_id),
        kf_timestamp=store.kf_timestamp.at[kf_id].set(timestamp),
        kf_xy=store.kf_xy.at[kf_id].set(feats.xy),
        kf_level=store.kf_level.at[kf_id].set(feats.level),
        kf_angle=store.kf_angle.at[kf_id].set(feats.angle),
        kf_desc=store.kf_desc.at[kf_id].set(feats.desc),
        kf_fvalid=store.kf_fvalid.at[kf_id].set(feats.valid),
        kf_obs=store.kf_obs.at[kf_id].set(
            jnp.where(feats.valid, obs, NO_POINT)),
        kf_ur=store.kf_ur.at[kf_id].set(
            jnp.full(store.feat_cap, -1.0, jnp.float32)
            if feats.u_right is None
            else jnp.where(feats.valid, feats.u_right, -1.0)),
        kf_parent=store.kf_parent.at[kf_id].set(-1),
    ), kf_id


@jax.jit
def set_parent(store: MapStore, kf_id, parent):
    """Attach a keyframe to the spanning tree (KeyFrame::ChangeParent;
    the reference picks the max-covisibility keyframe on the first
    UpdateConnections, src/KeyFrame.cc:289-379 — callers pass their best
    covisible neighbor)."""
    return store.replace(
        kf_parent=store.kf_parent.at[kf_id].set(
            jnp.asarray(parent, jnp.int32)))


@jax.jit
def allocate_points(store: MapStore, want_mask):
    """Reserve point slots: want_mask [M] bool -> slot ids [M] (NO_POINT
    where not wanted or arena exhausted)."""
    m = want_mask.shape[0]
    free_score = jnp.where(store.pt_valid, -1.0, 1.0)
    _, free_idx = jax.lax.top_k(free_score, m)  # first M free slots
    enough = jax.lax.top_k(free_score, m)[0] > 0
    rank = jnp.cumsum(want_mask.astype(jnp.int32)) - 1
    slots = jnp.where(want_mask & enough[jnp.clip(rank, 0, m - 1)],
                      free_idx[jnp.clip(rank, 0, m - 1)], NO_POINT)
    return slots


@jax.jit
def write_points(store: MapStore, slots, xyz, desc, normal, min_dist,
                 max_dist, ref_kf, ref_level, first_kf):
    """Scatter new point data into allocated slots (NO_POINT rows dropped)."""
    ok = slots >= 0
    idx = jnp.where(ok, slots, store.pt_cap)  # OOB -> dropped by mode
    at = lambda arr: arr.at[idx]
    return store.replace(
        pt_xyz=at(store.pt_xyz).set(xyz, mode="drop"),
        pt_valid=at(store.pt_valid).set(ok, mode="drop"),
        pt_normal=at(store.pt_normal).set(normal, mode="drop"),
        pt_desc=at(store.pt_desc).set(desc, mode="drop"),
        pt_min_dist=at(store.pt_min_dist).set(min_dist, mode="drop"),
        pt_max_dist=at(store.pt_max_dist).set(max_dist, mode="drop"),
        pt_ref_kf=at(store.pt_ref_kf).set(ref_kf, mode="drop"),
        pt_ref_level=at(store.pt_ref_level).set(ref_level, mode="drop"),
        pt_first_kf=at(store.pt_first_kf).set(first_kf, mode="drop"),
        pt_visible=at(store.pt_visible).set(jnp.ones_like(slots), mode="drop"),
        pt_found=at(store.pt_found).set(jnp.ones_like(slots), mode="drop"),
    )


@jax.jit
def set_observations(store: MapStore, kf_id, feat_idx, pt_idx, ok):
    """Associate features of keyframe kf_id with points: kf_obs[kf, f] = p
    for each (f, p) pair where ok (MapPoint::AddObservation +
    KeyFrame::AddMapPoint in one scatter)."""
    f = jnp.where(ok, feat_idx, store.feat_cap)
    return store.replace(
        kf_obs=store.kf_obs.at[kf_id, f].set(
            jnp.where(ok, pt_idx, NO_POINT), mode="drop"))


# ---------------------------------------------------------------------------
# derived structures
# ---------------------------------------------------------------------------

def _obs_counts_per_kf(store: MapStore):
    """[K, P] f32 observation counts per (keyframe, point).

    Factored one-hot trick: split the point id into (hi, lo) digits and
    contract the two SMALL one-hots on the MXU —
        count[k, hi, lo] = sum_f onehot_hi[k,f,hi] * onehot_lo[k,f,lo]
    The transient tensors are [K,F,sqrt(P)] bf16 (exact for 0/1) instead
    of the [K,F,P] compare tensor (~8x less memory traffic at P=16k, and
    the reduction is a matmul instead of an elementwise sum). This runs
    on the per-frame tracking path (local-map harvest), so it matters.
    """
    K, F = store.kf_obs.shape
    P = store.pt_cap
    H = 1 << max(1, (P - 1).bit_length() + 1 >> 1)   # ~sqrt(P), pow2
    L = -(-P // H)
    obs = store.kf_obs
    ok = obs >= 0
    idx = jnp.where(ok, obs, 0)
    hi = idx // L
    lo = idx - hi * L
    oh_hi = (hi[..., None] == jnp.arange(H)[None, None, :]) & ok[..., None]
    oh_lo = lo[..., None] == jnp.arange(L)[None, None, :]
    cnt = jnp.einsum("kfh,kfl->khl",
                     oh_hi.astype(jnp.bfloat16),
                     oh_lo.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return cnt.reshape(K, H * L)[:, :P]                 # [K, P]


@jax.jit
def incidence(store: MapStore):
    """B [K, P] bool: keyframe k observes point p (scatter-free)."""
    B = _obs_counts_per_kf(store) > 0
    return B & store.kf_valid[:, None] & store.pt_valid[None, :]


@jax.jit
def covisibility(store: MapStore):
    """W [K, K] i32 shared-observation counts (KeyFrame covisibility graph,
    src/KeyFrame.cc:289-379) as one incidence matmul on the MXU."""
    return covisibility_from(incidence(store))


@jax.jit
def covisibility_from(B):
    """Covisibility from a precomputed incidence matrix (the fused step
    caches B in TrackState — it only changes at keyframe events)."""
    Bf = B.astype(jnp.float32)
    # 0/1 operands, integer counts <= F: bit-exact in single-pass bf16
    W = jnp.dot(Bf, Bf.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT).astype(jnp.int32)
    return W - jnp.diag(jnp.diag(W))


@jax.jit
def observation_count(store: MapStore):
    """[P] i32 — number of keyframes observing each point (scatter-free)."""
    C = _obs_counts_per_kf(store)
    cnt = jnp.sum(C * store.kf_valid[:, None], axis=0).astype(jnp.int32)
    return jnp.where(store.pt_valid, cnt, 0)


@partial(jax.jit, static_argnames=("o_max",))
def observation_table(store: MapStore, pt_ids, o_max: int = 16):
    """Per-point observation lists for a subset of points.

    Args:
      pt_ids: [M] i32 point ids (NO_POINT rows give empty tables).
    Returns:
      obs_kf [M, o_max] i32, obs_feat [M, o_max] i32, obs_ok [M, o_max] bool
      — up to o_max (keyframe, feature) observations per point. This is the
      array form of MapPoint::GetObservations.
    """
    K, F = store.kf_obs.shape
    m = pt_ids.shape[0]
    # feat_of [K, M]: which feature of KF k observes point pt_ids[m]
    # (-1 none). Scatter-free: factored hi/lo one-hot contractions on the
    # MXU (same trick as _obs_counts_per_kf; a point is observed at most
    # once per keyframe, so summing f+1 over matches is exact):
    #   S[k,h,l] = sum_f (f+1) * onehot_hi[k,f,h] * onehot_lo[k,f,l]
    #   feat_of[k,m] = S[k, hi(pt_m), lo(pt_m)] - 1
    # and the point-side lookup is two more small one-hot contractions.
    P = store.pt_cap
    H = 1 << max(1, (P - 1).bit_length() + 1 >> 1)
    L = -(-P // H)
    obs = store.kf_obs
    ok = (obs >= 0) & store.kf_valid[:, None]
    idx = jnp.where(ok, obs, 0)
    hi = idx // L
    lo = idx - hi * L
    oh_hi = ((hi[..., None] == jnp.arange(H)[None, None, :])
             & ok[..., None]).astype(jnp.bfloat16)
    oh_lo = (lo[..., None] == jnp.arange(L)[None, None, :]
             ).astype(jnp.bfloat16)
    # the f+1 weight is split into two <=64 digits so every matmul input
    # stays exact under the TPU's bf16 matmul passes
    f1 = jnp.arange(F, dtype=jnp.float32) + 1.0
    w_hi = jnp.floor(f1 / 64.0).astype(jnp.bfloat16)[None, :, None]
    w_lo = jnp.mod(f1, 64.0).astype(jnp.bfloat16)[None, :, None]
    one = jnp.ones_like(w_hi)
    S = jnp.stack([
        jnp.einsum("kfh,kfl->khl", oh_hi * w, oh_lo,
                   preferred_element_type=jnp.float32)
        for w in (w_hi, w_lo, one)
    ])                                                   # [3, K, H, L]
    # S[2] counts occurrences: the f+1 encode is only valid for cells
    # holding exactly ONE observation. replace_points enforces that
    # invariant; this guard keeps a duplicate row (should one ever slip
    # through) from decoding to a garbage feature index instead of a
    # clean miss.
    pt_safe = jnp.where(pt_ids >= 0, pt_ids, 0)
    p_hi = pt_safe // L
    p_lo = pt_safe - p_hi * L
    ohp_hi = (p_hi[:, None] == jnp.arange(H)[None, :]).astype(jnp.float32)
    ohp_lo = (p_lo[:, None] == jnp.arange(L)[None, :]).astype(jnp.float32)
    ohp_hi = ohp_hi * (pt_ids >= 0).astype(jnp.float32)[:, None]
    D = jnp.einsum("skhl,mh->skml", S, ohp_hi,
                   preferred_element_type=jnp.float32)   # [3, K, M, L]
    fd = jnp.einsum("skml,ml->skm", D, ohp_lo,
                    preferred_element_type=jnp.float32)  # [3, K, M]
    feat_of = jnp.round(64.0 * fd[0] + fd[1]).astype(jnp.int32) - 1
    feat_of = jnp.where(jnp.round(fd[2]).astype(jnp.int32) == 1,
                        feat_of, -1)
    observed = (feat_of >= 0).astype(jnp.float32)  # [K, M]
    _, kf_sel = jax.lax.top_k(observed.T, min(o_max, K))  # [M, o]
    obs_ok = jnp.take_along_axis(observed.T, kf_sel, axis=1) > 0
    obs_feat = jnp.take_along_axis(feat_of.T, kf_sel, axis=1)
    obs_kf = jnp.where(obs_ok, kf_sel, -1)
    obs_feat = jnp.where(obs_ok, obs_feat, -1)
    return obs_kf, obs_feat, obs_ok


@partial(jax.jit, static_argnames=("o_max",))
def refresh_point_stats(store: MapStore, pt_ids, o_max: int = 16):
    """Recompute representative descriptor, mean viewing normal and the
    scale-invariance distance band for a subset of points.

    Array form of MapPoint::ComputeDistinctiveDescriptors (min-median-
    Hamming representative, src/MapPoint.cc:242-307) +
    MapPoint::UpdateNormalAndDepth (mean ray; band from the reference-KF
    octave: max = dist * scale^level, min = max / scale^(L-1),
    src/MapPoint.cc:330-371).
    """
    m = pt_ids.shape[0]
    safe_ids = jnp.clip(pt_ids, 0, store.pt_cap - 1)
    obs_kf, obs_feat, obs_ok = observation_table(store, pt_ids, o_max)
    kf_c = jnp.clip(obs_kf, 0, store.kf_cap - 1)
    ft_c = jnp.clip(obs_feat, 0, store.feat_cap - 1)

    # --- distinctive descriptor: min median Hamming among observations ---
    descs = store.kf_desc[kf_c, ft_c]                    # [M, O, 8]
    x = jnp.bitwise_xor(descs[:, :, None, :], descs[:, None, :, :])
    D = jnp.sum(jax.lax.population_count(x).astype(jnp.int32), axis=-1)
    D = jnp.where(obs_ok[:, :, None] & obs_ok[:, None, :], D, hamming.MAX_DIST + 1)
    # median over each row, restricted to valid entries: sort ascending with
    # invalid pushed to the end, take element at (n_valid-1)//2
    Ds = jnp.sort(D, axis=-1)                            # [M, O, O]
    n_valid = jnp.sum(obs_ok, axis=-1)                   # [M]
    med_idx = jnp.maximum((n_valid - 1) // 2, 0)
    med = jnp.take_along_axis(
        Ds, med_idx[:, None, None].repeat(Ds.shape[1], 1), axis=-1)[..., 0]
    med = jnp.where(obs_ok, med, hamming.MAX_DIST + 2)
    best_obs = jnp.argmin(med, axis=-1)                  # [M]
    new_desc = jnp.take_along_axis(
        descs, best_obs[:, None, None].repeat(8, 2), axis=1)[:, 0]

    # --- normal & depth band ---
    centers = se3.camera_center(store.kf_pose[kf_c])     # [M, O, 3]
    xyz = store.pt_xyz[safe_ids]                         # [M, 3]
    rays = xyz[:, None, :] - centers
    rays = rays / jnp.maximum(
        jnp.linalg.norm(rays, axis=-1, keepdims=True), 1e-9)
    rays = jnp.where(obs_ok[:, :, None], rays, 0.0)
    normal = jnp.sum(rays, axis=1) / jnp.maximum(
        n_valid[:, None].astype(jnp.float32), 1.0)

    # Reference KF may have been culled — fall back to the first observer.
    ref0 = store.pt_ref_kf[safe_ids]
    ref_alive = store.kf_valid[jnp.clip(ref0, 0, store.kf_cap - 1)] & (ref0 >= 0)
    ref_kf = jnp.where(ref_alive, ref0, obs_kf[:, 0])
    ref_kf = jnp.clip(ref_kf, 0, store.kf_cap - 1)
    ref_center = se3.camera_center(store.kf_pose[ref_kf])
    dist = jnp.linalg.norm(xyz - ref_center, axis=-1)
    lvl = store.pt_ref_level[safe_ids].astype(jnp.float32)
    max_d = dist * jnp.power(jnp.float32(store.scale), lvl)
    min_d = max_d / jnp.power(jnp.float32(store.scale),
                              jnp.float32(store.n_levels - 1))

    ok = (pt_ids >= 0) & (n_valid > 0)
    idx = jnp.where(ok, pt_ids, store.pt_cap)
    return store.replace(
        pt_desc=store.pt_desc.at[idx].set(new_desc, mode="drop"),
        pt_normal=store.pt_normal.at[idx].set(normal, mode="drop"),
        pt_min_dist=store.pt_min_dist.at[idx].set(min_d, mode="drop"),
        pt_max_dist=store.pt_max_dist.at[idx].set(max_d, mode="drop"),
    )


# ---------------------------------------------------------------------------
# removal / merging
# ---------------------------------------------------------------------------

@jax.jit
def erase_points(store: MapStore, kill_mask):
    """Delete points (MapPoint::SetBadFlag, src/MapPoint.cc:123-145): clear
    validity and strip every keyframe observation of them."""
    obs = store.kf_obs
    is_dead = kill_mask[jnp.clip(obs, 0, store.pt_cap - 1)] & (obs >= 0)
    return store.replace(
        pt_valid=store.pt_valid & ~kill_mask,
        kf_obs=jnp.where(is_dead, NO_POINT, obs),
    )


@jax.jit
def erase_keyframe(store: MapStore, kf_id):
    """Delete a keyframe (KeyFrame::SetBadFlag, src/KeyFrame.cc:453-545)
    including spanning-tree repair: children of the erased keyframe are
    re-parented onto ITS parent (the reference's fallback assignment,
    src/KeyFrame.cc:541-545 — the greedy max-covisibility candidate walk
    refines quality, but the parent hand-off alone preserves the tree
    exactly where the erased node stood, which is what the essential
    graph's connectivity needs)."""
    new_parent = store.kf_parent[kf_id]
    parents = jnp.where(store.kf_parent == kf_id, new_parent,
                        store.kf_parent)
    return store.replace(
        kf_valid=store.kf_valid.at[kf_id].set(False),
        kf_obs=store.kf_obs.at[kf_id].set(
            jnp.full(store.feat_cap, NO_POINT, jnp.int32)),
        kf_fvalid=store.kf_fvalid.at[kf_id].set(
            jnp.zeros(store.feat_cap, bool)),
        kf_ur=store.kf_ur.at[kf_id].set(
            jnp.full(store.feat_cap, -1.0, jnp.float32)),
        kf_parent=parents.at[kf_id].set(-1),
    )


@partial(jax.jit, static_argnames=("P",))
def _row_counts(rows, P: int):
    """[K, P] f32 occurrence counts of ids in each row ([K, F] i32, -1 =
    empty) — the factored hi/lo one-hot contraction of _obs_counts_per_kf
    for arbitrary row tables."""
    K, F = rows.shape
    H = 1 << max(1, (P - 1).bit_length() + 1 >> 1)
    L = -(-P // H)
    ok = rows >= 0
    idx = jnp.where(ok, rows, 0)
    hi = idx // L
    lo = idx - hi * L
    oh_hi = (hi[..., None] == jnp.arange(H)[None, None, :]) & ok[..., None]
    oh_lo = lo[..., None] == jnp.arange(L)[None, None, :]
    cnt = jnp.einsum("kfh,kfl->khl",
                     oh_hi.astype(jnp.bfloat16),
                     oh_lo.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return cnt.reshape(K, H * L)[:, :P]


@jax.jit
def replace_points(store: MapStore, old_to_new):
    """Merge points: every observation of point i is redirected to
    old_to_new[i] (identity where no merge). Array form of
    MapPoint::Replace (src/MapPoint.cc:177-215). Redirected points are
    invalidated; found/visible counters are accumulated onto the target.

    Duplicate guard (MapPoint::Replace parity): when a keyframe already
    observes the merge TARGET, the redirected observation is ERASED
    instead of redirected (the reference's IsInKeyFrame branch,
    src/MapPoint.cc:196-199) — a point must appear at most once per
    keyframe row. Without this, every merge where a row held both points
    left a duplicate, and duplicate rows silently corrupt every
    downstream per-(kf,point) structure (observation_table's factored
    encode sums feature ids over duplicates into garbage indices — the
    round-2/3 tracking-quality regression). If several redirected entries
    in one row share a target and the row has no direct entry, all are
    conservatively erased (the reference's sequential Replace keeps one;
    the lost observation is re-added by the next fuse pass)."""
    obs = store.kf_obs
    P = store.pt_cap
    mapped = jnp.where(obs >= 0,
                       old_to_new[jnp.clip(obs, 0, P - 1)], obs)
    changed = (mapped != obs) & (obs >= 0)
    direct = _row_counts(jnp.where(changed, -1, obs), P)      # [K, P]
    cnt_changed = _row_counts(jnp.where(changed, mapped, -1), P)
    bad_cell = (direct > 0) | (cnt_changed > 1)               # [K, P]
    bad_at = jnp.take_along_axis(
        bad_cell, jnp.clip(mapped, 0, P - 1), axis=1)
    mapped = jnp.where(changed & bad_at, NO_POINT, mapped)
    merged = old_to_new != jnp.arange(store.pt_cap)
    add_v = jnp.zeros(store.pt_cap, jnp.int32).at[
        jnp.where(merged, old_to_new, store.pt_cap)].add(
            jnp.where(merged, store.pt_visible, 0), mode="drop")
    add_f = jnp.zeros(store.pt_cap, jnp.int32).at[
        jnp.where(merged, old_to_new, store.pt_cap)].add(
            jnp.where(merged, store.pt_found, 0), mode="drop")
    return store.replace(
        kf_obs=mapped,
        pt_valid=store.pt_valid & ~merged,
        pt_visible=store.pt_visible + add_v,
        pt_found=store.pt_found + add_f,
    )


@jax.jit
def bump_counters(store: MapStore, visible_ids, found_ids):
    """Increase MapPoint::mnVisible / mnFound tracking counters
    (used by Tracking::SearchLocalPoints and the found-ratio culling rule,
    src/Tracking.cc:1150-1199, src/LocalMapping.cc:172-207).
    Scatter-free (per-frame hot path)."""
    from ..ops import indexing
    return store.replace(
        pt_visible=store.pt_visible + indexing.bincount_mm(
            visible_ids, store.pt_cap),
        pt_found=store.pt_found + indexing.bincount_mm(
            found_ids, store.pt_cap),
    )
