"""Concurrent SLAM sessions sharded across a device mesh.

BASELINE.json config 5 asks for concurrent sessions (e.g. KITTI 00 + 05)
with keyframes/map blocks partitioned across hosts. The reference is a
single-session, single-process system — this is greenfield TPU design:
each session's whole state (its MapStore arena + tracking state) lives on
one shard of a `jax.sharding.Mesh`, and the fused per-frame step
(slam/fused.py) runs inside `shard_map`, so S sessions advance in ONE
collective-free device program per frame batch. Sessions never exchange
data (separate maps), so scaling is embarrassingly parallel over ICI —
the measured scaling-efficiency configuration.

Usage:
    ms = MultiSession(cam, cfg, mesh, n_sessions=8)
    states = ms.stack([state0, state1, ...])      # host TrackStates
    states, infos = ms.step(states, feats_stacked, ts)   # all sessions
    one = ms.unstack(states, i)                   # pull a session out
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geom.projection import Camera
from ..slam.fused import FusedTracker, TrackState
from ..slam.tracking import TrackingConfig


class MultiSession:
    def __init__(self, cam: Camera, cfg: TrackingConfig, mesh: Mesh,
                 n_sessions: int, axis: str = "session",
                 extractor=None):
        if n_sessions % mesh.shape[axis]:
            raise ValueError(
                f"n_sessions ({n_sessions}) must be a multiple of the "
                f"mesh axis size ({mesh.shape[axis]})")
        self.mesh = mesh
        self.axis = axis
        self.n_sessions = n_sessions
        self.fused = FusedTracker(cam, cfg, extractor=extractor)
        self._step = self._build(self.fused._build_step())
        self._img_step = (self._build(self._image_step_fn())
                          if extractor is not None else None)

    def _image_step_fn(self):
        step = self.fused._build_step()
        extract = self.fused.extractor._build()
        cam = self.fused.cam
        from ..geom import projection

        def img_step(state, img, ts, fid):
            feats = extract(img)
            und = projection.undistort_points(cam, feats.xy_raw)
            feats = feats.replace(
                xy=jnp.where(feats.valid[:, None], und, 0.0))
            return step(state, feats, ts, fid)

        return img_step

    def _build(self, step_fn):
        mesh, axis = self.mesh, self.axis

        def per_shard(states, *xs):
            # local leading dim = sessions-per-device; lax.map keeps the
            # keyframe lax.cond intact per session (vmap would turn it
            # into a both-branches select)
            return jax.lax.map(lambda a: step_fn(*a), (states,) + xs)

        sharded = jax.shard_map(
            per_shard, mesh=mesh,
            in_specs=P(axis), out_specs=P(axis), check_vma=False)
        return jax.jit(sharded)

    # ------------------------------------------------------------------
    def stack(self, states) -> TrackState:
        """Stack per-session TrackStates along a leading session axis and
        place them sharded across the mesh."""
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        sh = NamedSharding(self.mesh, P(self.axis))
        return jax.tree.map(lambda x: jax.device_put(x, sh), stacked)

    def unstack(self, states: TrackState, i: int) -> TrackState:
        return jax.tree.map(lambda x: x[i], states)

    def _frame_ids(self, states, frame_ids):
        """Per-session REAL frame ids (src/Tracking.cc:984-1068 keyframe
        gap rules); default = each session's running counter."""
        if frame_ids is None:
            return states.frame_id
        return jnp.asarray(frame_ids, jnp.int32)

    def step(self, states, feats_stacked, timestamps, frame_ids=None):
        """Advance every session by one frame. feats_stacked has a leading
        [S] axis; timestamps [S]."""
        return self._step(states, feats_stacked,
                          jnp.asarray(timestamps, jnp.float32),
                          self._frame_ids(states, frame_ids))

    def step_images(self, states, images, timestamps, frame_ids=None):
        """Extraction + tracking for every session ([S, H, W] images)."""
        return self._img_step(states, jnp.asarray(images, jnp.float32),
                              jnp.asarray(timestamps, jnp.float32),
                              self._frame_ids(states, frame_ids))
