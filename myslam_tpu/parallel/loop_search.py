"""Sharded loop-closure candidate search over a device mesh.

BASELINE.json asks for "sharding loop-closure candidate search": at pod
scale the keyframe BoW database ([KF_cap, W] tf-idf rows) outgrows one
chip, so the database rows shard across the mesh and a query scores its
local slice on every device; the tiny per-device top-k results are
all-gathered and reduced. Communication: one all_gather of [devices, k]
scores+ids per query — bytes, not megabytes.

The reference's equivalent is the single-threaded inverted-file walk in
KeyFrameDatabase::DetectLoopCandidates (src/KeyFrameDatabase.cc:76-197);
the shared-word accumulation becomes a dense masked similarity reduction
over the sharded row axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..matching.vocabulary import KeyFrameDatabase


def shard_database(db: KeyFrameDatabase, mesh: Mesh, axis: str = "kf"):
    """Pad the row axis to the mesh size and shard rows across devices."""
    n_dev = mesh.shape[axis]
    K = db.bow.shape[0]
    pad = (-K) % n_dev
    bow = jnp.pad(db.bow, ((0, pad), (0, 0)))
    has = jnp.pad(db.has, ((0, pad), (0, 0)))
    valid = jnp.pad(db.valid, (0, pad))
    sh = NamedSharding(mesh, P(axis))
    return KeyFrameDatabase(
        bow=jax.device_put(bow, sh),
        has=jax.device_put(has, sh),
        valid=jax.device_put(valid, sh))


def make_sharded_query(mesh: Mesh, axis: str = "kf", top_k: int = 8):
    """Build a jitted sharded query:
    (db, query_vec [W], exclude_mask [K]) -> (scores [top_k], ids [top_k]).

    Scores are the L1 BoW similarity the reference's vocabulary scoring
    uses (DBoW2 ScoringObject.cpp L1Scoring); exclude_mask marks
    covisible keyframes the detector must skip
    (src/KeyFrameDatabase.cc:84-106).
    """

    def local_part(bow, valid, q, excl):
        # L1 similarity on each local row: 2 - |v1 - v2|_1 with normalized
        # vectors, here equivalently sum(min) form
        sim = jnp.sum(jnp.minimum(bow, q[None, :]), axis=-1)
        sim = jnp.where(valid & ~excl, sim, -1.0)
        k = min(top_k, sim.shape[0])
        s, idx = jax.lax.top_k(sim, k)
        # local row index -> global id via the shard offset
        off = jax.lax.axis_index(axis) * sim.shape[0]
        ids = idx + off
        if k < top_k:
            s = jnp.pad(s, (0, top_k - k), constant_values=-1.0)
            ids = jnp.pad(ids, (0, top_k - k), constant_values=-1)
        # gather every shard's candidates and reduce to the global top-k
        s_all = jax.lax.all_gather(s, axis).reshape(-1)
        i_all = jax.lax.all_gather(ids, axis).reshape(-1)
        sg, order = jax.lax.top_k(s_all, top_k)
        return sg, i_all[order]

    fn = jax.shard_map(
        local_part, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(axis)),
        out_specs=(P(), P()), check_vma=False)

    @jax.jit
    def query(db: KeyFrameDatabase, q, exclude_mask):
        K = db.bow.shape[0]
        excl = exclude_mask
        if excl.shape[0] != K:
            excl = jnp.pad(excl, (0, K - excl.shape[0]))
        return fn(db.bow, db.valid, q, excl)

    return query
