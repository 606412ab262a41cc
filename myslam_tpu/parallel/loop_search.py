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


def shard_database(db: KeyFrameDatabase, mesh: Mesh, axis: str = None):
    """Pad the row axis to the mesh size and shard rows across devices."""
    axis = axis or mesh.axis_names[0]
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


def padded_rows(kf_cap: int, mesh: Mesh, axis: str = None) -> int:
    """Row count for a database that shards evenly over the mesh axis."""
    axis = axis or mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    return ((kf_cap + n_dev - 1) // n_dev) * n_dev


def create_sharded_database(kf_cap: int, n_words: int, mesh: Mesh,
                            axis: str = None) -> KeyFrameDatabase:
    """An empty database whose rows live sharded across the mesh from the
    start; .add/.erase scatters preserve the sharding, so the wide
    [K, words] tf-idf matrix (65k words with an imported vocabulary) never
    materializes on one device."""
    axis = axis or mesh.axis_names[0]
    db = KeyFrameDatabase.create(padded_rows(kf_cap, mesh, axis), n_words)
    sh = NamedSharding(mesh, P(axis))
    return KeyFrameDatabase(
        bow=jax.device_put(db.bow, sh),
        has=jax.device_put(db.has, sh),
        valid=jax.device_put(db.valid, sh))


def make_sharded_scores(mesh: Mesh, axis: str = None):
    """Build a jitted sharded query with the SAME contract as
    vocabulary.query_database: (db, query_vec [W]) -> (scores [K],
    common_words [K]) over ALL rows. Each device scores its local row
    slice of the sharded database; the tiny [K] result vectors are
    all-gathered. This is the drop-in query behind LoopCloser.detect /
    relocalization.detect_candidates when a mesh is configured
    (reference role: KeyFrameDatabase::DetectLoopCandidates /
    DetectRelocalizationCandidates, src/KeyFrameDatabase.cc:76-311)."""

    axis = axis or mesh.axis_names[0]

    def local_part(bow, has, valid, q):
        scores = 1.0 - 0.5 * jnp.sum(jnp.abs(bow - q[None, :]), axis=-1)
        common = jnp.sum(has & (q > 0.0)[None, :], axis=-1).astype(jnp.int32)
        scores = jnp.where(valid, scores, -1.0)
        common = jnp.where(valid, common, 0)
        s_all = jax.lax.all_gather(scores, axis).reshape(-1)
        c_all = jax.lax.all_gather(common, axis).reshape(-1)
        return s_all, c_all

    fn = jax.shard_map(
        local_part, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P()), check_vma=False)

    @jax.jit
    def query(db: KeyFrameDatabase, q):
        return fn(db.bow, db.has, db.valid, q)

    return query


def make_sharded_query(mesh: Mesh, axis: str = None, top_k: int = 8):
    """Build a jitted sharded query:
    (db, query_vec [W], exclude_mask [K]) -> (scores [top_k], ids [top_k]).

    Scores are the L1 BoW similarity the reference's vocabulary scoring
    uses (DBoW2 ScoringObject.cpp L1Scoring); exclude_mask marks
    covisible keyframes the detector must skip
    (src/KeyFrameDatabase.cc:84-106).
    """

    axis = axis or mesh.axis_names[0]

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
