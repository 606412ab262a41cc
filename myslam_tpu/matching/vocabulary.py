"""Bag-of-words place recognition as dense array ops.

TPU-native replacement for DBoW2 (reference Thirdparty/DBoW2/
TemplatedVocabulary.h: k-ary tree vocabulary, BowVector/FeatureVector,
L1 scoring) and the KeyFrameDatabase inverted file
(src/KeyFrameDatabase.cc:33-197).

Design differences, deliberate:
- The vocabulary is FLAT: K binary word centroids [K, 8]u32. Assignment is
  one [N, K] XOR+popcount tile + argmin — at K=4096, N=2048 that is ~8M
  popcounts, cheaper on TPU than a 6-level tree descent with its serial
  gathers. (The reference's tree exists to make CPU assignment O(k·L)
  instead of O(K); a dense tile is the TPU equivalent.)
- No FeatureVector / node-level match acceleration: matchers already run
  full distance tiles (see matcher.py), which is what the FeatureVector
  was approximating.
- The database is a dense [KF_cap, K] tf-idf matrix + a [KF_cap, K] bool
  word-presence matrix; queries are one broadcast L1-score and one
  shared-word popcount matmul over ALL keyframes at once — the inverted
  file without the pointers. This is also the unit that shards over a
  device mesh for multi-host loop-candidate search (SURVEY.md §5.8).
- Training: binary k-means (majority bit vote) on descriptors sampled from
  the running sequence instead of a pretrained 1M-word ORB vocab file.
  `train_vocabulary` is deterministic given its seed.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import hamming


class Vocabulary(NamedTuple):
    words: jnp.ndarray   # [K, 8] uint32 centroids
    idf: jnp.ndarray     # [K] f32 inverse document frequency weights


def _unpack_bits(desc_u32):
    """[N, 8]u32 -> [N, 256] float bits."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc_u32[..., None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(desc_u32.shape[0], -1).astype(jnp.float32)


def _pack_bits(bits):
    """[K, 256] {0,1} -> [K, 8]u32."""
    b = bits.reshape(bits.shape[0], 8, 32).astype(jnp.uint32)
    w = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(b * w, axis=-1, dtype=jnp.uint32)


@partial(jax.jit, static_argnames=("n_words", "iters"))
def _kmeans_binary(desc, valid, key, n_words: int, iters: int):
    n = desc.shape[0]
    init_idx = jax.random.choice(key, n, (n_words,), replace=n < n_words)
    centroids = desc[init_idx]

    def step(carry, _):
        cents, _assign = carry
        d = hamming.hamming_matrix(desc, cents)  # [N, K]
        d = jnp.where(valid[:, None], d, hamming.MAX_DIST + 1)
        assign = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(assign, n_words, dtype=jnp.float32)
        onehot = onehot * valid[:, None]
        counts = jnp.sum(onehot, axis=0)  # [K]
        bit_sums = onehot.T @ _unpack_bits(desc)  # [K, 256]
        maj = bit_sums * 2.0 > counts[:, None]
        new_cents = _pack_bits(maj)
        # Keep old centroid for empty clusters.
        new_cents = jnp.where((counts > 0)[:, None], new_cents, cents)
        return (new_cents, assign), None

    (cents, assign), _ = jax.lax.scan(
        step, (centroids, jnp.zeros((n,), jnp.int32)), None, length=iters)
    return cents, assign


def train_vocabulary(descriptors, valid=None, n_words: int = 2048,
                     iters: int = 8, seed: int = 0) -> Vocabulary:
    """Binary k-means vocabulary from a descriptor sample.

    Replaces loading the pretrained ORB vocab text file
    (reference System.cc:65-72 / TemplatedVocabulary.h:1338): this framework
    bootstraps its vocabulary from the data it sees.
    """
    desc = jnp.asarray(descriptors)
    if valid is None:
        valid = jnp.ones((desc.shape[0],), bool)
    key = jax.random.PRNGKey(seed)
    cents, assign = _kmeans_binary(desc, valid, key, n_words, iters)
    # idf = log(N_docs / n_docs_containing_word) needs documents; with a flat
    # training sample we approximate by inverse word frequency (same role:
    # down-weight common structures, DBoW2 TemplatedVocabulary.h:1293-1306).
    counts = jnp.zeros((n_words,), jnp.float32).at[assign].add(
        valid.astype(jnp.float32))
    n_total = jnp.maximum(jnp.sum(counts), 1.0)
    idf = jnp.log(n_total / jnp.maximum(counts, 1.0))
    idf = jnp.where(counts > 0, idf, 0.0)
    return Vocabulary(words=cents, idf=idf)


@jax.jit
def assign_words(vocab: Vocabulary, desc, valid):
    """[N, 8]u32 -> word ids [N] (argmin Hamming over the flat vocabulary)."""
    d = hamming.hamming_matrix(desc, vocab.words)
    ids = jnp.argmin(d, axis=1).astype(jnp.int32)
    return jnp.where(valid, ids, -1)


@jax.jit
def bow_vector(vocab: Vocabulary, word_ids, valid):
    """L1-normalized tf-idf vector [K] (DBoW2 BowVector with L1 norm,
    TemplatedVocabulary.h:1146-1167)."""
    k = vocab.words.shape[0]
    ids = jnp.where(valid, word_ids, 0)
    tf = jnp.zeros((k,), jnp.float32).at[ids].add(valid.astype(jnp.float32))
    v = tf * vocab.idf
    return v / jnp.maximum(jnp.sum(jnp.abs(v)), 1e-9)


@jax.jit
def l1_score(v1, v2):
    """DBoW2 L1 similarity: 1 - 0.5 * |v1 - v2|_1, in [0, 1]
    (Thirdparty/DBoW2/DBoW2/ScoringObject.cpp L1Scoring::score)."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(v1 - v2), axis=-1)


class KeyFrameDatabase(NamedTuple):
    """Dense BoW database over the keyframe arena.

    bow:   [KF_cap, K] f32 tf-idf vectors (zero rows for free slots).
    has:   [KF_cap, K] bool word presence.
    valid: [KF_cap] bool.
    """

    bow: jnp.ndarray
    has: jnp.ndarray
    valid: jnp.ndarray

    @classmethod
    def create(cls, kf_capacity: int, n_words: int):
        return cls(
            bow=jnp.zeros((kf_capacity, n_words), jnp.float32),
            has=jnp.zeros((kf_capacity, n_words), bool),
            valid=jnp.zeros((kf_capacity,), bool),
        )

    def add(self, kf_id, vec):
        """Insert/overwrite a keyframe's BoW row (KeyFrameDatabase::add,
        src/KeyFrameDatabase.cc:39-46)."""
        return self._replace(
            bow=self.bow.at[kf_id].set(vec),
            has=self.has.at[kf_id].set(vec > 0.0),
            valid=self.valid.at[kf_id].set(True),
        )

    def erase(self, kf_id):
        return self._replace(
            bow=self.bow.at[kf_id].set(0.0),
            has=self.has.at[kf_id].set(False),
            valid=self.valid.at[kf_id].set(False),
        )


@jax.jit
def query_database(db: KeyFrameDatabase, vec):
    """Score a query BoW vector against every stored keyframe at once.

    Returns (scores [KF_cap], common_words [KF_cap]) — the inputs to the
    candidate-selection logic (shared-word max, 0.8x gate, accumulated group
    scores) implemented in the loop/reloc layer
    (reference KeyFrameDatabase::DetectLoopCandidates,
    src/KeyFrameDatabase.cc:76-197)."""
    scores = 1.0 - 0.5 * jnp.sum(jnp.abs(db.bow - vec[None, :]), axis=-1)
    common = jnp.sum(db.has & (vec > 0.0)[None, :], axis=-1).astype(jnp.int32)
    scores = jnp.where(db.valid, scores, -1.0)
    common = jnp.where(db.valid, common, 0)
    return scores, common
