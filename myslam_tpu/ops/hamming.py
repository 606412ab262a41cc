"""Batched Hamming distance between packed binary descriptors.

TPU-native replacement for ORBmatcher::DescriptorDistance (reference
src/ORBmatcher.cc:1647-1663, the classic popcount bit-hack on 8 u32 lanes) —
but evaluated for whole [Q, C] tiles at once with
jax.lax.population_count, which the matchers mask and reduce instead of
looping. 2048x2048 descriptors = 34M popcounts, comfortably VPU-sized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_DIST = 256


@jax.jit
def hamming_matrix(desc_q, desc_c):
    """Pairwise Hamming distances.

    Args:
      desc_q: [Q, 8] uint32 query descriptors.
      desc_c: [C, 8] uint32 candidate descriptors.
    Returns: [Q, C] int32 distances in [0, 256].
    """
    x = jnp.bitwise_xor(desc_q[:, None, :], desc_c[None, :, :])
    return jnp.sum(jax.lax.population_count(x).astype(jnp.int32), axis=-1)


@jax.jit
def hamming_pairs(desc_a, desc_b):
    """Elementwise Hamming distance for aligned pairs [N, 8] x [N, 8] -> [N]."""
    x = jnp.bitwise_xor(desc_a, desc_b)
    return jnp.sum(jax.lax.population_count(x).astype(jnp.int32), axis=-1)


def best_two(dist, valid_c=None, axis=-1):
    """Best and second-best distances + best index along candidates.

    Masked candidates get MAX_DIST+1 so they never win. Used for the
    reference's ratio tests (mfNNratio, src/ORBmatcher.cc:84-117)."""
    if valid_c is not None:
        big = jnp.asarray(MAX_DIST + 1, dist.dtype)
        dist = jnp.where(valid_c, dist, big)
    neg = -dist
    top2, idx2 = jax.lax.top_k(neg, 2)
    return -top2[..., 0], -top2[..., 1], idx2[..., 0]
