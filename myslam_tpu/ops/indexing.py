"""Gather-free indexing primitives.

On the target TPU backend, XLA gather/scatter lowers to a fixed-latency
(~26 ms) fallback REGARDLESS of size, with multi-minute cold compiles —
measured: a 2048-element gather and a 419k-element gather both cost 26 ms,
while a 2048x16384 one-hot matmul costs ~0.1 ms. Every hot-path lookup in
this framework therefore goes through these matmul/compare formulations:

- mm_gather(table, idx): one-hot-row matmul. EXACT for f32 tables — each
  output row is 1.0 * one table row, so no accumulation error.
- mm_scatter_{add,set,min}: the transposed formulation.
- The one-hots are built by iota comparison (vectorized compare), never by
  scatter.

Cost model: a gather of N ids from a P-row table moves an [N, P] one-hot
through the MXU — N=2048, P=16384 is ~0.1 ms. Use for arena-sized lookups;
for tiny tables plain compare-select is cheaper still.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def onehot(idx, size: int, dtype=jnp.float32):
    """[N, size] one-hot by iota comparison (no scatter). Out-of-range ids
    (including negatives) produce all-zero rows."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], size), 1)
    return (idx[:, None] == iota).astype(dtype)


def mm_gather(table, idx):
    """table [P, ...] -> [N, ...] rows at idx (f32 path, exact).
    Invalid ids (<0 or >=P) yield zero rows."""
    P = table.shape[0]
    oh = onehot(idx, P)
    flat = table.reshape(P, -1)
    out = jnp.dot(oh, flat.astype(jnp.float32),
                  preferred_element_type=jnp.float32)
    return out.reshape((idx.shape[0],) + table.shape[1:]).astype(table.dtype)


def mm_gather_int(table, idx, fill: int = 0):
    """Integer-table gather via the f32 path (exact for |values| < 2^24).
    Invalid ids yield `fill`."""
    P = table.shape[0]
    oh = onehot(idx, P)
    flat = table.reshape(P, -1).astype(jnp.float32)
    out = jnp.dot(oh, flat, preferred_element_type=jnp.float32)
    valid = (idx >= 0) & (idx < P)
    out = out.reshape((idx.shape[0],) + table.shape[1:])
    res = jnp.round(out).astype(table.dtype)
    return jnp.where(
        valid.reshape((-1,) + (1,) * (res.ndim - 1)), res, fill)


def mm_scatter_add(values, idx, size: int):
    """out[p] = sum_{n: idx[n]==p} values[n]; values [N, ...] f32.
    Invalid ids are dropped."""
    oh = onehot(idx, size)
    flat = values.reshape(values.shape[0], -1).astype(jnp.float32)
    out = jnp.dot(oh.T, flat, preferred_element_type=jnp.float32)
    return out.reshape((size,) + values.shape[1:])


def mm_scatter_set(dest, idx, values, mask=None):
    """dest[idx[n]] = values[n] where mask[n] (last writer wins is NOT
    guaranteed for duplicate ids — callers must pass unique ids, which
    every one_to_one-resolved match set satisfies). Invalid ids dropped."""
    size = dest.shape[0]
    if mask is not None:
        idx = jnp.where(mask, idx, -1)
    oh = onehot(idx, size)                       # [N, size]
    hit = jnp.max(oh, axis=0)                    # [size] 0/1
    flat_v = values.reshape(values.shape[0], -1).astype(jnp.float32)
    written = jnp.dot(oh.T, flat_v, preferred_element_type=jnp.float32)
    flat_d = dest.reshape(size, -1).astype(jnp.float32)
    out = flat_d * (1.0 - hit)[:, None] + written
    out = out.reshape(dest.shape)
    if jnp.issubdtype(dest.dtype, jnp.integer):
        out = jnp.round(out)
    return out.astype(dest.dtype)


def mm_scatter_min_key(keys, idx, size: int, big):
    """out[p] = min over {n: idx[n]==p} of keys[n], else `big`.
    Compare-based (no scatter): [N, size] masked min-reduce."""
    oh = onehot(idx, size, dtype=jnp.bool_)
    masked = jnp.where(oh, keys[:, None].astype(jnp.float32), jnp.float32(big))
    return jnp.min(masked, axis=0)


def bincount_mm(idx, size: int):
    """Counts per id (invalid ids dropped) — scatter-free bincount."""
    oh = onehot(idx, size)
    return jnp.sum(oh, axis=0).astype(jnp.int32)


# NOTE on precision: mm_gather / mm_gather_int / mm_gather_u32 /
# mm_scatter_* intentionally inherit the package-wide 'high' (3-pass
# bf16) default — the one-hot factor is exact, and 3 passes represent
# f32 tables to ~2^-21 (and integers < 2^17 exactly), which geometry
# and id tables need. Single-pass DEFAULT would quantize gathered ids
# above 256 and xyz coordinates to bf16 (the round-2 corruption class).


def mm_gather_u32(table, idx):
    """uint32-table gather via two u16 halves (each < 2^16, exact in f32).
    Used for packed descriptors. Invalid ids yield 0."""
    lo = (table & jnp.uint32(0xFFFF)).astype(jnp.float32)
    hi = (table >> jnp.uint32(16)).astype(jnp.float32)
    P = table.shape[0]
    oh = onehot(idx, P)
    glo = jnp.dot(oh, lo.reshape(P, -1), preferred_element_type=jnp.float32)
    ghi = jnp.dot(oh, hi.reshape(P, -1), preferred_element_type=jnp.float32)
    out = (jnp.round(glo).astype(jnp.uint32)
           | (jnp.round(ghi).astype(jnp.uint32) << jnp.uint32(16)))
    return out.reshape((idx.shape[0],) + table.shape[1:])
