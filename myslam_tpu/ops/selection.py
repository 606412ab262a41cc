"""Spatially-uniform top-N keypoint selection.

TPU-native replacement for DistributeOctTree (reference
src/ORBextractor.cc:541-765): the quadtree's *goal* is ~N spatially uniform
cells with the best-response corner kept per cell. Here the level is tiled
into a static grid of ~N cells; the best corner of every cell is selected
first (priority), then remaining budget is filled by globally-best leftover
corners — fixed output shape [N] with a validity mask.

The strong/weak threshold fallback (FAST th 20, retry 7 per 30px cell,
src/ORBextractor.cc:795-825) is reproduced by a score bonus: corners above
the high threshold outrank all weak corners within a cell, and weak corners
are only kept where a cell has nothing strong.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def grid_dims(h: int, w: int, n_target: int):
    """Static grid with >= n_target roughly-square cells."""
    gy = max(1, int(math.ceil(math.sqrt(n_target * h / max(w, 1)))))
    gx = max(1, int(math.ceil(n_target / gy)))
    return gy, gx


@partial(jax.jit, static_argnames=("n_out", "high_th", "cell_topk"))
def select_uniform(score, n_out: int, high_th: float = 20.0,
                   cell_topk: int = 4):
    """Pick n_out spatially-uniform keypoints from a dense NMS'd score map.

    Args:
      score: [H, W] corner scores (0 = not a corner). Corners with
             score > high_th are 'strong' (FAST th 20); the rest are 'weak'
             (th 7 fallback).
      n_out: static output count.
      cell_topk: candidates kept per cell before the global fill.

    Returns:
      xy [n_out, 2] float32 (x, y), resp [n_out], valid [n_out] bool.
    """
    H, W = score.shape
    gy, gx = grid_dims(H, W, n_out)
    ch = -(-H // gy)  # cell height (ceil)
    cw = -(-W // gx)
    Hp, Wp = gy * ch, gx * cw
    s = jnp.pad(score, ((0, Hp - H), (0, Wp - W)))
    cells = s.reshape(gy, ch, gx, cw).transpose(0, 2, 1, 3).reshape(
        gy * gx, ch * cw
    )

    # Selection key: strong bonus dominates raw score; cell-best bonus
    # (added after per-cell top-k) dominates both. Coordinates ride along
    # INSIDE the sort key's low bits so no post-top_k gather is needed
    # (gathers are a ~26 ms fallback on this backend, ops/indexing.py).
    strong_bonus = 1e5
    key = jnp.where(cells > 0.0,
                    cells + (cells > high_th) * strong_bonus,
                    -jnp.inf)
    # per-cell top-k by unrolled max-extraction: lax.top_k lowers to a
    # full per-cell SORT ([B, C, cell_px] sorts cost ~8 ms per 16-frame
    # chunk in the traced extraction); k is tiny, so k rounds of
    # (max, argmax, mask) are a handful of fused reduces instead
    C_cells, cell_px = key.shape
    col = jax.lax.broadcasted_iota(jnp.int32, key.shape, 1)
    tv, ti, k_work = [], [], key
    for _ in range(cell_topk):
        v = jnp.max(k_work, axis=1)
        i = jnp.argmax(k_work, axis=1).astype(jnp.int32)
        tv.append(v)
        ti.append(i)
        k_work = jnp.where(col == i[:, None], -jnp.inf, k_work)
    topv = jnp.stack(tv, axis=1)                # [C, k]
    topi = jnp.stack(ti, axis=1)

    C = gy * gx
    cell_ids = jnp.arange(C)
    # absolute pixel coords of candidates
    cy = (cell_ids // gx)[:, None] * ch + topi // cw
    cx = (cell_ids % gx)[:, None] * cw + topi % cw

    ii = jax.lax.broadcasted_iota(jnp.int32, topv.shape, 1)
    is_best = (ii == 0).astype(topv.dtype)
    cand_key = jnp.where(jnp.isfinite(topv),
                         topv + is_best * 1e7, -jnp.inf).reshape(-1)
    # pack (key, x, y) into one f64-free sortable value: quantize the key
    # to integer rank steps and append coords in the fraction — instead,
    # simpler: run top_k on the key and select coords via one-hot matmul.
    sel_key, sel_idx = jax.lax.top_k(cand_key, n_out)
    valid = jnp.isfinite(sel_key)
    M = cand_key.shape[0]
    oh = (sel_idx[:, None]
          == jax.lax.broadcasted_iota(jnp.int32, (n_out, M), 1)
          ).astype(jnp.float32)
    coords = jnp.stack([cx.reshape(-1).astype(jnp.float32),
                        cy.reshape(-1).astype(jnp.float32)], axis=1)
    xy_sel = jnp.dot(oh, coords, preferred_element_type=jnp.float32)
    xy = jnp.stack([xy_sel[:, 0], xy_sel[:, 1]], axis=-1)
    # recover the raw response from the key (bonuses are far above any
    # real FAST score, so subtraction is unambiguous)
    resp = sel_key
    resp = jnp.where(resp > 5e6, resp - 1e7, resp)
    resp = jnp.where(resp > 5e4, resp - 1e5, resp)
    resp = jnp.where(valid, resp, 0.0)
    xy = jnp.where(valid[:, None], xy, 0.0)
    return xy, resp, valid
