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
    # (added after per-cell top-k) dominates both.
    strong_bonus = 1e5
    key = jnp.where(cells > 0.0,
                    cells + (cells > high_th) * strong_bonus,
                    -jnp.inf)
    topv, topi = jax.lax.top_k(key, cell_topk)  # [C, k]

    C = gy * gx
    cell_ids = jnp.arange(C)
    # absolute pixel coords of candidates
    cy = (cell_ids // gx)[:, None] * ch + topi // cw
    cx = (cell_ids % gx)[:, None] * cw + topi % cw

    is_best = jnp.zeros_like(topv).at[:, 0].set(1.0)
    cand_key = jnp.where(jnp.isfinite(topv),
                         topv + is_best * 1e7, -jnp.inf).reshape(-1)
    cand_x = cx.reshape(-1).astype(jnp.float32)
    cand_y = cy.reshape(-1).astype(jnp.float32)
    flat = s.reshape(-1)
    cand_resp = flat[(cy.reshape(-1) * Wp + cx.reshape(-1))]

    sel_key, sel_idx = jax.lax.top_k(cand_key, n_out)
    valid = jnp.isfinite(sel_key)
    xy = jnp.stack([cand_x[sel_idx], cand_y[sel_idx]], axis=-1)
    resp = jnp.where(valid, cand_resp[sel_idx], 0.0)
    xy = jnp.where(valid[:, None], xy, 0.0)
    return xy, resp, valid
