"""Per-stage timing of ORB extraction, single (scan-amortized) vs
batch-16 vmap — finds why vmapped extraction costs 8.4 ms/frame when one
scanned extraction costs 3.15 ms.

Usage: python tools/extract_profile.py [--cpu]
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

from myslam_tpu.features.extractor import ORBExtractor, EDGE_MARGIN
from myslam_tpu.io import synthetic
from myslam_tpu.ops import descriptors, fast, image, orientation, selection
from myslam_tpu.ops import patches as patches_mod

B = 16
ITERS = 8


def timed(name, fn, *args):
    """Scan fn ITERS/2*ITERS times with a carried perturbation; report
    (t2-t1)/ITERS so the link/dispatch constant cancels."""

    def body(carry, _):
        out = fn(*args, carry)
        leaves = jax.tree.leaves(out)
        s = sum(jnp.sum(l).astype(jnp.float32) for l in leaves
                if jnp.issubdtype(l.dtype, jnp.floating))
        return carry * 0.5 + s * 1e-30, None

    run1 = jax.jit(lambda c: jax.lax.scan(body, c, None, length=ITERS)[0])
    run2 = jax.jit(lambda c: jax.lax.scan(body, c, None, length=2 * ITERS)[0])
    c0 = jnp.float32(1e-6)
    run1(c0).block_until_ready()
    run2(c0).block_until_ready()
    best1 = best2 = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        run1(c0).block_until_ready()
        best1 = min(best1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        run2(c0).block_until_ready()
        best2 = min(best2, time.perf_counter() - t0)
    per = (best2 - best1) / ITERS * 1e3
    print(f"{name:40s} {per:8.3f} ms/call ({per/B:6.3f} ms/frame if batched)")
    return per


def main():
    seq = synthetic.ImageSequence(width=640, height=480, n_frames=B + 1,
                                  step_px=2.0)
    ex = ORBExtractor(480, 640, n_features=2000)
    imgs = jnp.asarray(
        np.stack([seq.frame(k) for k in range(B)]), jnp.float32)
    img = imgs[0]
    jax.block_until_ready(imgs)

    n_levels = ex.n_levels
    scale = ex.scale

    # ---- single-image stages ----
    print("== single image (per call == per frame) ==")
    timed("pyramid (8 levels)",
          lambda c: image.build_pyramid(img + c, n_levels, scale))
    pyr = image.build_pyramid(img, n_levels, scale)
    timed("fast_score+nms L0",
          lambda c: fast.nms_3x3(fast.fast_score(pyr[0] + c,
                                                 border=EDGE_MARGIN)))
    score0 = fast.nms_3x3(fast.fast_score(pyr[0], border=EDGE_MARGIN))
    timed("select_uniform L0",
          lambda c: selection.select_uniform(score0 + c * 0, ex.budgets[0],
                                             high_th=ex.ini_th))
    xy0, r0, v0 = selection.select_uniform(score0, ex.budgets[0],
                                           high_th=ex.ini_th)
    ph = descriptors.PATCH_HALF
    timed("extract_patches L0 (raw)",
          lambda c: patches_mod.extract_patches(pyr[0] + c, xy0, ph))
    timed("gaussian_blur L0",
          lambda c: image.gaussian_blur(pyr[0] + c))
    blur0 = image.gaussian_blur(pyr[0])
    patches0 = patches_mod.extract_patches(blur0, xy0, ph)
    ic_lo = ph - orientation.HALF_PATCH
    ic_hi = ph + orientation.HALF_PATCH + 1
    timed("ic_angles L0",
          lambda c: orientation.ic_angles_from_patches(
              patches0[:, ic_lo:ic_hi, ic_lo:ic_hi] + c))
    a0 = orientation.ic_angles_from_patches(
        patches0[:, ic_lo:ic_hi, ic_lo:ic_hi])
    timed("descriptors L0",
          lambda c: descriptors.orb_descriptors_from_patches(
              patches0 + c, a0, v0))
    extract = ex._build()
    timed("FULL single extract",
          lambda c: extract(img + c))

    # ---- batch-16 vmapped stages ----
    print("== vmap batch 16 ==")
    timed("vmap pyramid",
          lambda c: jax.vmap(
              lambda im: image.build_pyramid(im, n_levels, scale))(imgs + c))
    pyr_b = jax.vmap(lambda im: image.build_pyramid(im, n_levels, scale))(
        imgs)
    timed("vmap fast_score+nms L0",
          lambda c: jax.vmap(
              lambda s: fast.nms_3x3(
                  fast.fast_score(s, border=EDGE_MARGIN)))(pyr_b[0] + c))
    score_b = jax.vmap(
        lambda s: fast.nms_3x3(fast.fast_score(s, border=EDGE_MARGIN)))(
        pyr_b[0])
    timed("vmap select_uniform L0",
          lambda c: jax.vmap(
              lambda s: selection.select_uniform(
                  s, ex.budgets[0], high_th=ex.ini_th))(score_b + c * 0))
    xy_b, _, _ = jax.vmap(
        lambda s: selection.select_uniform(s, ex.budgets[0],
                                           high_th=ex.ini_th))(score_b)
    timed("vmap extract_patches L0",
          lambda c: jax.vmap(
              lambda im, xy: patches_mod.extract_patches(im, xy, ph))(
                  pyr_b[0] + c, xy_b))
    timed("vmap gaussian_blur L0",
          lambda c: jax.vmap(image.gaussian_blur)(pyr_b[0] + c))
    timed("FULL vmap extract x16",
          lambda c: jax.vmap(extract)(imgs + c))


if __name__ == "__main__":
    main()
