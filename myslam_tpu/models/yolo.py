"""YOLOv2 object detector as a pure-JAX convolutional network.

TPU-native replacement for the vendored darknet engine (reference
Thirdparty/darknet: parser.cpp builds the layer list from
Examples/Monocular/darknet_cfg/yolo.cfg, network_kernels.cu runs it on
CUDA; the fork wraps it as Yolo::detect, yolo.cpp:129-194). Here the same
topology is a fixed functional program:

  416x416x3 -> Darknet-19 backbone (conv3x3/1x1 + BN + leaky0.1, maxpool)
  -> passthrough: 26x26x512 route -> conv1x1(64) -> space_to_depth(2)
     -> concat -> conv3x3(1024) -> conv1x1(A*(5+C))
  -> region decode (sigmoid xy/objectness, softmax classes, anchor wh)
  -> score threshold + class-wise NMS (top-k + IoU matrix, fixed shapes)

(topology per darknet_cfg/yolo.cfg:1-259; region params
 anchors x5, classes, thresh .40, nms .40 per yolo.cfg:236-247 and
 darknet_cfg/config.yml:9-11).

All convs run NHWC in bfloat16 on the MXU with f32 accumulation;
batch-norm is folded into conv weights at load time (inference only).
Weights load from the original darknet .weights binary via
`load_darknet_weights`, or initialize randomly for testing.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# Default region config mirrors the reference deployment: 5 anchor pairs
# (yolo.cfg:243), 6 classes (bicycle,bus,car,dog,motorbike,person —
# darknet_cfg/coco.names), thresholds .40/.40 (config.yml:9-11).
DEFAULT_ANCHORS = np.array([
    [1.3221, 1.73145], [3.19275, 4.00944], [5.05587, 8.09892],
    [9.47112, 4.84053], [11.2364, 10.0071]], np.float32)
DEFAULT_CLASSES = 6
INPUT_SIZE = 416

# (out_ch, kernel, stride, maxpool_after) per backbone conv — yolo.cfg
BACKBONE = [
    (32, 3, True),
    (64, 3, True),
    (128, 3, False), (64, 1, False), (128, 3, True),
    (256, 3, False), (128, 1, False), (256, 3, True),
    (512, 3, False), (256, 1, False), (512, 3, False), (256, 1, False),
    (512, 3, True),        # index 12 output (pre-pool) is the passthrough
    (1024, 3, False), (512, 1, False), (1024, 3, False), (512, 1, False),
    (1024, 3, False),
]
PASSTHROUGH_IDX = 12  # conv whose PRE-POOL activation feeds the reorg
HEAD = [(1024, 3), (1024, 3)]       # two conv3x3(1024) after backbone
PASS_CONV = (64, 1)                 # conv1x1(64) before reorg


class ConvParams(NamedTuple):
    w: jnp.ndarray   # [kh, kw, cin, cout]
    b: jnp.ndarray   # [cout]


def _conv(x, p: ConvParams, stride: int = 1, leaky: bool = True):
    """NHWC conv + bias + leaky ReLU (BN folded into w/b)."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), p.w.astype(jnp.bfloat16),
        (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y + p.b[None, None, None, :]
    if leaky:
        y = jnp.where(y > 0, y, 0.1 * y)
    return y


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _space_to_depth(x, block: int = 2):
    """Reorg/passthrough layer (darknet reorg_layer.cpp; stride 2)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // block, w // block, block * block * c)


def init_params(key, n_classes: int = DEFAULT_CLASSES,
                n_anchors: int = len(DEFAULT_ANCHORS)):
    """Random (He) initialization — for tests and training-from-scratch."""
    params = []
    cin = 3

    def make(key, cout, k, cin):
        kw, kb = jax.random.split(key)
        scale = jnp.sqrt(2.0 / (k * k * cin))
        return ConvParams(
            w=jax.random.normal(kw, (k, k, cin, cout), jnp.float32) * scale,
            b=jnp.zeros((cout,), jnp.float32))

    keys = jax.random.split(key, len(BACKBONE) + len(HEAD) + 2)
    ki = 0
    for cout, k, _pool in BACKBONE:
        params.append(make(keys[ki], cout, k, cin)); cin = cout; ki += 1
    for cout, k in HEAD:
        params.append(make(keys[ki], cout, k, cin)); cin = cout; ki += 1
    params.append(make(keys[ki], PASS_CONV[0], PASS_CONV[1], 512)); ki += 1
    # final head: concat(1024, 64*4) -> conv3x3(1024) -> conv1x1(out)
    params.append(make(keys[ki], 1024, 3, 1024 + PASS_CONV[0] * 4))
    kf = jax.random.split(keys[ki])[0]
    out_ch = n_anchors * (5 + n_classes)
    params.append(make(kf, out_ch, 1, 1024))
    return params


@partial(jax.jit, static_argnames=())
def forward(params: Sequence[ConvParams], img):
    """img [N, 416, 416, 3] float in [0,1] -> raw head [N, 13, 13, A*(5+C)].

    Layer order matches yolo.cfg; the passthrough route taps the 26x26x512
    activation (yolo.cfg route at layer 25)."""
    x = img
    pi = 0
    passthrough = None
    for li, (cout, k, pool) in enumerate(BACKBONE):
        x = _conv(x, params[pi]); pi += 1
        if li == PASSTHROUGH_IDX:
            passthrough = x           # 26x26x512 (pre-pool)
        if pool:
            x = _maxpool2(x)
    for cout, k in HEAD:
        x = _conv(x, params[pi]); pi += 1
    skip = _conv(passthrough, params[pi]); pi += 1       # conv1x1(64)
    skip = _space_to_depth(skip, 2)                      # 13x13x256
    x = jnp.concatenate([x, skip], axis=-1)
    x = _conv(x, params[pi]); pi += 1                    # conv3x3(1024)
    x = _conv(x, params[pi], leaky=False)                # linear head
    return x


@partial(jax.jit, static_argnames=("n_classes",))
def region_decode(head, anchors, n_classes: int):
    """Region-layer decode (darknet region_layer.cpp:314-358
    get_region_boxes): per anchor cell, box = (sigmoid(tx)+cx,
    sigmoid(ty)+cy, pw*exp(tw), ph*exp(th)) / grid; confidence =
    sigmoid(to) * softmax(classes).

    Returns boxes [N, S*S*A, 4] (cx, cy, w, h in [0,1] image coords),
    scores [N, S*S*A, C]."""
    n, s, _, _ = head.shape
    a = anchors.shape[0]
    h = head.reshape(n, s, s, a, 5 + n_classes)
    cx = jax.lax.broadcasted_iota(jnp.float32, (s, s), 1)
    cy = jax.lax.broadcasted_iota(jnp.float32, (s, s), 0)
    bx = (jax.nn.sigmoid(h[..., 0]) + cx[None, :, :, None]) / s
    by = (jax.nn.sigmoid(h[..., 1]) + cy[None, :, :, None]) / s
    bw = anchors[None, None, None, :, 0] * jnp.exp(h[..., 2]) / s
    bh = anchors[None, None, None, :, 1] * jnp.exp(h[..., 3]) / s
    obj = jax.nn.sigmoid(h[..., 4])
    cls = jax.nn.softmax(h[..., 5:], axis=-1)
    scores = obj[..., None] * cls
    boxes = jnp.stack([bx, by, bw, bh], axis=-1)
    return (boxes.reshape(n, s * s * a, 4),
            scores.reshape(n, s * s * a, n_classes))


def _iou_matrix(boxes):
    """Pairwise IoU of [M, 4] (cx, cy, w, h) boxes."""
    x1 = boxes[:, 0] - boxes[:, 2] / 2
    y1 = boxes[:, 1] - boxes[:, 3] / 2
    x2 = boxes[:, 0] + boxes[:, 2] / 2
    y2 = boxes[:, 1] + boxes[:, 3] / 2
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    iw = jnp.maximum(ix2 - ix1, 0.0)
    ih = jnp.maximum(iy2 - iy1, 0.0)
    inter = iw * ih
    area = jnp.maximum((x2 - x1) * (y2 - y1), 1e-12)
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


@partial(jax.jit, static_argnames=("max_out",))
def nms(boxes, scores, score_thresh: float = 0.4, iou_thresh: float = 0.4,
        max_out: int = 32):
    """Class-wise greedy NMS with fixed output shape
    (darknet do_nms_sort, box.cpp — greedy suppression by IoU).

    boxes [M, 4], scores [M, C]. Returns (boxes [max_out, 4],
    cls [max_out], score [max_out], valid [max_out])."""
    m, c = scores.shape
    best_cls = jnp.argmax(scores, axis=-1)
    best_score = jnp.max(scores, axis=-1)
    ok = best_score >= score_thresh

    sc = jnp.where(ok, best_score, -1.0)
    if m < max_out:  # tiny inputs (tests): pad to the fixed output size
        sc = jnp.pad(sc, (0, max_out - m), constant_values=-1.0)
        boxes = jnp.pad(boxes, ((0, max_out - m), (0, 0)))
        best_cls = jnp.pad(best_cls, (0, max_out - m))
    top_s, top_i = jax.lax.top_k(sc, max_out)
    cand_boxes = boxes[top_i]
    cand_cls = best_cls[top_i]
    cand_ok = top_s > 0

    iou = _iou_matrix(cand_boxes)
    same_cls = cand_cls[:, None] == cand_cls[None, :]
    # greedy: candidate i is suppressed if a higher-scored same-class
    # candidate j<i overlaps it — the sequential scan unrolled as a masked
    # triangular reduction (scores are already sorted descending)
    def body(keep, i):
        sup = jnp.any(
            keep & (jnp.arange(max_out) < i) & same_cls[i]
            & (iou[i] > iou_thresh))
        keep = keep.at[i].set(keep[i] & ~sup)
        return keep, None

    keep0 = cand_ok
    keep, _ = jax.lax.scan(body, keep0, jnp.arange(max_out))
    return cand_boxes, cand_cls, jnp.where(keep, top_s, 0.0), keep


def letterbox(img_hw3, size: int = INPUT_SIZE):
    """Aspect-preserving resize onto a gray canvas (darknet
    letterbox_image, image.cpp). Returns (canvas [size,size,3],
    scale, pad_x, pad_y) for mapping boxes back."""
    h, w = img_hw3.shape[:2]
    scale = min(size / w, size / h)
    nw, nh = int(round(w * scale)), int(round(h * scale))
    resized = jax.image.resize(img_hw3, (nh, nw, 3), method="bilinear")
    canvas = jnp.full((size, size, 3), 0.5, img_hw3.dtype)
    px, py = (size - nw) // 2, (size - nh) // 2
    canvas = jax.lax.dynamic_update_slice(canvas, resized, (py, px, 0))
    return canvas, scale, px, py


class Yolo:
    """Detector facade mirroring the fork's wrapper API
    (Yolo::readConfig/loadConfig/detect, yolo.cpp:31-194)."""

    def __init__(self, params=None, anchors=DEFAULT_ANCHORS,
                 n_classes: int = DEFAULT_CLASSES, thresh: float = 0.4,
                 nms_thresh: float = 0.4, class_names=None, seed: int = 0):
        self.anchors = jnp.asarray(anchors)
        self.n_classes = n_classes
        self.thresh = float(thresh)
        self.nms_thresh = float(nms_thresh)
        self.class_names = class_names or [str(i) for i in range(n_classes)]
        self.params = params if params is not None else init_params(
            jax.random.PRNGKey(seed), n_classes, len(anchors))

    def detect(self, img_rgb):
        """img_rgb [H, W, 3] float in [0,1] -> list of dicts
        {class_id, class_name, score, box=(x, y, w, h) pixels} — the
        DetectedObject surface (reference object.h + yolo.cpp:163-179)."""
        h, w = img_rgb.shape[:2]
        canvas, scale, px, py = letterbox(jnp.asarray(img_rgb))
        head = forward(self.params, canvas[None])
        boxes, scores = region_decode(head, self.anchors, self.n_classes)
        b, c, s, ok = nms(boxes[0], scores[0], self.thresh, self.nms_thresh)
        out = []
        b = np.asarray(b)
        for i in range(len(np.asarray(ok))):
            if not bool(ok[i]):
                continue
            cx = (b[i, 0] * INPUT_SIZE - px) / scale
            cy = (b[i, 1] * INPUT_SIZE - py) / scale
            bw = b[i, 2] * INPUT_SIZE / scale
            bh = b[i, 3] * INPUT_SIZE / scale
            x0 = float(np.clip(cx - bw / 2, 0, w - 1))
            y0 = float(np.clip(cy - bh / 2, 0, h - 1))
            cid = int(c[i])
            out.append({
                "class_id": cid,
                "class_name": self.class_names[cid]
                if cid < len(self.class_names) else str(cid),
                "score": float(s[i]),
                "box": (x0, y0,
                        float(min(bw, w - x0)), float(min(bh, h - y0))),
            })
        return out


def load_darknet_weights(path: str, n_classes: int = DEFAULT_CLASSES,
                         n_anchors: int = len(DEFAULT_ANCHORS)):
    """Parse the original darknet .weights binary (parser.cpp:1083
    load_weights format: int32 major/minor/revision, int32/int64 seen,
    then per conv layer: [bn: beta, gamma, mean, var][cout] else bias,
    then weights [cout, cin, k, k]). Batch norm is folded:
       w' = w * gamma / sqrt(var + eps);  b' = beta - gamma*mean/sqrt(...)
    Returns params compatible with `forward`."""
    raw = np.fromfile(path, dtype=np.uint8)
    major, minor, _rev = np.frombuffer(raw[:12], np.int32)
    off = 12
    if major * 10 + minor >= 2:
        off += 8  # seen is size_t
    else:
        off += 4
    data = np.frombuffer(raw[off:], np.float32)
    pos = 0

    def take(n):
        nonlocal pos
        out = data[pos:pos + n]
        pos += n
        return out

    specs = []
    cin = 3
    for cout, k, _pool in BACKBONE:
        specs.append((cout, k, cin, True)); cin = cout
    for cout, k in HEAD:
        specs.append((cout, k, cin, True)); cin = cout
    specs.append((PASS_CONV[0], PASS_CONV[1], 512, True))
    specs.append((1024, 3, 1024 + PASS_CONV[0] * 4, True))
    specs.append((n_anchors * (5 + n_classes), 1, 1024, False))

    params = []
    eps = 1e-5
    for cout, k, ci, bn in specs:
        if bn:
            beta = take(cout)
            gamma = take(cout)
            mean = take(cout)
            var = take(cout)
        else:
            bias = take(cout)
        w = take(cout * ci * k * k).reshape(cout, ci, k, k)
        w = np.transpose(w, (2, 3, 1, 0))  # -> HWIO
        if bn:
            scale = gamma / np.sqrt(var + eps)
            w = w * scale[None, None, None, :]
            b = beta - mean * scale
        else:
            b = bias
        params.append(ConvParams(w=jnp.asarray(w.copy()),
                                 b=jnp.asarray(b.copy())))
    return params
