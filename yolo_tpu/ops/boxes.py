"""Box geometry: coordinate transforms and IoU family (GIoU/DIoU/CIoU).

Reference: utils/utils.py:254-337 (bbox_iou/box_iou/wh_iou),
utils/utils.py:104-160 (xywh2xyxy/xyxy2xywh/scale_coords/clip_coords).
All functions are pure jnp, fully batched (no python per-box loops).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

EPS = 1e-16


def xywh2xyxy(x):
    """(cx, cy, w, h) -> (x1, y1, x2, y2); operates on trailing dim 4."""
    cx, cy, w, h = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy2xywh(x):
    x1, y1, x2, y2 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def bbox_iou(box1, box2, *, x1y1x2y2: bool = True, GIoU: bool = False,
             DIoU: bool = False, CIoU: bool = False):
    """Element-wise IoU between broadcastable box arrays (trailing dim 4).

    Matches reference utils/utils.py:254-297 numerics (eps placement included).
    """
    if x1y1x2y2:
        b1_x1, b1_y1, b1_x2, b1_y2 = (box1[..., i] for i in range(4))
        b2_x1, b2_y1, b2_x2, b2_y2 = (box2[..., i] for i in range(4))
    else:
        b1_x1, b1_x2 = box1[..., 0] - box1[..., 2] / 2, box1[..., 0] + box1[..., 2] / 2
        b1_y1, b1_y2 = box1[..., 1] - box1[..., 3] / 2, box1[..., 1] + box1[..., 3] / 2
        b2_x1, b2_x2 = box2[..., 0] - box2[..., 2] / 2, box2[..., 0] + box2[..., 2] / 2
        b2_y1, b2_y2 = box2[..., 1] - box2[..., 3] / 2, box2[..., 1] + box2[..., 3] / 2

    inter = (jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0) *
             jnp.clip(jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0))

    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1
    union = (w1 * h1 + EPS) + w2 * h2 - inter
    iou = inter / union

    if GIoU or DIoU or CIoU:
        cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
        ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
        if GIoU:
            c_area = cw * ch + EPS
            return iou - (c_area - union) / c_area
        c2 = cw ** 2 + ch ** 2 + EPS
        rho2 = (((b2_x1 + b2_x2) - (b1_x1 + b1_x2)) ** 2 / 4 +
                ((b2_y1 + b2_y2) - (b1_y1 + b1_y2)) ** 2 / 4)
        if DIoU:
            return iou - rho2 / c2
        # CIoU
        v = (4 / math.pi ** 2) * jnp.square(
            jnp.arctan(w2 / (h2 + EPS)) - jnp.arctan(w1 / (h1 + EPS)))
        alpha = jax.lax.stop_gradient(v / (1 - iou + v + EPS))
        return iou - (rho2 / c2 + v * alpha)

    return iou


def box_iou_matrix(box1, box2):
    """Pairwise IoU: box1 (N,4), box2 (M,4) xyxy -> (N, M)."""
    area1 = (box1[:, 2] - box1[:, 0]) * (box1[:, 3] - box1[:, 1])
    area2 = (box2[:, 2] - box2[:, 0]) * (box2[:, 3] - box2[:, 1])
    lt = jnp.maximum(box1[:, None, :2], box2[None, :, :2])
    rb = jnp.minimum(box1[:, None, 2:], box2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area1[:, None] + area2[None, :] - inter + EPS)


def box_iou_matrix_np(box1, box2):
    """Numpy twin of box_iou_matrix for host-side evaluation loops
    (same eps convention)."""
    import numpy as np
    area1 = (box1[:, 2] - box1[:, 0]) * (box1[:, 3] - box1[:, 1])
    area2 = (box2[:, 2] - box2[:, 0]) * (box2[:, 3] - box2[:, 1])
    lt = np.maximum(box1[:, None, :2], box2[None, :, :2])
    rb = np.minimum(box1[:, None, 2:], box2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area1[:, None] + area2[None, :] - inter + EPS)


def wh_iou(wh1, wh2):
    """IoU of width-height pairs assuming shared centre: (N,2),(M,2)->(N,M)."""
    wh1 = wh1[:, None]
    wh2 = wh2[None]
    inter = jnp.prod(jnp.minimum(wh1, wh2), axis=2)
    return inter / (jnp.prod(wh1, axis=2) + jnp.prod(wh2, axis=2) - inter)


def clip_coords(boxes, img_shape):
    """Clip xyxy boxes to image bounds (h, w)."""
    h, w = img_shape
    return jnp.stack([
        jnp.clip(boxes[..., 0], 0, w),
        jnp.clip(boxes[..., 1], 0, h),
        jnp.clip(boxes[..., 2], 0, w),
        jnp.clip(boxes[..., 3], 0, h),
    ], axis=-1)


def scale_coords(img1_shape, coords, img0_shape, ratio_pad=None):
    """Rescale xyxy coords from letterboxed img1_shape back to img0_shape
    (reference utils/utils.py:116-130). Host-side numpy friendly."""
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = ((img1_shape[1] - img0_shape[1] * gain) / 2,
               (img1_shape[0] - img0_shape[0] * gain) / 2)
    else:
        gain, pad = ratio_pad[0][0], ratio_pad[1]
    coords = jnp.asarray(coords)
    shift = jnp.array([pad[0], pad[1], pad[0], pad[1]], dtype=coords.dtype)
    coords = (coords - shift) / gain
    return clip_coords(coords, img0_shape)
