"""Device-side TP assignment for evaluation (reference test.py:157-181).

The reference matches predictions to targets in a per-image, per-class
Python loop on the host. At ~900 img/s device throughput on a 1-core host
VM that loop becomes the eval bottleneck, so the greedy claim semantics are
reproduced as a jittable ``lax.scan`` fused into the eval step:

  - predictions are processed in NMS output order (conf desc);
  - each prediction claims the best-IoU target of its own class/image;
  - a claimed target can never be claimed again; a prediction whose best
    target is already claimed gets nothing (NOT its second-best — exactly
    the reference's argmax-before-claim behaviour);
  - correct[i, j] = claimed & best_iou > iouv[j].

Parity with the host reference loop is asserted in
tests/test_metrics.py::test_device_matching_equals_host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.boxes import box_iou_matrix, xywh2xyxy


@partial(jax.jit, static_argnames=('iouv',))
def match_device(dets, targets, valid, w: float, h: float,
                 iouv: tuple = (0.5,)):
    """Batched TP matrix.

    dets: (bs, max_det, 6) NMS output [x1 y1 x2 y2 conf cls] (conf==0 pad);
    targets: (T, 6) [img, cls, x, y, w, h] normalised; valid: (T,) bool.
    Returns correct: (bs, max_det, len(iouv)) bool, rows aligned with dets.
    """
    if targets.shape[0] == 0:
        return jnp.zeros(dets.shape[:2] + (len(iouv),), bool)
    iouv_arr = jnp.asarray(iouv, jnp.float32)
    scale = jnp.asarray([w, h, w, h], jnp.float32)
    tbox = xywh2xyxy(targets[:, 2:6] * scale)              # (T, 4) pixels
    tcls = targets[:, 1]
    timg = targets[:, 0].astype(jnp.int32)
    T = targets.shape[0]

    def per_image(si, det):
        boxes = det[:, :4]
        boxes = jnp.stack([boxes[:, 0].clip(0, w), boxes[:, 1].clip(0, h),
                           boxes[:, 2].clip(0, w), boxes[:, 3].clip(0, h)],
                          axis=-1)
        conf, pcls = det[:, 4], det[:, 5]
        iou = box_iou_matrix(boxes, tbox)                   # (max_det, T)
        ok = valid & (timg == si)
        iou = jnp.where(ok[None, :] & (pcls[:, None] == tcls[None, :]),
                        iou, -1.0)
        pvalid = conf > 0

        def step(claimed, i):
            row = iou[i]
            best = jnp.argmax(row)
            biou = row[best]
            claim = (biou > iouv_arr[0]) & (~claimed[best]) & pvalid[i]
            corr = claim & (biou > iouv_arr)
            return claimed.at[best].set(claimed[best] | claim), corr

        _, correct = lax.scan(step, jnp.zeros(T, bool),
                              jnp.arange(det.shape[0]))
        return correct

    return jax.vmap(per_image)(jnp.arange(dets.shape[0]), dets)
