"""Device-side TP assignment for evaluation (reference test.py:157-181).

The reference matches predictions to targets in a per-image, per-class
Python loop on the host. At ~900 img/s device throughput on a 1-core host
VM that loop becomes the eval bottleneck, so the greedy claim semantics are
reproduced as a fully vectorised (scatter-min) assignment fused into the
eval step:

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

        # Greedy claim, vectorised. Each prediction's candidate target is its
        # argmax row (independent of the claim state — the reference takes
        # argmax BEFORE checking `claimed`), so target t is won by the FIRST
        # eligible prediction (rows are conf-desc) whose argmax is t: one
        # scatter-min replaces the 300-step sequential scan (which ran at
        # ~1.6 s/batch on TPU; this is ~3 vector ops).
        best = jnp.argmax(iou, axis=1)                      # (max_det,)
        biou = jnp.take_along_axis(iou, best[:, None], 1)[:, 0]
        eligible = (biou > iouv_arr[0]) & pvalid
        idx = jnp.arange(det.shape[0])
        sentinel = det.shape[0]
        cand = jnp.where(eligible, idx, sentinel)
        first = jnp.full(T, sentinel, cand.dtype).at[best].min(cand)
        claim = eligible & (first[best] == idx)
        return claim[:, None] & (biou[:, None] > iouv_arr[None, :])

    return jax.vmap(per_image)(jnp.arange(dets.shape[0]), dets)
