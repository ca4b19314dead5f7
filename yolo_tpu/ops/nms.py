"""TPU-native batched non-max suppression.

Replaces the reference's per-image Python loop + torchvision NMS
(utils/utils.py:782-860) with a fixed-shape, fully jittable pipeline:

  1. score = obj * cls; multi-label candidates via top-k over (N * nc)
  2. wh / conf constraints applied as -inf score masks (no dynamic shapes)
  3. exact greedy NMS on class-offset boxes via a lax.fori_loop suppression
     sweep over score-sorted candidates
  4. merge-NMS weighted box fusion (the reference default, method='merge')
  5. fixed max_det output slots; invalid slots have conf == 0

Output per image: (max_det, 6) = (x1, y1, x2, y2, conf, cls).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .boxes import box_iou_matrix, xywh2xyxy

MIN_WH, MAX_WH = 2.0, 4096.0  # box constraints (reference utils/utils.py:791)


def _nms_single(pred, conf_thres, iou_thres, top_k, max_det, multi_label,
                agnostic, merge):
    """NMS for one image. pred: (N, 5 + nc) decoded xywh/obj/cls."""
    nc = pred.shape[1] - 5
    box_xywh = pred[:, :4]
    obj = pred[:, 4]
    cls = pred[:, 5:]

    wh_ok = jnp.all((box_xywh[:, 2:4] > MIN_WH) & (box_xywh[:, 2:4] < MAX_WH), axis=1)
    finite_ok = jnp.all(jnp.isfinite(pred), axis=1)
    base_ok = wh_ok & finite_ok & (obj > conf_thres)

    scores = cls * obj[:, None]                    # (N, nc) combined conf
    if not (multi_label and nc > 1):
        best = jnp.max(scores, axis=1, keepdims=True)
        scores = jnp.where(scores == best, scores, 0.0)
    scores = jnp.where(base_ok[:, None] & (scores > conf_thres), scores, 0.0)

    # top-k over flattened (box, class) pairs — the candidate set
    flat = scores.reshape(-1)
    k = min(top_k, flat.shape[0])
    cand_scores, cand_idx = lax.top_k(flat, k)
    box_idx = cand_idx // nc
    cls_idx = (cand_idx % nc).astype(jnp.float32)
    valid = cand_scores > conf_thres

    boxes = xywh2xyxy(box_xywh[box_idx])           # (k, 4)
    offset = jnp.where(agnostic, 0.0, cls_idx) * MAX_WH
    oboxes = boxes + offset[:, None]               # class-offset for batched NMS

    iou = box_iou_matrix(oboxes, oboxes)

    def body(i, keep):
        suppress = (iou[i] > iou_thres) & (jnp.arange(k) > i) & keep[i] & keep
        return keep & ~suppress

    keep = lax.fori_loop(0, k, body, valid)

    if merge:
        # weighted mean over ALL candidates with iou > thres
        # (reference utils/utils.py:846-853)
        w = (iou > iou_thres) * cand_scores[None, :] * valid[None, :]
        denom = jnp.sum(w, axis=1, keepdims=True)
        merged = (w @ boxes) / jnp.maximum(denom, 1e-12)
        boxes = jnp.where((keep & (denom[:, 0] > 0))[:, None], merged, boxes)

    out_scores = jnp.where(keep, cand_scores, 0.0)
    sel_scores, sel = lax.top_k(out_scores, min(max_det, k))
    det = jnp.concatenate(
        [boxes[sel], sel_scores[:, None], cls_idx[sel][:, None]], axis=1)
    det = jnp.where((sel_scores > 0)[:, None], det, 0.0)
    if max_det > k:
        det = jnp.pad(det, ((0, max_det - k), (0, 0)))
    return det


@partial(jax.jit, static_argnames=('conf_thres', 'iou_thres', 'top_k',
                                   'max_det', 'multi_label', 'agnostic',
                                   'merge'))
def non_max_suppression(pred, conf_thres: float = 0.1, iou_thres: float = 0.6,
                        top_k: int = 512, max_det: int = 300,
                        multi_label: bool = True, agnostic: bool = False,
                        merge: bool = True):
    """Batched NMS. pred: (bs, N, 5 + nc) -> (bs, max_det, 6)."""
    fn = partial(_nms_single, conf_thres=conf_thres, iou_thres=iou_thres,
                 top_k=top_k, max_det=max_det, multi_label=multi_label,
                 agnostic=agnostic, merge=merge)
    return jax.vmap(fn)(pred)


def to_host_detections(dets) -> list:
    """Convert (bs, max_det, 6) device output to the reference's per-image
    list format: ndarray (n, 6) or None (utils/utils.py:783-787 contract)."""
    import numpy as np
    dets = np.asarray(dets)
    out = []
    for d in dets:
        d = d[d[:, 4] > 0]
        out.append(d if len(d) else None)
    return out
