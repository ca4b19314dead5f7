"""TPU-native batched non-max suppression.

Replaces the reference's per-image Python loop + torchvision NMS
(utils/utils.py:782-860) with a fixed-shape, fully jittable pipeline:

  1. score = obj * cls; multi-label candidates via top-k over (N * nc)
  2. wh / conf constraints applied as -inf score masks (no dynamic shapes)
  3. exact greedy NMS on class-offset boxes via an iterative-fixpoint
     suppression sweep — fused Pallas kernel on TPU (ops/pallas_nms.py),
     XLA lax.while_loop elsewhere
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


def _candidates(pred, conf_thres, top_k, multi_label, agnostic):
    """Candidate selection for one image. pred: (N, 5 + nc) decoded
    xywh/obj/cls. Returns fixed-k arrays (score-sorted desc)."""
    nc = pred.shape[1] - 5
    box_xywh = pred[:, :4]
    obj = pred[:, 4]
    cls = pred[:, 5:]

    wh_ok = jnp.all((box_xywh[:, 2:4] > MIN_WH) & (box_xywh[:, 2:4] < MAX_WH), axis=1)
    finite_ok = jnp.all(jnp.isfinite(pred), axis=1)
    base_ok = wh_ok & finite_ok & (obj > conf_thres)

    # Stage 1: pre-select boxes by objectness — a top-k over N instead of
    # N * nc (the obj>conf prefilter of utils/utils.py:800; score = obj*cls
    # <= obj, so high-score pairs live in high-obj boxes).
    n = obj.shape[0]
    box_k = min(max(4 * top_k, 256), n)
    obj_top, box_sel = lax.top_k(jnp.where(base_ok, obj, 0.0), box_k)

    # Stage 2: multi-label (box, class) pairs among survivors only.
    scores = cls[box_sel] * obj_top[:, None]           # (box_k, nc)
    if not (multi_label and nc > 1):
        best = jnp.max(scores, axis=1, keepdims=True)
        scores = jnp.where(scores == best, scores, 0.0)
    scores = jnp.where(scores > conf_thres, scores, 0.0)

    flat = scores.reshape(-1)
    k = min(top_k, flat.shape[0])
    cand_scores, cand_idx = lax.top_k(flat, k)
    box_idx = box_sel[cand_idx // nc]
    cls_idx = (cand_idx % nc).astype(jnp.float32)
    valid = cand_scores > conf_thres

    boxes = xywh2xyxy(box_xywh[box_idx])           # (k, 4)
    offset = jnp.where(agnostic, 0.0, cls_idx) * MAX_WH
    oboxes = boxes + offset[:, None]               # class-offset for batched NMS
    return boxes, oboxes, cand_scores, cls_idx, valid


def _suppress_xla(oboxes, boxes, cand_scores, valid, iou_thres, merge,
                  max_sweeps):
    """One image: greedy-NMS fixpoint + merge in plain XLA (CPU/GPU path;
    on TPU ops/pallas_nms.suppress fuses this into a single VMEM kernel)."""
    k = oboxes.shape[0]
    iou = box_iou_matrix(oboxes, oboxes)
    # strict-upper-triangular suppression graph: earlier (higher-scored)
    # boxes suppress later ones
    tri = (iou > iou_thres) & (jnp.arange(k)[:, None] < jnp.arange(k)[None, :])

    # Iterative fixpoint of keep[j] = valid[j] & !any_i(tri[i,j] & keep[i]).
    # Each sweep propagates suppression one chain level deeper; the fixpoint
    # equals the sequential greedy-NMS result, but each sweep is one dense
    # (k, k) reduction instead of k serial steps.
    def cond(carry):
        keep, prev, it = carry
        return (it < max_sweeps) & jnp.any(keep != prev)

    def body(carry):
        keep, _, it = carry
        suppressed = jnp.any(tri & keep[:, None], axis=0)
        return valid & ~suppressed, keep, it + 1

    keep, _, _ = lax.while_loop(
        cond, body, (valid, jnp.zeros_like(valid), jnp.zeros((), jnp.int32)))

    merged = boxes
    if merge:
        # weighted mean over ALL candidates with iou > thres
        # (reference utils/utils.py:846-853)
        w = (iou > iou_thres) * cand_scores[None, :] * valid[None, :]
        denom = jnp.sum(w, axis=1, keepdims=True)
        fused = (w @ boxes) / jnp.maximum(denom, 1e-12)
        merged = jnp.where(denom > 0, fused, boxes)
    return keep, merged


def _finalize(boxes, cand_scores, cls_idx, keep, max_det):
    """One image: rank kept candidates into max_det output slots."""
    k = cand_scores.shape[0]
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
                                   'merge', 'max_sweeps', 'use_pallas'))
def non_max_suppression(pred, conf_thres: float = 0.1, iou_thres: float = 0.6,
                        top_k: int = 512, max_det: int = 300,
                        multi_label: bool = True, agnostic: bool = False,
                        merge: bool = True, max_sweeps: int = 16,
                        use_pallas: bool | None = None):
    """Batched NMS. pred: (bs, N, 5 + nc) -> (bs, max_det, 6).

    ``max_sweeps`` bounds the fixpoint iteration; each sweep resolves one
    more level of suppression chains, so the result is exactly greedy NMS
    whenever chains are shorter than the cap (always true for trained
    detectors; raise it for adversarial inputs).

    ``use_pallas`` selects the fused VMEM suppression kernel (default: on
    when running on TPU)."""
    boxes, oboxes, cand_scores, cls_idx, valid = jax.vmap(
        partial(_candidates, conf_thres=conf_thres, top_k=top_k,
                multi_label=multi_label, agnostic=agnostic))(pred)

    if use_pallas is None:
        use_pallas = jax.default_backend() == 'tpu'
    if use_pallas:
        from .pallas_nms import suppress
        # merge weights use score * valid; fold valid in here
        keep, merged = suppress(oboxes, boxes,
                                cand_scores * valid.astype(cand_scores.dtype),
                                valid, iou_thres=iou_thres,
                                max_sweeps=max_sweeps, merge=merge)
    else:
        keep, merged = jax.vmap(
            partial(_suppress_xla, iou_thres=iou_thres, merge=merge,
                    max_sweeps=max_sweeps))(oboxes, boxes, cand_scores, valid)

    merged = jnp.where(keep[..., None], merged, boxes)
    return jax.vmap(partial(_finalize, max_det=max_det))(
        merged, cand_scores, cls_idx, keep)


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
