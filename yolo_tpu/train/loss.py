"""YOLO training loss as pure, fixed-shape, jittable functions.

Reference semantics: compute_loss (utils/utils.py:368-432) and build_targets
(utils/utils.py:725-779), re-designed for XLA:

- the reference gathers a dynamic subset of (target, anchor) pairs; here every
  (anchor, target-slot) pair is scored densely and selection is a boolean
  mask — shapes stay static regardless of label count.
- tobj writes use scatter-with-drop on out-of-bounds indices instead of
  dynamic fancy indexing.
- targets arrive as a fixed-capacity (B*, MAX_T, 5) padded tensor plus a
  validity mask (capacity model replaces the variable-length (nt, 6) tensor).

Targets layout per slot: (img_idx, class, x, y, w, h) with xywh normalised to
[0, 1) — identical to the reference collate output (utils/datasets.py:500-508).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import bbox_iou, wh_iou


class LossHyp(NamedTuple):
    """Static loss hyper-parameters (subset of the hyp dict, train.py:25-42)."""
    giou: float = 3.54
    cls: float = 37.4
    cls_pw: float = 1.0
    obj: float = 64.3
    obj_pw: float = 1.0
    iou_t: float = 0.20
    fl_gamma: float = 0.0
    smooth_eps: float = 0.0

    @classmethod
    def from_dict(cls, hyp: dict, nc: int | None = None):
        h = cls(giou=hyp['giou'], cls=hyp['cls'], cls_pw=hyp['cls_pw'],
                obj=hyp['obj'], obj_pw=hyp['obj_pw'], iou_t=hyp['iou_t'],
                fl_gamma=hyp.get('fl_gamma', 0.0),
                smooth_eps=hyp.get('smooth_eps', 0.0))
        if nc is not None:
            # hyp['cls'] *= nc / 80 (reference train.py:87)
            h = h._replace(cls=h.cls * nc / 80.0)
        return h


def smooth_bce(eps: float = 0.0):
    """Positive/negative label-smoothing targets (utils/utils.py:363-365)."""
    return 1.0 - 0.5 * eps, 0.5 * eps


def bce_with_logits(logits, labels, pos_weight: float = 1.0):
    """Element-wise binary cross-entropy on logits with positive weighting
    (torch BCEWithLogitsLoss semantics)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * labels * log_p + (1.0 - labels) * log_not_p)


def focal_scale(logits, labels, gamma: float, alpha: float = 0.25):
    """TF-style focal modulation factor (utils/utils.py:339-360)."""
    p = jax.nn.sigmoid(logits)
    p_t = labels * p + (1 - labels) * (1 - p)
    alpha_factor = labels * alpha + (1 - labels) * (1 - alpha)
    return alpha_factor * (1.0 - p_t) ** gamma


class LayerTargets(NamedTuple):
    """Dense per-YOLO-layer assignment, shapes (na, T) / (na, T, 2)."""
    mask: jnp.ndarray     # selected (valid & anchor-iou > iou_t)
    b: jnp.ndarray        # image index
    a: jnp.ndarray        # anchor index
    gj: jnp.ndarray       # grid row
    gi: jnp.ndarray       # grid col
    txy: jnp.ndarray      # xy offset within cell
    twh: jnp.ndarray      # wh in grid units
    tcls: jnp.ndarray     # class index
    av: jnp.ndarray       # anchor vec (na, T, 2)


def build_targets_layer(targets, valid, anchor_vec, ny: int, nx: int,
                        iou_t: float) -> LayerTargets:
    """Anchor assignment for one YOLO layer.

    targets: (T, 6) [img, cls, x, y, w, h] normalised; valid: (T,) bool;
    anchor_vec: (na, 2) anchors / stride. All-anchor duplication + iou_t
    rejection (use_all_anchors=True, reject=True — utils/utils.py:730,745-758).
    """
    na = anchor_vec.shape[0]
    T = targets.shape[0]
    gxy = targets[:, 2:4] * jnp.array([nx, ny], targets.dtype)       # (T,2)
    gwh = targets[:, 4:6] * jnp.array([nx, ny], targets.dtype)       # (T,2)
    iou = wh_iou(anchor_vec, gwh)                                    # (na,T)
    mask = valid[None, :] & (iou > iou_t)

    b = jnp.broadcast_to(targets[:, 0].astype(jnp.int32)[None], (na, T))
    c = jnp.broadcast_to(targets[:, 1].astype(jnp.int32)[None], (na, T))
    a = jnp.broadcast_to(jnp.arange(na, dtype=jnp.int32)[:, None], (na, T))
    gij = jnp.floor(gxy).astype(jnp.int32)
    gi = jnp.broadcast_to(gij[None, :, 0], (na, T))
    gj = jnp.broadcast_to(gij[None, :, 1], (na, T))
    txy = jnp.broadcast_to((gxy - jnp.floor(gxy))[None], (na, T, 2))
    twh = jnp.broadcast_to(gwh[None], (na, T, 2))
    av = jnp.broadcast_to(anchor_vec[:, None, :], (na, T, 2))
    return LayerTargets(mask=mask, b=b, a=a, gj=gj, gi=gi, txy=txy, twh=twh,
                        tcls=c, av=av)


def compute_loss(p: Sequence[jnp.ndarray], targets, valid, anchor_vecs,
                 nc: int, hyp: LossHyp, gr=1.0, layout: str = 'anchor_major',
                 img_weight=None):
    """Total detection loss.

    p: list of raw per-layer predictions (bs, na, ny, nx, no), or
    (bs, ny, nx, na, no) with ``layout='nhwc'`` (the transpose-free train
    layout from make_apply(head_layout='nhwc') — identical math, the
    gather/scatter indices just follow the native memory order).
    targets: (T, 6) padded; valid: (T,) bool. gr: giou-ratio scalar
    (burn-in ramped, reference train.py:357-358).
    img_weight: optional (bs,) 0/1 mask — evaluation passes it to exclude
    batch pad slots (ragged tails, multi-host wrap-pad duplicates) from
    every loss mean, so the reported val losses cover each real image
    exactly once (the reference's last val batch is simply smaller,
    test.py:113-116). None (training) keeps the unweighted reductions
    bit-identical.
    Returns (loss, loss_items(4,)) with loss_items = [lbox, lobj, lcls, total]
    matching utils/utils.py:431-432.

    Heads may arrive bf16 (train activations in the compute dtype); all loss
    math runs f32, but the upcast happens per-consumer (the gathered rows,
    the obj-logit slice) so no full-tensor f32 copy is ever materialised.
    """
    cp, cn = smooth_bce(hyp.smooth_eps)
    lbox = jnp.zeros(())
    lobj = jnp.zeros(())
    lcls = jnp.zeros(())

    nhwc = layout == 'nhwc'
    for i, pi in enumerate(p):
        if nhwc:
            bs, ny, nx, na, no = pi.shape
        else:
            bs, na, ny, nx, no = pi.shape
        lt = build_targets_layer(targets, valid, jnp.asarray(anchor_vecs[i]),
                                 ny, nx, hyp.iou_t)
        mask = lt.mask.reshape(-1)                                  # (na*T,)
        n_sel = jnp.sum(mask)
        b = lt.b.reshape(-1)
        a = lt.a.reshape(-1)
        gj = jnp.clip(lt.gj.reshape(-1), 0, ny - 1)
        gi = jnp.clip(lt.gi.reshape(-1), 0, nx - 1)

        ps = (pi[b, gj, gi, a] if nhwc
              else pi[b, a, gj, gi]).astype(jnp.float32)             # (na*T, no)
        pxy = jax.nn.sigmoid(ps[:, 0:2])
        pwh = jnp.clip(jnp.exp(ps[:, 2:4]), max=1e3) * lt.av.reshape(-1, 2)
        pbox = jnp.concatenate([pxy, pwh], axis=1)
        tbox = jnp.concatenate([lt.txy.reshape(-1, 2),
                                lt.twh.reshape(-1, 2)], axis=1)
        giou = bbox_iou(pbox, tbox, x1y1x2y2=False, GIoU=True)
        if img_weight is None:
            w_t = mask
            denom = jnp.maximum(n_sel, 1)
        else:
            # zero the weight of every (anchor, target) pair belonging to a
            # pad-slot image; denominators count the weighted selection
            w_t = mask * img_weight.astype(jnp.float32)[jnp.clip(b, 0, bs - 1)]
            denom = jnp.maximum(jnp.sum(w_t), 1.0)
        lbox = lbox + jnp.sum((1.0 - giou) * w_t) / denom

        # obj targets: giou-ratio at assigned cells (utils/utils.py:398).
        # Two targets can share a (b, a, cell): torch fancy-index assignment
        # is last-write-wins in the anchor-major pair order, while XLA's
        # duplicate-index scatter-set order is undefined. On the f32 parity
        # path the winner is made torch-exact (scatter-max the pair index,
        # gather its value — trajectory-parity-tested); on the bf16 TPU
        # path the plain scatter stays (the winner-value gather costs a
        # measured 29 ms/step @608/bs128, and among duplicates every
        # candidate is a genuine giou of a box assigned to that cell — the
        # reference's own pick is just file-order-arbitrary).
        tobj_val = (1.0 - gr) + gr * jnp.clip(jax.lax.stop_gradient(giou), 0)
        # drop invalid writes by pushing their batch index out of range
        b_w = jnp.where(mask, b, bs)
        shape = (bs, ny, nx, na) if nhwc else (bs, na, ny, nx)
        idx = (b_w, gj, gi, a) if nhwc else (b_w, a, gj, gi)
        if pi.dtype == jnp.float32:
            pair_idx = jnp.arange(b_w.shape[0], dtype=jnp.int32)
            win = jnp.full(shape, -1, jnp.int32)
            win = win.at[idx].max(pair_idx, mode='drop')
            tobj = jnp.where(win >= 0, tobj_val[jnp.clip(win, 0)], 0.0)
        else:
            tobj = jnp.zeros(shape, jnp.float32)
            tobj = tobj.at[idx].set(tobj_val, mode='drop')

        obj_logit = pi[..., 4].astype(jnp.float32)
        obj_bce = bce_with_logits(obj_logit, tobj, hyp.obj_pw)
        if hyp.fl_gamma > 0:
            obj_bce = obj_bce * focal_scale(obj_logit, tobj, hyp.fl_gamma)
        if img_weight is None:
            lobj = lobj + jnp.mean(obj_bce)
        else:
            iw = img_weight.astype(jnp.float32).reshape(bs, 1, 1, 1)
            lobj = lobj + jnp.sum(obj_bce * iw) / (
                jnp.maximum(jnp.sum(iw), 1.0) * (na * ny * nx))

        if nc > 1:
            t_cls = jnp.full((ps.shape[0], nc), cn, ps.dtype)
            t_cls = t_cls.at[jnp.arange(ps.shape[0]), lt.tcls.reshape(-1)].set(cp)
            cls_bce = bce_with_logits(ps[:, 5:], t_cls, hyp.cls_pw)
            if hyp.fl_gamma > 0:
                cls_bce = cls_bce * focal_scale(ps[:, 5:], t_cls, hyp.fl_gamma)
            lcls = lcls + jnp.sum(cls_bce * w_t[:, None]) / (denom * nc)

    lbox = lbox * hyp.giou
    lobj = lobj * hyp.obj
    lcls = lcls * hyp.cls
    loss = lbox + lobj + lcls
    return loss, jax.lax.stop_gradient(jnp.stack([lbox, lobj, lcls, loss]))


def pad_targets(labels_list, max_t: int):
    """Host-side: list of per-image (n_i, 5) [cls, x, y, w, h] arrays ->
    ((max_t, 6) padded targets, (max_t,) valid mask).

    Replaces the reference collate_fn's variable-length concat
    (utils/datasets.py:500-508) with a fixed-capacity tensor.
    """
    rows = []
    for img_i, lab in enumerate(labels_list):
        lab = np.asarray(lab, np.float32).reshape(-1, 5)
        if len(lab):
            rows.append(np.concatenate(
                [np.full((len(lab), 1), img_i, np.float32), lab], axis=1))
    if rows:
        cat = np.concatenate(rows, axis=0)
        if len(cat) > max_t:
            # dropped boxes train their cells toward background — surface it
            import warnings
            warnings.warn(
                f'pad_targets: {len(cat) - max_t} of {len(cat)} labels '
                f'truncated (raise --max-targets)', stacklevel=2)
            cat = cat[:max_t]
    else:
        cat = np.zeros((0, 6), np.float32)
    out = np.zeros((max_t, 6), np.float32)
    out[:len(cat)] = cat
    valid = np.zeros(max_t, bool)
    valid[:len(cat)] = True
    return out, valid
