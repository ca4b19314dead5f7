"""Knowledge-distillation losses (strategies 1-5) as fixed-shape jittables.

Reference: compute_lost_KD{,2,3,4,5} (utils/utils.py:435-654). The teacher is
just a second jitted forward returning (yolo_p, feature_out); both models see
identical fixed-capacity targets, so every strategy is a pure function of
(student outputs, teacher outputs, targets) — they compose with the train
step via the ``kd_loss_fn`` hook (train/trainer.py).

Deviations from the reference, by design:
- dynamic target subsets are dense (anchor, slot) grids + boolean masks
  (same device-friendly scheme as train/loss.py);
- KD5's fine-grained foreground mask marks the full expanded cell rectangle
  per target; the reference's index-expansion loop (utils/utils.py:584-600)
  only marks the diagonal of that rectangle — an artifact of appending gj/gi
  ranges independently.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .loss import build_targets_layer

T_KD = 3.0  # distillation temperature (all strategies)


def _kl_div_sum(log_p_s, p_t):
    """torch KLDivLoss(reduction='sum')(log_softmax(s), softmax(t)):
    sum(p_t * (log p_t - log p_s))."""
    log_p_t = jnp.log(jnp.clip(p_t, 1e-12))
    return jnp.sum(p_t * (log_p_t - log_p_s))


def _soft_kl(student_logits, teacher_logits, T=T_KD):
    """KL(softmax(t/T) || softmax(s/T)) summed, times T^2. Reductions in
    f32 (bf16 heads feed straight in — XLA fuses the upcast into the
    softmax reads, no extra HBM pass)."""
    log_ps = jax.nn.log_softmax(student_logits.astype(jnp.float32) / T,
                                axis=-1)
    pt = jax.nn.softmax(teacher_logits.astype(jnp.float32) / T, axis=-1)
    return _kl_div_sum(log_ps, pt) * (T * T)


def kd1(output_s: Sequence, output_t: Sequence, nc: int, batch_size: int):
    """Global KLDiv over all raw outputs (compute_lost_KD,
    utils/utils.py:435-443)."""
    Lambda_ST = 0.001
    s = jnp.concatenate([o.reshape(-1, nc + 5) for o in output_s], axis=0)
    t = jnp.concatenate([o.reshape(-1, nc + 5) for o in output_t], axis=0)
    return _soft_kl(s, t) / batch_size * Lambda_ST


def _gathered_boxes(p, lt, layout: str = 'anchor_major'):
    """Decode student/teacher boxes at assigned cells: (na*T, 4) grid units.

    layout='nhwc' gathers from the free-reshape (bs, ny, nx, na, no) head
    (the trainer's NHWC loss-layout optimization); 'anchor_major' from the
    reference (bs, na, ny, nx, no). Same rows either way."""
    if layout == 'nhwc':
        bs, ny, nx, na, no = p.shape
    else:
        bs, na, ny, nx, no = p.shape
    b = lt.b.reshape(-1)
    a = lt.a.reshape(-1)
    gj = jnp.clip(lt.gj.reshape(-1), 0, ny - 1)
    gi = jnp.clip(lt.gi.reshape(-1), 0, nx - 1)
    ps = p[b, gj, gi, a] if layout == 'nhwc' else p[b, a, gj, gi]
    ps = ps.astype(jnp.float32)
    xy = jax.nn.sigmoid(ps[:, 0:2])
    wh = jnp.exp(ps[:, 2:4]) * lt.av.reshape(-1, 2)
    return jnp.concatenate([xy, wh], axis=1)


def _per_layer_targets(output_s, targets, valid, anchor_vecs, iou_t=0.2,
                       layout: str = 'anchor_major'):
    lts = []
    for i, p in enumerate(output_s):
        if layout == 'nhwc':
            _, ny, nx, _, _ = p.shape
        else:
            _, _, ny, nx, _ = p.shape
        lts.append(build_targets_layer(targets, valid,
                                       jnp.asarray(anchor_vecs[i]), ny, nx,
                                       iou_t))
    return lts


def kd2(output_s, output_t, targets, valid, anchor_vecs, nc: int,
        iou_t: float = 0.2, layout: str = 'anchor_major'):
    """L2-to-GT with teacher margin + KLDiv on obj/cls
    (compute_lost_KD2, utils/utils.py:446-487). Box term only counts where
    the student is farther from GT than the teacher (+reg_m margin).
    Returns (loss, reg_ratio)."""
    reg_m = 0.0
    Lambda_cls, Lambda_box = 0.0001, 0.001
    lcls = jnp.zeros(())
    lbox = jnp.zeros(())
    reg_num = jnp.zeros(())
    reg_nb = jnp.zeros(())
    lts = _per_layer_targets(output_s, targets, valid, anchor_vecs, iou_t,
                             layout)
    for ps_raw, pt_raw, lt in zip(output_s, output_t, lts):
        mask = lt.mask.reshape(-1)
        tbox = jnp.concatenate([lt.txy.reshape(-1, 2), lt.twh.reshape(-1, 2)], 1)
        psbox = _gathered_boxes(ps_raw, lt, layout)
        ptbox = _gathered_boxes(pt_raw, lt, layout)
        d_s = jnp.sum(jnp.square(psbox - tbox), axis=1)
        d_t = jnp.sum(jnp.square(ptbox - tbox), axis=1)
        worse = (d_s + reg_m > d_t) & mask
        lbox = lbox + jnp.sum(d_s * worse)
        reg_num = reg_num + jnp.sum(worse)
        reg_nb = reg_nb + jnp.sum(mask)
        # obj+cls distillation over the whole map
        s_oc = ps_raw[..., 4:].reshape(-1, nc + 1)
        t_oc = pt_raw[..., 4:].reshape(-1, nc + 1)
        lcls = lcls + _soft_kl(s_oc, t_oc) / ps_raw.shape[0]
    reg_ratio = reg_num / jnp.maximum(reg_nb, 1)
    return lcls * Lambda_cls + lbox * Lambda_box, reg_ratio


def kd3(output_s, output_t, targets, valid, anchor_vecs, nc: int,
        iou_t: float = 0.2, layout: str = 'anchor_major'):
    """L2 student->teacher boxes at assigned cells + KLDiv obj/cls
    (compute_lost_KD3, utils/utils.py:490-521)."""
    Lambda_cls, Lambda_box = 0.0001, 0.001
    lcls = jnp.zeros(())
    lbox = jnp.zeros(())
    lts = _per_layer_targets(output_s, targets, valid, anchor_vecs, iou_t,
                             layout)
    for ps_raw, pt_raw, lt in zip(output_s, output_t, lts):
        mask = lt.mask.reshape(-1)
        psbox = _gathered_boxes(ps_raw, lt, layout)
        ptbox = _gathered_boxes(pt_raw, lt, layout)
        lbox = lbox + jnp.sum(jnp.sum(jnp.square(psbox - ptbox), 1) * mask)
        s_oc = ps_raw[..., 4:].reshape(-1, nc + 1)
        t_oc = pt_raw[..., 4:].reshape(-1, nc + 1)
        lcls = lcls + _soft_kl(s_oc, t_oc) / ps_raw.shape[0]
    return lcls * Lambda_cls + lbox * Lambda_box


def _feature_saliency(f):
    """NHWC feature -> per-pixel |.|-sum saliency rows (bs, h*w)
    (utils/utils.py:559-561 abs().sum(channel))."""
    return jnp.sum(jnp.abs(f), axis=-1).reshape(f.shape[0], -1)


def kd4(output_s, output_t, feature_s, feature_t, targets, valid,
        anchor_vecs, nc: int, batch_size: int, iou_t: float = 0.2,
        layout: str = 'anchor_major'):
    """KD3 + feature-map KLDiv on |sum| saliency maps
    (compute_lost_KD4, utils/utils.py:524-564)."""
    # NOTE: KD4 weights cls at 0.001 (vs 0.0001 in KD2/3) — utils/utils.py:526
    Lambda_cls, Lambda_box, Lambda_feature = 0.001, 0.001, 0.001
    lcls = jnp.zeros(())
    lbox = jnp.zeros(())
    lts = _per_layer_targets(output_s, targets, valid, anchor_vecs, iou_t,
                             layout)
    for ps_raw, pt_raw, lt in zip(output_s, output_t, lts):
        mask = lt.mask.reshape(-1)
        psbox = _gathered_boxes(ps_raw, lt, layout)
        ptbox = _gathered_boxes(pt_raw, lt, layout)
        lbox = lbox + jnp.sum(jnp.sum(jnp.square(psbox - ptbox), 1) * mask)
        s_oc = ps_raw[..., 4:].reshape(-1, nc + 1)
        t_oc = pt_raw[..., 4:].reshape(-1, nc + 1)
        lcls = lcls + _soft_kl(s_oc, t_oc) / ps_raw.shape[0]
    lfeat = jnp.zeros(())
    for fs, ft_ in zip(feature_s, feature_t):
        lfeat = lfeat + _soft_kl(_feature_saliency(fs),
                                 _feature_saliency(ft_)) / batch_size
    return lcls * Lambda_cls + lbox * Lambda_box + lfeat * Lambda_feature


def _foreground_mask(h, w, lts, strides, img_size, mode: str = 'rect'):
    """Foreground mask (h, w) batch-wise from all assigned target cells,
    expanded to the feature resolution (fine_grained_imitation_feature_mask,
    utils/utils.py:579-606).

    mode='rect' (default): mark the full e x e cell rectangle each target
    cell expands to — the geometrically-correct footprint.
    mode='diag': reference-compat. The reference appends the expansion's
    gj and gi ranges independently into parallel index arrays
    (utils/utils.py:590-596), so only the top-left corner plus the DIAGONAL
    (base+k, base+k) cells of the rectangle get marked. Kept bit-compatible
    for differential parity / exact-match fine-tuning (VERDICT r2 #7)."""
    scale = img_size / h

    def build(bs):
        m = jnp.zeros((bs, h, w))
        for lt, stride in zip(lts, strides):
            if stride < scale:
                continue
            e = max(int(stride / scale), 1)
            b = lt.b.reshape(-1)
            gj = lt.gj.reshape(-1)
            gi = lt.gi.reshape(-1)
            mask = lt.mask.reshape(-1)
            base_j = (gj * stride / scale).astype(jnp.int32)
            base_i = (gi * stride / scale).astype(jnp.int32)
            b_w = jnp.where(mask, b, bs)   # drop invalid writes
            if mode == 'diag':
                offsets = [(k, k) for k in range(e)]
            else:
                offsets = [(dj, di) for dj in range(e) for di in range(e)]
            for dj, di in offsets:
                m = m.at[b_w, jnp.clip(base_j + dj, 0, h - 1),
                         jnp.clip(base_i + di, 0, w - 1)].set(
                    1.0, mode='drop')
        return m
    return build


def kd5(output_s, output_t, feature_s, feature_t, targets, valid,
        anchor_vecs, nc: int, batch_size: int, img_size: int,
        strides: Sequence[int], iou_t: float = 0.2, mask_mode: str = 'rect',
        layout: str = 'anchor_major'):
    """KD4 with fine-grained foreground masking of the feature saliency maps
    (compute_lost_KD5, utils/utils.py:609-654). mask_mode: 'rect' (fixed
    full-rectangle footprint) or 'diag' (bit-compatible with the reference's
    diagonal-only expansion — see _foreground_mask)."""
    Lambda_cls, Lambda_box, Lambda_feature = 0.001, 0.001, 0.001
    lcls = jnp.zeros(())
    lbox = jnp.zeros(())
    lts = _per_layer_targets(output_s, targets, valid, anchor_vecs, iou_t,
                             layout)
    for ps_raw, pt_raw, lt in zip(output_s, output_t, lts):
        mask = lt.mask.reshape(-1)
        psbox = _gathered_boxes(ps_raw, lt, layout)
        ptbox = _gathered_boxes(pt_raw, lt, layout)
        lbox = lbox + jnp.sum(jnp.sum(jnp.square(psbox - ptbox), 1) * mask)
        s_oc = ps_raw[..., 4:].reshape(-1, nc + 1)
        t_oc = pt_raw[..., 4:].reshape(-1, nc + 1)
        lcls = lcls + _soft_kl(s_oc, t_oc) / ps_raw.shape[0]
    lfeat = jnp.zeros(())
    for fs, ft_ in zip(feature_s, feature_t):
        bs, h, w, _ = fs.shape
        fg = _foreground_mask(h, w, lts, strides, img_size, mask_mode)(bs)
        sal_s = (jnp.sum(jnp.abs(fs), -1) * fg).reshape(bs, -1)
        sal_t = (jnp.sum(jnp.abs(ft_), -1) * fg).reshape(bs, -1)
        lfeat = lfeat + _soft_kl(sal_s, sal_t) / batch_size
    return lcls * Lambda_cls + lbox * Lambda_box + lfeat * Lambda_feature


def kd6(output_s, output_t, targets, valid, anchor_vecs, nc: int,
        batch_size: int, iou_t: float = 0.2):
    """Fine-grained OUTPUT masking (compute_lost_KD6, utils/utils.py:670-688,
    unused upstream): zero all raw outputs except assigned (b, a, gj, gi)
    cells, then global KLDiv over rows of 3*(nc+5)."""
    Lambda_feature = 0.001
    lts = _per_layer_targets(output_s, targets, valid, anchor_vecs, iou_t)
    rows_s, rows_t = [], []
    for ps_raw, pt_raw, lt in zip(output_s, output_t, lts):
        bs, na, ny, nx, no = ps_raw.shape
        mask = jnp.zeros((bs, na, ny, nx), ps_raw.dtype)
        b_w = jnp.where(lt.mask.reshape(-1), lt.b.reshape(-1), bs)
        mask = mask.at[b_w, lt.a.reshape(-1),
                       jnp.clip(lt.gj.reshape(-1), 0, ny - 1),
                       jnp.clip(lt.gi.reshape(-1), 0, nx - 1)].set(
            1.0, mode='drop')
        rows_s.append((ps_raw * mask[..., None]).reshape(-1, na * no))
        rows_t.append((pt_raw * mask[..., None]).reshape(-1, na * no))
    s = jnp.concatenate(rows_s, axis=0)
    t = jnp.concatenate(rows_t, axis=0)
    return _soft_kl(s, t) / batch_size * Lambda_feature


def failure_case_loss_fm(masks, imgs, targets, valid):
    """FenceMask auxiliary loss (Failure_Case_Loss_FM, utils/utils.py:691-722,
    unused upstream): balance masked-pixel fraction inside vs outside GT
    boxes + KLDiv between masked and original images.

    masks/imgs: (bs, h, w, c); targets: padded (T, 6) + valid mask."""
    if masks is None:
        return jnp.zeros(())
    bs, h, w, _ = imgs.shape
    pbi = jnp.mean(masks[..., 0], axis=(1, 2)).sum()

    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)[None]
    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)[None]
    b = targets[:, 0].astype(jnp.int32)
    x1 = (targets[:, 2] - targets[:, 4] / 2) * w
    x2 = (targets[:, 2] + targets[:, 4] / 2) * w
    y1 = (targets[:, 3] - targets[:, 5] / 2) * h
    y2 = (targets[:, 3] + targets[:, 5] / 2) * h
    inside = ((gx >= x1[:, None, None]) & (gx < x2[:, None, None]) &
              (gy >= y1[:, None, None]) & (gy < y2[:, None, None]))
    m_per_img = jnp.mean(masks, axis=-1)                         # (bs, h, w)
    m_t = m_per_img[jnp.clip(b, 0, bs - 1)]                      # (T, h, w)
    area = jnp.maximum(jnp.sum(inside, axis=(1, 2)), 1)
    pbo = jnp.sum(jnp.sum(m_t * inside, axis=(1, 2)) / area * valid)
    f_loss = jnp.abs(pbi - pbo) / bs

    fm = jax.nn.log_softmax((masks * imgs).reshape(bs, -1), axis=-1)
    om = jax.nn.softmax(imgs.reshape(bs, -1), axis=-1)
    d_loss = _kl_div_sum(fm, om)
    return f_loss + d_loss


def make_kd_loss_fn(strategy: int, teacher_apply, t_params, t_state, nc: int,
                    anchor_vecs, img_size: int = 416,
                    strides: Sequence[int] = (32, 16, 8),
                    kd5_mask: str = 'diag', layout: str = 'anchor_major'):
    """Build the kd_loss_fn hook for make_train_functions (train.py:389-435).

    The teacher forward runs inside the jitted student step (eval-mode,
    stop-gradient). ``layout`` declares the yolo_p layout BOTH the student
    step and the teacher apply emit ('nhwc' pairs with the trainer's NHWC
    loss-layout optimization; strategies 1-5 gather identically there —
    the KL row sets are layout-invariant and the box gather is explicit).
    KD6's output-mask row grouping is tied to the reference anchor-major
    flatten, so it requires 'anchor_major'. Exposed as ``.layout`` for the
    trainer."""
    assert not (strategy == 6 and layout == 'nhwc'), \
        "KD6's row grouping requires head_layout='anchor_major'"

    def kd_loss_fn(yolo_p, feats, targets, valid, imgs):
        (t_yolo, t_feats), _ = teacher_apply(t_params, t_state, imgs, True)
        t_yolo = [jax.lax.stop_gradient(t) for t in t_yolo]
        t_feats = [jax.lax.stop_gradient(t) for t in t_feats]
        bs = imgs.shape[0]
        if strategy == 1:
            return kd1(yolo_p, t_yolo, nc, bs)
        if strategy == 2:
            return kd2(yolo_p, t_yolo, targets, valid, anchor_vecs, nc,
                       layout=layout)[0]
        if strategy == 3:
            return kd3(yolo_p, t_yolo, targets, valid, anchor_vecs, nc,
                       layout=layout)
        if strategy == 4:
            return kd4(yolo_p, t_yolo, feats, t_feats, targets, valid,
                       anchor_vecs, nc, bs, layout=layout)
        if strategy == 5:
            return kd5(yolo_p, t_yolo, feats, t_feats, targets, valid,
                       anchor_vecs, nc, bs, img_size, strides,
                       mask_mode=kd5_mask, layout=layout)
        if strategy == 6:
            return kd6(yolo_p, t_yolo, targets, valid, anchor_vecs, nc, bs)
        raise ValueError(f'unknown KD strategy {strategy}')

    kd_loss_fn.layout = layout
    return kd_loss_fn
