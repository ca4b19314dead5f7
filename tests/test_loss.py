"""Loss parity tests: the jittable fixed-shape loss vs a dynamic-shape numpy
re-statement of the reference semantics (utils/utils.py:368-432, 725-779)."""

import numpy as np
import jax
import jax.numpy as jnp

from yolo_tpu.train.loss import (LossHyp, bce_with_logits, compute_loss,
                                 pad_targets)


def _sigmoid(x):
    return 1 / (1 + np.exp(-x))


def _np_bce(logits, labels, pw):
    lp = np.log(_sigmoid(logits))
    lnp = np.log(1 - _sigmoid(logits) + 1e-300)
    return -(pw * labels * lp + (1 - labels) * lnp)


def _np_wh_iou(wh1, wh2):
    inter = np.minimum(wh1[:, None], wh2[None]).prod(2)
    return inter / (wh1[:, None].prod(2) + wh2[None].prod(2) - inter)


def _np_giou_xywh(box1, box2):
    b1x1, b1x2 = box1[:, 0] - box1[:, 2] / 2, box1[:, 0] + box1[:, 2] / 2
    b1y1, b1y2 = box1[:, 1] - box1[:, 3] / 2, box1[:, 1] + box1[:, 3] / 2
    b2x1, b2x2 = box2[:, 0] - box2[:, 2] / 2, box2[:, 0] + box2[:, 2] / 2
    b2y1, b2y2 = box2[:, 1] - box2[:, 3] / 2, box2[:, 1] + box2[:, 3] / 2
    inter = (np.clip(np.minimum(b1x2, b2x2) - np.maximum(b1x1, b2x1), 0, None) *
             np.clip(np.minimum(b1y2, b2y2) - np.maximum(b1y1, b2y1), 0, None))
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1
    union = w1 * h1 + 1e-16 + w2 * h2 - inter
    iou = inter / union
    cw = np.maximum(b1x2, b2x2) - np.minimum(b1x1, b2x1)
    ch = np.maximum(b1y2, b2y2) - np.minimum(b1y1, b2y1)
    c_area = cw * ch + 1e-16
    return iou - (c_area - union) / c_area


def _reference_loss(p, targets, anchor_vecs, nc, hyp, gr):
    """Dynamic-shape numpy port of reference compute_loss/build_targets."""
    lbox = lobj = lcls = 0.0
    for i, pi in enumerate(p):
        bs, na, ny, nx, no = pi.shape
        anchors = anchor_vecs[i]
        gain = np.array([1, 1, nx, ny, nx, ny], np.float64)
        t = targets * gain
        nt = len(t)
        if nt:
            iou = _np_wh_iou(anchors, t[:, 4:6])
            a = np.tile(np.arange(na)[:, None], (1, nt)).reshape(-1)
            t_all = np.tile(t, (na, 1))
            j = iou.reshape(-1) > hyp.iou_t
            t_sel, a_sel = t_all[j], a[j]
        else:
            t_sel, a_sel = np.zeros((0, 6)), np.zeros(0, int)
        b = t_sel[:, 0].astype(int)
        c = t_sel[:, 1].astype(int)
        gxy = t_sel[:, 2:4]
        gwh = t_sel[:, 4:6]
        gi, gj = gxy[:, 0].astype(int), gxy[:, 1].astype(int)
        txy = gxy - np.floor(gxy)
        tobj = np.zeros((bs, na, ny, nx))
        nb = len(b)
        if nb:
            ps = pi[b, a_sel, gj, gi]
            pxy = _sigmoid(ps[:, 0:2])
            pwh = np.clip(np.exp(ps[:, 2:4]), None, 1e3) * anchors[a_sel]
            giou = _np_giou_xywh(np.concatenate([pxy, pwh], 1),
                                 np.concatenate([txy, gwh], 1))
            lbox += (1.0 - giou).mean()
            tobj[b, a_sel, gj, gi] = (1.0 - gr) + gr * np.clip(giou, 0, None)
            if nc > 1:
                tc = np.zeros((nb, nc))
                tc[np.arange(nb), c] = 1.0
                lcls += _np_bce(ps[:, 5:], tc, hyp.cls_pw).mean()
        lobj += _np_bce(pi[..., 4], tobj, hyp.obj_pw).mean()
    lbox *= hyp.giou
    lobj *= hyp.obj
    lcls *= hyp.cls
    return lbox + lobj + lcls, np.array([lbox, lobj, lcls])


def _random_case(seed, bs=2, nc=3, nt_per_img=4, shapes=((4, 4), (8, 8))):
    rng = np.random.RandomState(seed)
    na = 3
    anchor_vecs = [rng.uniform(0.5, 4, (na, 2)) for _ in shapes]
    p = [rng.randn(bs, na, ny, nx, nc + 5).astype(np.float64)
         for (ny, nx) in shapes]
    labels = []
    for _ in range(bs):
        lab = np.zeros((nt_per_img, 5))
        lab[:, 0] = rng.randint(0, nc, nt_per_img)
        lab[:, 1:3] = rng.uniform(0.1, 0.9, (nt_per_img, 2))
        lab[:, 3:5] = rng.uniform(0.05, 0.4, (nt_per_img, 2))
        labels.append(lab)
    return p, labels, anchor_vecs, nc


def test_loss_matches_reference_semantics():
    p, labels, anchor_vecs, nc = _random_case(0)
    hyp = LossHyp()
    rows = np.concatenate([
        np.concatenate([np.full((len(l), 1), i), l], 1)
        for i, l in enumerate(labels)])
    ref_total, ref_items = _reference_loss(p, rows, anchor_vecs, nc, hyp, gr=1.0)

    tgt, valid = pad_targets(labels, max_t=32)
    loss, items = compute_loss([jnp.asarray(x, jnp.float32) for x in p],
                               jnp.asarray(tgt), jnp.asarray(valid),
                               anchor_vecs, nc, hyp, gr=1.0)
    np.testing.assert_allclose(float(loss), ref_total, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(items[:3]), ref_items, rtol=2e-4)


def test_loss_no_targets():
    p, labels, anchor_vecs, nc = _random_case(1)
    hyp = LossHyp()
    tgt, valid = pad_targets([np.zeros((0, 5))] * 2, max_t=16)
    loss, items = compute_loss([jnp.asarray(x, jnp.float32) for x in p],
                               jnp.asarray(tgt), jnp.asarray(valid),
                               anchor_vecs, nc, hyp, gr=1.0)
    assert np.isfinite(float(loss))
    assert float(items[0]) == 0.0 and float(items[2]) == 0.0
    assert float(items[1]) > 0.0  # obj loss on all-negative map


def test_loss_img_weight_excludes_pad_slots():
    """Eval passes a per-image 0/1 weight so batch pad slots (ragged tails,
    multi-host wrap-pad duplicates) drop out of every loss mean: a 3-image
    batch with the last slot weighted 0 reports exactly the 2-image batch's
    loss, no matter what image or labels sit in the pad slot."""
    p, labels, anchor_vecs, nc = _random_case(3, bs=2)
    hyp = LossHyp()
    tgt2, valid2 = pad_targets(labels, max_t=32)
    _, ref_items = compute_loss([jnp.asarray(x, jnp.float32) for x in p],
                                jnp.asarray(tgt2), jnp.asarray(valid2),
                                anchor_vecs, nc, hyp, gr=1.0)

    # pad slot = a duplicate of image 0 WITH its labels marked valid (the
    # multi-host wrap-pad shape) — weight 0 must erase it from the means
    p3, labels3, _, _ = _random_case(3, bs=3)
    for i, x in enumerate(p):
        p3[i][:2] = x
        p3[i][2] = x[0]
    labels3 = list(labels) + [labels[0]]
    tgt3, valid3 = pad_targets(labels3, max_t=48)
    _, w_items = compute_loss([jnp.asarray(x, jnp.float32) for x in p3],
                              jnp.asarray(tgt3), jnp.asarray(valid3),
                              anchor_vecs, nc, hyp, gr=1.0,
                              img_weight=jnp.asarray([1.0, 1.0, 0.0]))
    np.testing.assert_allclose(np.asarray(w_items), np.asarray(ref_items),
                               rtol=1e-6, atol=1e-8)

    # all-ones weight == the unweighted reduction
    _, ones_items = compute_loss([jnp.asarray(x, jnp.float32) for x in p],
                                 jnp.asarray(tgt2), jnp.asarray(valid2),
                                 anchor_vecs, nc, hyp, gr=1.0,
                                 img_weight=jnp.ones(2))
    np.testing.assert_allclose(np.asarray(ones_items),
                               np.asarray(ref_items), rtol=1e-6, atol=1e-8)


def test_loss_grad_flows():
    p, labels, anchor_vecs, nc = _random_case(2)
    hyp = LossHyp()
    tgt, valid = pad_targets(labels, max_t=32)

    def f(p0):
        loss, _ = compute_loss([p0] + [jnp.asarray(x, jnp.float32)
                                       for x in p[1:]],
                               jnp.asarray(tgt), jnp.asarray(valid),
                               anchor_vecs, nc, hyp, gr=0.5)
        return loss

    g = jax.grad(f)(jnp.asarray(p[0], jnp.float32))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_bce_matches_torch():
    import torch
    logits = np.random.RandomState(3).randn(5, 7).astype(np.float32)
    labels = (np.random.RandomState(4).rand(5, 7) > 0.5).astype(np.float32)
    ref = torch.nn.BCEWithLogitsLoss(
        pos_weight=torch.tensor([2.0]), reduction='none')(
        torch.from_numpy(logits), torch.from_numpy(labels)).numpy()
    got = np.asarray(bce_with_logits(jnp.asarray(logits), jnp.asarray(labels), 2.0))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
