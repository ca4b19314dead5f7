"""AP/matching metric tests (reference utils/utils.py:162-251, test.py:157-181)."""

import numpy as np

from yolo_tpu.eval.metrics import (ap_per_class, coco80_to_coco91_class,
                                   compute_ap, fitness, match_predictions)


def test_compute_ap_perfect():
    recall = np.array([0.5, 1.0])
    precision = np.array([1.0, 1.0])
    assert compute_ap(recall, precision) > 0.99


def test_compute_ap_zero():
    assert compute_ap(np.array([0.0]), np.array([0.0])) < 0.02


def test_ap_per_class_perfect_detector():
    # 4 predictions, all correct, 2 classes
    tp = np.ones((4, 1), bool)
    conf = np.array([0.9, 0.8, 0.7, 0.6])
    pred_cls = np.array([0, 0, 1, 1])
    target_cls = np.array([0, 0, 1, 1])
    p, r, ap, f1, uc = ap_per_class(tp, conf, pred_cls, target_cls)
    assert (ap > 0.99).all()
    assert list(uc) == [0, 1]


def test_ap_per_class_false_positives():
    tp = np.array([[True], [False], [True], [False]])
    conf = np.array([0.9, 0.85, 0.7, 0.6])
    pred_cls = np.zeros(4)
    target_cls = np.zeros(2)
    p, r, ap, f1, uc = ap_per_class(tp, conf, pred_cls, target_cls)
    assert 0.4 < ap[0, 0] < 1.0


def test_match_predictions_greedy():
    iouv = np.array([0.5])
    # two preds on one target: only best-iou one is credited
    pred = np.array([
        [0, 0, 10, 10, 0.9, 0],
        [1, 1, 11, 11, 0.8, 0],
    ], np.float64)
    tboxes = np.array([[0, 0, 10, 10]], np.float64)
    correct = match_predictions(pred, np.array([0.0]), tboxes, iouv)
    assert correct.sum() == 1 and correct[0, 0]


def test_match_predictions_class_mismatch():
    iouv = np.array([0.5])
    pred = np.array([[0, 0, 10, 10, 0.9, 1]], np.float64)
    tboxes = np.array([[0, 0, 10, 10]], np.float64)
    correct = match_predictions(pred, np.array([0.0]), tboxes, iouv)
    assert correct.sum() == 0


def test_fitness_weights_map_only():
    x = np.array([[0.1, 0.2, 0.7, 0.3]])
    assert fitness(x)[0] == 0.7


def test_coco91_mapping():
    m = coco80_to_coco91_class()
    assert len(m) == 80
    assert m[0] == 1 and m[-1] == 90 and 12 not in m and 91 not in m


def test_match_predictions_multiclass_no_early_break():
    """The per-image match loop must only stop when ALL of the image's
    targets are matched — not when the cross-class detected count happens to
    equal one class's target count (regression: 2x class-0 + 3x class-1 with
    5 perfect predictions must yield 5 TPs)."""
    import numpy as np
    from yolo_tpu.eval.metrics import match_predictions
    boxes = np.array([[0, 0, 10, 10], [20, 0, 30, 10], [40, 0, 50, 10],
                      [60, 0, 70, 10], [80, 0, 90, 10]], np.float64)
    cls = np.array([0, 0, 1, 1, 1], np.float64)
    pred = np.concatenate([boxes, np.full((5, 1), 0.9), cls[:, None]], 1)
    correct = match_predictions(pred, cls, boxes, np.array([0.5]))
    assert correct.all(), correct.ravel()


def test_device_matching_equals_host():
    """eval/matching.py (device-side lax.scan TP assignment) reproduces the
    host match_predictions loop (reference test.py:157-181) exactly,
    including the argmax-before-claim no-reassignment behaviour."""
    import jax.numpy as jnp
    from yolo_tpu.eval.matching import match_device

    rng = np.random.RandomState(7)
    iouv = (0.5, 0.6, 0.75)
    w = h = 320.0
    bs, max_det, max_t = 3, 32, 24

    # random targets: (T, 6) img, cls, xywh normalised
    T = 20
    tgt = np.zeros((max_t, 6), np.float32)
    tgt[:T, 0] = rng.randint(0, bs, T)
    tgt[:T, 1] = rng.randint(0, 4, T)
    tgt[:T, 2:4] = rng.uniform(0.2, 0.8, (T, 2))
    tgt[:T, 4:6] = rng.uniform(0.1, 0.3, (T, 2))
    valid = np.zeros(max_t, bool)
    valid[:T] = True

    # detections: half jittered copies of targets (TPs), half random
    dets = np.zeros((bs, max_det, 6), np.float32)
    for b in range(bs):
        rows = []
        for t in tgt[:T][tgt[:T, 0] == b]:
            for _ in range(rng.randint(1, 3)):   # duplicates exercise claims
                c = t[2:6] * [w, h, w, h] + rng.uniform(-6, 6, 4)
                x1, y1 = c[0] - c[2] / 2, c[1] - c[3] / 2
                x2, y2 = c[0] + c[2] / 2, c[1] + c[3] / 2
                cls = t[1] if rng.rand() < 0.8 else rng.randint(0, 4)
                rows.append([x1, y1, x2, y2, rng.uniform(0.2, 1.0), cls])
        for _ in range(6):
            x1, y1 = rng.uniform(0, w - 50, 2)
            rows.append([x1, y1, x1 + rng.uniform(10, 60),
                         y1 + rng.uniform(10, 60),
                         rng.uniform(0.2, 1.0), rng.randint(0, 4)])
        rows = np.asarray(rows, np.float32)
        rows = rows[np.argsort(-rows[:, 4])][:max_det]   # conf desc like NMS
        dets[b, :len(rows)] = rows

    correct_dev = np.asarray(match_device(
        jnp.asarray(dets), jnp.asarray(tgt), jnp.asarray(valid), w, h, iouv))

    for b in range(bs):
        keep = dets[b][:, 4] > 0
        pred = dets[b][keep].copy()
        pred[:, [0, 2]] = pred[:, [0, 2]].clip(0, w)
        pred[:, [1, 3]] = pred[:, [1, 3]].clip(0, h)
        labels = tgt[:T][tgt[:T, 0] == b][:, 1:]
        tbox = np.zeros((len(labels), 4), np.float32)
        if len(labels):
            xywh = labels[:, 1:5] * [w, h, w, h]
            tbox[:, 0] = xywh[:, 0] - xywh[:, 2] / 2
            tbox[:, 1] = xywh[:, 1] - xywh[:, 3] / 2
            tbox[:, 2] = xywh[:, 0] + xywh[:, 2] / 2
            tbox[:, 3] = xywh[:, 1] + xywh[:, 3] / 2
        host = match_predictions(pred, labels[:, 0], tbox,
                                 np.asarray(iouv))
        np.testing.assert_array_equal(correct_dev[b][keep], host,
                                      err_msg=f'image {b}')
