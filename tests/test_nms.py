"""Batched NMS behavior tests (vs reference utils/utils.py:782-860 contract)."""

import numpy as np
import jax.numpy as jnp

from yolo_tpu.ops.nms import non_max_suppression, to_host_detections


def _pred(rows, nc=3, n_pad=32):
    """rows: list of (x, y, w, h, obj, cls_idx, cls_conf)."""
    out = np.zeros((n_pad, 5 + nc), np.float32)
    for i, (x, y, w, h, obj, ci, cc) in enumerate(rows):
        out[i, :4] = [x, y, w, h]
        out[i, 4] = obj
        out[i, 5 + ci] = cc
    return out[None]  # bs=1


def test_nms_suppresses_overlaps():
    pred = _pred([
        (100, 100, 50, 50, 0.9, 0, 0.9),   # keep (highest score)
        (102, 102, 50, 50, 0.8, 0, 0.9),   # suppressed (same class, high IoU)
        (300, 300, 40, 40, 0.7, 1, 0.8),   # keep (different location)
    ])
    out = to_host_detections(non_max_suppression(
        jnp.asarray(pred), conf_thres=0.1, iou_thres=0.5, merge=False))
    d = out[0]
    assert d is not None and len(d) == 2
    assert set(d[:, 5].astype(int)) == {0, 1}


def test_nms_class_offset_keeps_cross_class():
    """Same box, two classes -> both survive (class-offset batched NMS)."""
    pred = _pred([
        (100, 100, 50, 50, 0.9, 0, 0.9),
        (100, 100, 50, 50, 0.8, 1, 0.9),
    ])
    out = to_host_detections(non_max_suppression(
        jnp.asarray(pred), conf_thres=0.1, iou_thres=0.5, merge=False))
    assert len(out[0]) == 2


def test_nms_conf_threshold_and_wh_constraints():
    pred = _pred([
        (100, 100, 50, 50, 0.05, 0, 0.9),     # below obj conf
        (200, 200, 1, 1, 0.9, 0, 0.9),        # wh too small (< 2px)
        (300, 300, 5000, 50, 0.9, 0, 0.9),    # wh too large (> 4096)
        (400, 400, 30, 30, 0.9, 0, 0.9),      # keep
    ])
    out = to_host_detections(non_max_suppression(
        jnp.asarray(pred), conf_thres=0.1, iou_thres=0.5))
    assert len(out[0]) == 1
    np.testing.assert_allclose(out[0][0, :4], [385, 385, 415, 415], atol=1e-3)


def test_nms_merge_weighted_fusion():
    """merge-NMS averages overlapping boxes weighted by score
    (reference utils/utils.py:846-853)."""
    pred = _pred([
        (100, 100, 50, 50, 0.9, 0, 1.0),
        (104, 104, 50, 50, 0.9, 0, 0.8),
    ])
    out_merge = to_host_detections(non_max_suppression(
        jnp.asarray(pred), conf_thres=0.1, iou_thres=0.5, merge=True))
    out_plain = to_host_detections(non_max_suppression(
        jnp.asarray(pred), conf_thres=0.1, iou_thres=0.5, merge=False))
    assert len(out_merge[0]) == 1 and len(out_plain[0]) == 1
    # merged box must sit between the two raw boxes
    assert out_plain[0][0, 0] < out_merge[0][0, 0] < out_plain[0][0, 0] + 4


def test_nms_multilabel():
    pred = _pred([(100, 100, 40, 40, 0.9, 0, 0.0)], nc=3)
    pred[0, 0, 5:] = [0.9, 0.8, 0.05]  # two classes above threshold
    out = to_host_detections(non_max_suppression(
        jnp.asarray(pred), conf_thres=0.1, iou_thres=0.5, multi_label=True,
        merge=False))
    assert len(out[0]) == 2
    out1 = to_host_detections(non_max_suppression(
        jnp.asarray(pred), conf_thres=0.1, iou_thres=0.5, multi_label=False,
        merge=False))
    assert len(out1[0]) == 1


def test_nms_batch_independent():
    p1 = _pred([(100, 100, 50, 50, 0.9, 0, 0.9)])
    p2 = _pred([(50, 50, 30, 30, 0.8, 1, 0.9)])
    batch = np.concatenate([p1, p2], axis=0)
    out = to_host_detections(non_max_suppression(
        jnp.asarray(batch), conf_thres=0.1, iou_thres=0.5))
    assert len(out) == 2
    assert int(out[0][0, 5]) == 0 and int(out[1][0, 5]) == 1


def test_nms_empty():
    pred = np.zeros((1, 16, 8), np.float32)
    out = to_host_detections(non_max_suppression(jnp.asarray(pred)))
    assert out[0] is None


def test_nms_fixpoint_equals_sequential_greedy():
    """The iterative-fixpoint suppression must match plain sequential greedy
    NMS on random boxes (chains included)."""
    rng = np.random.RandomState(0)
    for trial in range(5):
        n = 60
        centers = rng.uniform(50, 450, (n, 2))
        sizes = rng.uniform(20, 120, (n, 2))
        obj = rng.uniform(0.2, 1.0, n)
        pred = np.zeros((n, 6), np.float32)   # nc=1
        pred[:, 0:2] = centers
        pred[:, 2:4] = sizes
        pred[:, 4] = obj
        pred[:, 5] = 1.0

        out = to_host_detections(non_max_suppression(
            jnp.asarray(pred[None]), conf_thres=0.1, iou_thres=0.5,
            top_k=64, max_det=64, merge=False, multi_label=False))

        # numpy sequential greedy on the same candidate ordering
        order = np.argsort(-obj)
        boxes = np.stack([centers[:, 0] - sizes[:, 0] / 2,
                          centers[:, 1] - sizes[:, 1] / 2,
                          centers[:, 0] + sizes[:, 0] / 2,
                          centers[:, 1] + sizes[:, 1] / 2], 1)

        def iou(a, b):
            lt = np.maximum(a[:2], b[:2]); rb = np.minimum(a[2:], b[2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[0] * wh[1]
            area = lambda x: (x[2] - x[0]) * (x[3] - x[1])
            return inter / (area(a) + area(b) - inter + 1e-16)

        kept = []
        for i in order:
            if all(iou(boxes[i], boxes[j]) <= 0.5 for j in kept):
                kept.append(i)
        expect = np.sort(obj[kept])[::-1]
        got = np.sort(out[0][:, 4])[::-1] if out[0] is not None else np.zeros(0)
        np.testing.assert_allclose(got, expect, rtol=1e-5, err_msg=f'trial {trial}')


def test_heads_path_matches_dense_path():
    """Sparse-decode NMS (non_max_suppression_heads) must produce the same
    detections as the dense io path when the candidate buffers don't
    overflow (exact top-k on CPU)."""
    import jax
    from yolo_tpu.models.yolo_head import decode_yolo_nhwc
    from yolo_tpu.ops.nms import non_max_suppression_heads

    rng = np.random.RandomState(3)
    bs, nc, na = 2, 4, 3
    no = nc + 5
    shapes = [(8, 8, 32), (16, 16, 16)]          # (ny, nx, stride)
    anchors = [np.array([[80, 90], [120, 60], [200, 200]], np.float32),
               np.array([[20, 30], [40, 25], [60, 60]], np.float32)]

    heads, ios = [], []
    for (ny, nx, stride), anc in zip(shapes, anchors):
        x = rng.uniform(-9, -5, (bs, ny, nx, na * no)).astype(np.float32)
        # sprinkle confident boxes: high obj + one or two strong classes
        for b in range(bs):
            for _ in range(12):
                yy, xx, aa = (rng.randint(ny), rng.randint(nx),
                              rng.randint(na))
                base = aa * no
                x[b, yy, xx, base:base + 4] = rng.uniform(-1, 1, 4)
                x[b, yy, xx, base + 4] = rng.uniform(2.0, 5.0)       # obj
                ci = rng.randint(nc)
                x[b, yy, xx, base + 5 + ci] = rng.uniform(2.0, 5.0)  # cls
        x = jnp.asarray(x)
        heads.append(x)
        ios.append(decode_yolo_nhwc(x, jnp.asarray(anc), stride, no))

    io = jnp.concatenate(ios, axis=1)
    kw = dict(conf_thres=0.3, iou_thres=0.5, top_k=64, max_det=32)
    dense = np.asarray(non_max_suppression(io, **kw))
    strides = [s for (_, _, s) in shapes]
    sparse = np.asarray(jax.jit(
        lambda hs: non_max_suppression_heads(
            hs, anchors, strides, no, **kw))(heads))

    # both paths produce score-sorted fixed-slot outputs; crafted boxes are
    # tie-free so the slot order must agree exactly
    assert (dense[..., 4] > 0).sum() > 8      # the test actually detects
    np.testing.assert_allclose(sparse, dense, rtol=1e-5, atol=1e-5)


def test_make_infer_sparse_wiring(repo_root):
    """ModelBundle.make_infer(sparse=True) compiles and matches the dense
    pipeline output shape contract on a real cfg."""
    from yolo_tpu.runtime import load_model
    bundle = load_model(f'{repo_root}/cfg/yolov3tiny/yolov3-tiny.cfg').fuse()
    x = jnp.asarray(np.random.RandomState(0).rand(1, 224, 224, 3),
                    jnp.float32)
    dense_fn = bundle.make_infer(conf_thres=0.9, max_det=16, sparse=False)
    sparse_fn = bundle.make_infer(conf_thres=0.9, max_det=16, sparse=True)
    d, s = np.asarray(dense_fn(x)), np.asarray(sparse_fn(x))
    assert d.shape == s.shape == (1, 16, 6)
    np.testing.assert_allclose(s, d, rtol=1e-4, atol=1e-4)


def test_heads_cell_mode_matches_dense_path():
    """Cell-mode sparse NMS (obj maps provided) must match the dense path."""
    import jax
    from yolo_tpu.models.yolo_head import decode_yolo_nhwc
    from yolo_tpu.ops.nms import non_max_suppression_heads

    rng = np.random.RandomState(7)
    bs, nc, na = 2, 4, 3
    no = nc + 5
    shapes = [(8, 8, 32), (16, 16, 16)]
    anchors = [np.array([[80, 90], [120, 60], [200, 200]], np.float32),
               np.array([[20, 30], [40, 25], [60, 60]], np.float32)]

    heads, objs, ios = [], [], []
    for (ny, nx, stride), anc in zip(shapes, anchors):
        x = rng.uniform(-9, -5, (bs, ny, nx, na * no)).astype(np.float32)
        for b in range(bs):
            for _ in range(12):
                yy, xx, aa = rng.randint(ny), rng.randint(nx), rng.randint(na)
                base = aa * no
                x[b, yy, xx, base:base + 4] = rng.uniform(-1, 1, 4)
                x[b, yy, xx, base + 4] = rng.uniform(2.0, 5.0)
                x[b, yy, xx, base + 5 + rng.randint(nc)] = rng.uniform(2.0, 5.0)
        x = jnp.asarray(x)
        heads.append(x)
        objs.append(x[..., 4::no])                 # exact obj-channel slice
        ios.append(decode_yolo_nhwc(x, jnp.asarray(anc), stride, no))

    io = jnp.concatenate(ios, axis=1)
    kw = dict(conf_thres=0.3, iou_thres=0.5, top_k=64, max_det=32)
    dense = np.asarray(non_max_suppression(io, **kw))
    strides = [s for (_, _, s) in shapes]
    sparse = np.asarray(jax.jit(
        lambda hs, os_: non_max_suppression_heads(
            hs, anchors, strides, no, objs=os_, **kw))(heads, objs))

    assert (dense[..., 4] > 0).sum() > 8
    np.testing.assert_allclose(sparse, dense, rtol=1e-5, atol=1e-5)


def test_classes_filter_in_candidate_stage():
    """--classes masking happens BEFORE top-k/suppression, so excluded
    classes never consume max_det slots (reference utils/utils.py:808-810
    filters candidates inside NMS)."""
    rng = np.random.RandomState(4)
    n, nc = 64, 6
    pred = np.zeros((1, n, 5 + nc), np.float32)
    pred[0, :, 0:2] = rng.uniform(50, 350, (n, 2))
    pred[0, :, 2:4] = rng.uniform(20, 60, (n, 2))
    pred[0, :, 4] = 0.9
    # class 0 everywhere except a handful of class-3 boxes
    pred[0, :, 5] = 0.95
    pred[0, ::7, 5] = 0.1
    pred[0, ::7, 8] = 0.95

    out_all = np.asarray(non_max_suppression(
        jnp.asarray(pred), conf_thres=0.3, multi_label=False, max_det=16))
    out_cls3 = np.asarray(non_max_suppression(
        jnp.asarray(pred), conf_thres=0.3, multi_label=False, max_det=16,
        classes=(3,)))
    kept_all = out_all[0][out_all[0][:, 4] > 0]
    kept3 = out_cls3[0][out_cls3[0][:, 4] > 0]
    assert set(np.unique(kept3[:, 5].astype(int))) <= {3}
    assert len(kept3) > 0
    # every class-3 detection survives even though class-0 boxes dominate
    n3_in_all = (kept_all[:, 5].astype(int) == 3).sum()
    assert len(kept3) >= n3_in_all
