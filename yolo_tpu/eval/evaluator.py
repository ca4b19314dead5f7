"""mAP evaluator (reference test.py:10-253) on the jitted inference pipeline.

Device side: fused forward + decode + batched NMS per batch shape (cached
jit). Host side: per-image greedy matching + AP accumulation in numpy.
Printout contract matches the reference ('Class Images Targets P R mAP F1').
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from ..config import load_classes, parse_data_cfg
from ..data.datasets import BatchLoader, DetectionDataset
from ..models.network import make_apply
from ..ops.nms import non_max_suppression, to_host_detections
from .metrics import (ap_per_class, coco80_to_coco91_class,
                      match_predictions)


_INFER_CACHE = {}


def _build_infer(net, *, quant_apply, anchor_vecs, loss_hyp,
                 want_loss, augment, sparse, fused, compute_dtype,
                 maxabsscaler, conf_thres, iou_thres, top_k, max_det,
                 multi_label, iouv_t, device_match, nc):
    """Construct the jitted per-batch eval step (forward + NMS [+ loss,
    + device TP matching]). qstate is an explicit argument (None for the
    float paths) so per-epoch QAT eval hits the cross-call cache in
    evaluate() instead of retracing on a fresh qstate pytree."""
    if augment:
        from ..models.network import make_augmented_apply
        aug_apply = make_augmented_apply(net, compute_dtype=compute_dtype,
                                         maxabsscaler=maxabsscaler,
                                         fused=fused)

        def fwd(params, state, qstate, x):
            return aug_apply(params, state, x), [], []
    elif quant_apply is not None:
        if sparse:
            # sparse-decode eval for QAT/PTQ fake-quant models (VERDICT r3
            # next #3): the heads-only twin skips the dense (bs, N, 5+nc)
            # io materialisation, same as the float and int8-engine paths
            h_apply = quant_apply.make_heads_only()

            def fwd(params, state, qstate, x):
                return h_apply(params, state, qstate, x, False)
        else:
            def fwd(params, state, qstate, x):
                return quant_apply(params, state, qstate, x, False)
    else:
        apply = make_apply(net, compute_dtype=compute_dtype, fused=fused,
                           heads_only=sparse)

        def fwd(params, state, qstate, x):
            return apply(params, state, x, train=False)

    if sparse:
        from ..models.yolo_head import reshape_pred
        from ..ops.nms import non_max_suppression_heads
        yolos = [l for l in net.layers if l.kind == 'yolo']
        anchors = [l.anchors for l in yolos]
        strides = [l.yolo_stride for l in yolos]
        nas = [(l.na, l.no) for l in yolos]

    def _epilogue(dets, x, targets, valid):
        """Optional in-graph TP assignment (eval/matching.py)."""
        if not device_match:
            return None
        from .matching import match_device
        return match_device(dets, targets, valid,
                            float(x.shape[2]), float(x.shape[1]), iouv_t)

    if sparse:
        @jax.jit
        def infer(params, state, qstate, x, targets, valid, img_w):
            heads, objs = fwd(params, state, qstate, x)
            dets = non_max_suppression_heads(
                heads, anchors, strides, yolos[0].no, conf_thres=conf_thres,
                iou_thres=iou_thres, top_k=top_k, max_det=max_det,
                multi_label=multi_label, objs=objs)
            correct = _epilogue(dets, x, targets, valid)
            if want_loss:
                from ..train.loss import compute_loss
                yolo_p = [reshape_pred(h, na, no)
                          for h, (na, no) in zip(heads, nas)]
                _, items = compute_loss(
                    [p.astype(jnp.float32) for p in yolo_p], targets, valid,
                    anchor_vecs, nc, loss_hyp, 1.0, img_weight=img_w)
                return dets, items[:3], correct
            return dets, jnp.zeros(3), correct
    else:
        # quant applies may emit NHWC-layout heads (make_quant_apply
        # head_layout='nhwc', the training-path default)
        loss_layout = getattr(quant_apply, 'head_layout', 'anchor_major') \
            if quant_apply is not None else 'anchor_major'

        @jax.jit
        def infer(params, state, qstate, x, targets, valid, img_w):
            io, yolo_p, _ = fwd(params, state, qstate, x)
            dets = non_max_suppression(io, conf_thres=conf_thres,
                                       iou_thres=iou_thres, top_k=top_k,
                                       max_det=max_det,
                                       multi_label=multi_label)
            correct = _epilogue(dets, x, targets, valid)
            if want_loss:
                from ..train.loss import compute_loss
                _, items = compute_loss(
                    [p.astype(jnp.float32) for p in yolo_p], targets, valid,
                    anchor_vecs, nc, loss_hyp, 1.0, layout=loss_layout,
                    img_weight=img_w)
                return dets, items[:3], correct
            return dets, jnp.zeros(3), correct
    return infer


def _plot_eval_batch0(batch0, det_list, names):
    """GT-vs-pred mosaics of the first eval batch -> test_batch0_gt.jpg /
    test_batch0_pred.jpg (reference test.py:187-193; output_to_target
    utils/utils.py:1119-1145 converts detections back to target rows)."""
    try:
        from ..utils.plots import plot_images
        imgs, tgt, valid, paths = batch0
        h, w = imgs.shape[1:3]
        plot_images(imgs, tgt[valid], paths=paths, names=names,
                    fname='test_batch0_gt.jpg')
        rows = []
        for si, pred in enumerate(det_list[:len(imgs)]):
            if pred is None:
                continue
            for x1, y1, x2, y2, _conf, cls in pred:
                rows.append([si, int(cls), (x1 + x2) / 2 / w,
                             (y1 + y2) / 2 / h, (x2 - x1) / w,
                             (y2 - y1) / h])
        plot_images(imgs, np.asarray(rows, np.float32).reshape(-1, 6),
                    paths=paths, names=names, fname='test_batch0_pred.jpg')
    except Exception as e:        # plotting must never fail an eval
        print(f'eval batch0 plot failed: {e}')


def _xywh2xyxy_np(x):
    y = np.copy(x)
    y[..., 0] = x[..., 0] - x[..., 2] / 2
    y[..., 1] = x[..., 1] - x[..., 3] / 2
    y[..., 2] = x[..., 0] + x[..., 2] / 2
    y[..., 3] = x[..., 1] + x[..., 3] / 2
    return y


def evaluate(net, params, state, data, *, batch_size=16, img_size=416,
             conf_thres=0.001, iou_thres=0.6, multi_label=True,
             compute_dtype=jnp.bfloat16, fused=False, single_cls=False,
             is_gray_scale=False, save_json=False, verbose=False,
             max_det=300, top_k=512, iouv=(0.5,), dataset=None,
             maxabsscaler=False, loader=None, progress=True,
             quant_apply=None, qstate=None, loss_hyp=None, anchor_vecs=None,
             sparse=None, augment=False, device_match=True, mesh=None,
             plot=False):
    """Run mAP evaluation. Returns ((mp, mr, map, mf1, 0, 0, 0), maps, times).

    ``net``: NetworkIR; ``params``/``state``: pytrees (pre-fused params with
    state={} are accepted via fused=True).

    ``sparse``: use the sparse-decode NMS for the float path (objectness
    top-k on raw head logits, only survivors decoded). Defaults on for TPU;
    the quantized path always uses the dense io pipeline.

    ``device_match``: run TP assignment inside the eval step
    (eval/matching.py) instead of the host python loop — the reference's
    per-image/per-class matching (test.py:157-181) bottlenecks a 1-core
    host once the device clears ~900 img/s.

    ``mesh``: shard evaluation over a device mesh (the reference
    data-parallelizes eval via nn.DataParallel, test.py:55-56): batches
    shard over the ``data`` axis, params keep their TP shardings
    (parallel/mesh.py state_shardings — pure replication when model=1),
    targets/valid replicate, and GSPMD partitions forward + NMS + device
    matching. Results are bit-identical to single-device (every per-image
    computation is independent). batch_size must divide by the data-axis
    size (the loader pads ragged tails to the full batch). Params already
    sharded on this mesh (e.g. a live TrainState) are used in place —
    no host round-trip.

    Multi-host: when the mesh spans several processes, EVERY rank must call
    evaluate with the same arguments. Each rank feeds its process_shard of
    the val set (batch_size is global; shards wrap-pad to a common length
    so batch counts stay in SPMD lockstep, and the pad duplicates are
    excluded from the statistics AND the val losses via a per-image
    weight — every val image counts exactly once),
    the jitted step runs SPMD over all chips, outputs all-gather to
    fully-replicated arrays, and every rank
    computes the identical full statistics — rank 0 prints. Square
    letterboxing is forced (rect batching would give ranks different batch
    shapes, breaking SPMD). save_json is unsupported here.
    """
    from ..runtime import preprocess as _pre   # function-level: avoids cycle
    data_dict = parse_data_cfg(data)
    nc = 1 if single_cls else int(data_dict['classes'])
    names = load_classes(data_dict['names'])
    path = data_dict['valid']
    iouv_t = tuple(float(v) for v in iouv)   # static for the jitted matcher
    iouv = np.asarray(iouv, np.float64)
    niou = len(iouv)

    # val losses reported alongside mAP when loss hyp attached
    # (reference test.py:113-116)
    want_loss = loss_hyp is not None and anchor_vecs is not None

    if sparse is None:
        sparse = jax.default_backend() == 'tpu'
    if augment and quant_apply is not None:
        print('WARNING: --augment (TTA) is not supported with quantized '
              'evaluation; running single-pass')
        augment = False
    if augment:
        # TTA returns merged io only — no per-layer outputs for val losses
        # (reference models.py:482-506 augment forward)
        sparse = False
        want_loss = False
    elif quant_apply is not None and not hasattr(quant_apply,
                                                 'make_heads_only'):
        # externally-built quant applies without a sparse twin
        sparse = False

    if quant_apply is not None and qstate is not None and not augment \
            and getattr(quant_apply, 'qcfg', None) is not None:
        # hoist the eval-constant BN fold + weight/bias quantization out of
        # the per-batch graph (bit-identical; qconv reads the prepared
        # 'qw'/'qb' — PERFORMANCE.md quantized-eval)
        from ..compress.quant import prepare_eval_params
        params = prepare_eval_params(net, quant_apply.qcfg, params, state,
                                     qstate)

    # The jitted infer is cached across evaluate() calls: re-tracing +
    # lowering the full graph is ~10 s of single-core Python per call (the
    # persistent XLA cache only skips the compile), and per-epoch eval in
    # the training loop would otherwise pay it every epoch. Keyed by object
    # identity of the non-hashable closures (strong refs kept in the value,
    # so ids stay valid for the cache's lifetime).
    cache_key = (id(net), id(quant_apply), id(anchor_vecs),
                 id(loss_hyp), want_loss, augment, sparse, fused,
                 str(compute_dtype), maxabsscaler, conf_thres, iou_thres,
                 top_k, max_det, multi_label, iouv_t, device_match, nc)
    cached = _INFER_CACHE.get(cache_key)
    if cached is not None:
        infer = cached[0]
    else:
        infer = _build_infer(
            net, quant_apply=quant_apply,
            anchor_vecs=anchor_vecs, loss_hyp=loss_hyp, want_loss=want_loss,
            augment=augment, sparse=sparse, fused=fused,
            compute_dtype=compute_dtype, maxabsscaler=maxabsscaler,
            conf_thres=conf_thres, iou_thres=iou_thres, top_k=top_k,
            max_det=max_det, multi_label=multi_label, iouv_t=iouv_t,
            device_match=device_match, nc=nc)
        if len(_INFER_CACHE) >= 16:        # bound compiled-executable memory
            _INFER_CACHE.pop(next(iter(_INFER_CACHE)))
        _INFER_CACHE[cache_key] = (infer, net, quant_apply,
                                   anchor_vecs, loss_hyp)

    pc, pi = jax.process_count(), jax.process_index()
    multiproc = mesh is not None and pc > 1
    quiet = multiproc and pi != 0
    if multiproc:
        # all-rank collective eval (VERDICT r3 next #2): no chief-only
        # single-device fallback, no full-params host round-trip
        assert not save_json, 'save_json unsupported under multi-host eval'
        assert device_match, 'multi-host eval needs the device matcher'
        assert batch_size % pc == 0, (batch_size, pc)
        local_bs = batch_size // pc
        from ..parallel import (allgather_host_values,
                                global_batch_from_host_batches,
                                replicated_global)
    else:
        local_bs = batch_size

    if mesh is not None:
        from ..parallel.mesh import (DATA_AXIS, replicated_sharding,
                                     shard_batch, shard_state)
        assert batch_size % mesh.shape[DATA_AXIS] == 0, \
            (batch_size, dict(mesh.shape))
        # no-op for arrays already living on this mesh with these shardings
        params = shard_state(mesh, net, params)
        if state:
            state = shard_state(mesh, net, state)
        _repl = replicated_sharding(mesh)
    if multiproc:
        # every rank must read the full (dets, loss, correct) outputs to
        # build the complete statistics — constrain them replicated (the
        # all-gather is tiny: max_det boxes per image). The wrapper is
        # cached per (infer, mesh) like the inner jit: re-wrapping every
        # evaluate() call would re-pay trace+lowering each epoch.
        wkey = cache_key + ('repl-wrap', id(mesh))
        wrapped = _INFER_CACHE.get(wkey)
        if wrapped is not None and wrapped[1] is mesh:
            infer = wrapped[0]
        else:
            infer = jax.jit(infer, out_shardings=_repl)
            _INFER_CACHE[wkey] = (infer, mesh)

    if loader is None:
        if dataset is None:
            dataset = DetectionDataset(
                path, img_size, local_bs, rect=not multiproc,
                is_gray_scale=is_gray_scale,
                process_shard=(pi, pc) if multiproc else None)
        loader = BatchLoader(dataset, local_bs)

    seen = 0
    stats = []
    jdict = []
    coco91 = coco80_to_coco91_class()
    t_inf = t_nms = 0.0
    # GT-vs-pred plots of the first batch (reference test.py:187-193).
    # Multi-host: rank 0 plots its own local shard — its images are the
    # first local_bs rows of the global batch (process-major concat), so
    # det_list[:len(imgs)] in _plot_eval_batch0 picks exactly its rows;
    # the stash below grabs the local targets before the global row shift
    plot = plot and (not multiproc or pi == 0)
    plot_stash: dict = {}

    if not quiet:
        print(('%20s' + '%10s' * 6) % ('Class', 'Images', 'Targets', 'P',
                                       'R', 'mAP@0.5', 'F1'))
    val_loss = np.zeros(3)
    n_batches = 0

    def dispatch(batch):
        """Upload + launch one batch; returns device futures (async)."""
        imgs, tgt, valid, paths, shapes = batch
        if plot and 'batch0' not in plot_stash:
            plot_stash['batch0'] = (np.asarray(imgs), np.asarray(tgt),
                                    np.asarray(valid), list(paths))
        # uint8 across host->device, normalised on-device
        # (runtime.preprocess); jitted calls dispatch asynchronously, so the
        # transfer/compute of this batch overlaps the host-side stat work on
        # the previous one (one-batch lookahead below)
        if multiproc:
            # global batch = concat of per-rank blocks; targets shift to
            # global image rows and all-gather so every rank holds the full
            # label set for its (replicated) statistics pass
            tgt = np.array(tgt, np.float32)
            tgt[:, 0] += pi * local_bs
            g_tgt = allgather_host_values(tgt).reshape(-1, tgt.shape[-1])
            g_valid = allgather_host_values(np.asarray(valid)).reshape(-1)
            g_real = allgather_host_values(
                np.array([bool(p) for p in paths], bool)).reshape(-1)
            imgs_in = global_batch_from_host_batches(
                mesh, np.ascontiguousarray(imgs))
            tgt_in = replicated_global(mesh, g_tgt)
            valid_in = replicated_global(mesh, g_valid)
            # wrap-pad duplicate slots weigh 0 in the val losses — every
            # real image counts exactly once in losses AND statistics
            w_in = replicated_global(mesh, g_real.astype(np.float32))
            x = _pre(imgs_in, maxabsscaler)
            dets, loss_items, correct_dev = infer(params, state, qstate, x,
                                                  tgt_in, valid_in, w_in)
            paths = ['host' if r else '' for r in g_real]
            return (dets, loss_items, correct_dev, g_tgt, g_valid, paths,
                    [None] * len(paths), imgs.shape[1:3])
        # ragged-tail pad slots (empty path) weigh 0 in the val losses: the
        # per-batch loss means cover the real images only, matching the
        # reference whose last val batch is simply smaller (test.py:113-116)
        real_w = np.array([bool(p) for p in paths], np.float32)
        if mesh is not None:
            # uint8 batch sharded over the data axis before the on-device
            # normalise; targets replicate (they index images by batch row,
            # so GSPMD keeps the per-image matching local to each shard)
            imgs_in = shard_batch(mesh, np.ascontiguousarray(imgs))
            tgt_in = jax.device_put(np.asarray(tgt), _repl)
            valid_in = jax.device_put(np.asarray(valid), _repl)
            w_in = jax.device_put(real_w, _repl)
        else:
            imgs_in, tgt_in, valid_in, w_in = (imgs, jnp.asarray(tgt),
                                               jnp.asarray(valid),
                                               jnp.asarray(real_w))
        x = _pre(imgs_in, maxabsscaler)
        dets, loss_items, correct_dev = infer(params, state, qstate, x,
                                              tgt_in, valid_in, w_in)
        return (dets, loss_items, correct_dev, tgt, valid, paths, shapes,
                imgs.shape[1:3])

    it = iter(loader)
    pending = None
    while True:
        nxt = next(it, None)
        if nxt is not None:
            t0 = time.perf_counter()
            issued = dispatch(nxt)
            t_inf += time.perf_counter() - t0
        else:
            issued = None
        if pending is None:
            if issued is None:
                break
            pending = issued
            continue
        (dets, loss_items, correct_dev, tgt, valid, paths, shapes,
         (h, w)) = pending
        pending = issued
        t0 = time.perf_counter()
        dets_np = np.asarray(dets)            # np conversion = real sync
        det_list = to_host_detections(dets_np)
        correct_np = None if correct_dev is None else np.asarray(correct_dev)
        t_inf += time.perf_counter() - t0
        val_loss += np.asarray(loss_items)
        n_batches += 1
        if plot and n_batches == 1:
            _plot_eval_batch0(plot_stash.pop('batch0'), det_list, names)

        tgt = np.asarray(tgt)[np.asarray(valid)]
        for si in range(len(paths)):
            if not paths[si]:
                continue  # ragged-batch padding
            labels = tgt[tgt[:, 0] == si, 1:]
            nl = len(labels)
            tcls = labels[:, 0].tolist() if nl else []
            seen += 1
            pred = det_list[si]
            if pred is None:
                if nl:
                    stats.append((np.zeros((0, niou), bool), np.zeros(0),
                                  np.zeros(0), tcls))
                continue
            pred = pred.copy()
            pred[:, [0, 2]] = pred[:, [0, 2]].clip(0, w)
            pred[:, [1, 3]] = pred[:, [1, 3]].clip(0, h)

            if save_json and shapes[si] is not None:
                (h0, w0), ((rh, rw), pad) = shapes[si]
                image_id = Path(paths[si]).stem.split('_')[-1]
                try:
                    image_id = int(image_id)
                except ValueError:
                    pass
                box = pred[:, :4].copy()
                box[:, [0, 2]] = (box[:, [0, 2]] - pad[0]) / rw
                box[:, [1, 3]] = (box[:, [1, 3]] - pad[1]) / rh
                box[:, 2:4] -= box[:, 0:2]  # xyxy -> xywh top-left
                for pr, b in zip(pred.tolist(), box.tolist()):
                    jdict.append({'image_id': image_id,
                                  'category_id': coco91[int(pr[5])]
                                  if nc == 80 else int(pr[5]),
                                  'bbox': [round(v, 3) for v in b],
                                  'score': round(pr[4], 5)})

            if correct_np is not None:
                # rows of correct_dev align with dets rows; keep the same
                # conf>0 mask to_host_detections applied
                keep = dets_np[si][:, 4] > 0
                correct = correct_np[si][keep]
            else:
                correct = np.zeros((len(pred), niou), bool)
                if nl:
                    tbox = _xywh2xyxy_np(labels[:, 1:5]) * [w, h, w, h]
                    correct = match_predictions(pred, labels[:, 0], tbox,
                                                iouv)
            stats.append((correct, pred[:, 4], pred[:, 5], tcls))

    mp = mr = map50 = mf1 = 0.0
    maps = np.zeros(nc)
    ap_class = []
    if stats:
        cat = [np.concatenate([np.atleast_1d(np.asarray(s[i])) for s in stats], 0)
               if stats else np.zeros(0) for i in range(3)]
        tcls_all = np.concatenate([np.asarray(s[3]) for s in stats]) \
            if any(len(s[3]) for s in stats) else np.zeros(0)
        if len(cat[0]):
            p, r, ap, f1, ap_class = ap_per_class(cat[0], cat[1], cat[2], tcls_all)
            if niou > 1:
                p, r, ap, f1 = p[:, 0], r[:, 0], ap.mean(1), ap[:, 0]
            else:
                p, r, ap, f1 = p[:, 0], r[:, 0], ap[:, 0], f1[:, 0]
            mp, mr, map50, mf1 = p.mean(), r.mean(), ap.mean(), f1.mean()
            for i, c in enumerate(ap_class):
                maps[c] = ap[i]

    nt = int(sum(len(s[3]) for s in stats))
    pf = '%20s' + '%10.3g' * 6
    if not quiet:
        print(pf % ('all', seen, nt, mp, mr, map50, mf1))
    if verbose and nc > 1 and len(ap_class) and not quiet:
        for i, c in enumerate(ap_class):
            n_c = int(sum(1 for s in stats for t in s[3] if t == c))
            print(pf % (names[c], seen, n_c, p[i], r[i], ap[i], f1[i]))

    if save_json and jdict:
        with open('results.json', 'w') as f:
            json.dump(jdict, f)
        try:
            from pycocotools.coco import COCO            # optional
            from pycocotools.cocoeval import COCOeval
            # official COCO eval path (reference test.py:228-247)
            ann = glob_coco_annotations(data_dict)
            if ann:
                cocoGt = COCO(ann)
                cocoDt = cocoGt.loadRes('results.json')
                ev = COCOeval(cocoGt, cocoDt, 'bbox')
                ev.evaluate(); ev.accumulate(); ev.summarize()
                map50 = ev.stats[1]
        except ImportError:
            pass

    vl = val_loss / max(n_batches, 1)
    return (mp, mr, map50, mf1, float(vl[0]), float(vl[1]),
            float(vl[2])), maps, (t_inf, t_nms)


def glob_coco_annotations(data_dict):
    import glob as _g
    hits = _g.glob('**/instances_val*.json', recursive=True)
    return hits[0] if hits else None
