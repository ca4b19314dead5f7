#!/usr/bin/env python
"""mAP evaluation CLI (reference test.py:256-309)."""

import argparse

from yolo_tpu.utils.cli import FlexParser
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def parse_args(argv=None):
    p = FlexParser()
    p.add_argument('--cfg', type=str, default='cfg/yolov3/yolov3.cfg')
    p.add_argument('--data', type=str, default='data_cfg/coco2014.data')
    p.add_argument('--weights', type=str, default='weights/last.npz')
    p.add_argument('--batch-size', type=int, default=16)
    p.add_argument('--img-size', type=int, default=416)
    p.add_argument('--conf-thres', type=float, default=0.001)
    p.add_argument('--iou-thres', type=float, default=0.6)
    p.add_argument('--save-json', action='store_true')
    p.add_argument('--task', default='test',
                   help="'test' | 'study' | 'benchmark'")
    p.add_argument('--sweep-sizes', nargs='+', type=int, default=None,
                   help='override the img-size sweep for study/benchmark')
    p.add_argument('--quantized', type=int, default=-1)
    p.add_argument('--a-bit', type=int, default=8)
    p.add_argument('--w-bit', type=int, default=8)
    p.add_argument('--shortcut_way', type=int, default=1)
    p.add_argument('--gray-scale', '--gray_scale', dest='gray_scale',
                   action='store_true')
    p.add_argument('--maxabsscaler', '-mas', action='store_true')
    p.add_argument('--single-cls', action='store_true')
    p.add_argument('--augment', action='store_true',
                   help='test-time augmentation (flip + multi-scale merge '
                        'before NMS; float models only)')
    p.add_argument('--device', type=str, default='',
                   help='accepted for CLI compat; TPU devices are selected '
                        'automatically (JAX_PLATFORMS to override)')
    p.add_argument('--int8-engine', action='store_true',
                   help='evaluate on the true-int8 MXU engine (real s8 '
                        'convs, int8 HBM edges) instead of the fake-quant '
                        'simulation — the deployed-numerics mAP; requires '
                        'a calibrated quantized checkpoint')
    p.add_argument('--qat-eval-snap', default='f32', choices=['f32', 'bf16'],
                   help="fake-quant eval grid-snap dtype: 'bf16' is ~17%% "
                        "faster on TPU (544->638 img/s @608/bs128), "
                        "elements at .5 rounding boundaries may move one "
                        "quantum vs the 'f32' reference sim")
    p.add_argument('--no-plot', action='store_true',
                   help='skip the test_batch0_gt/pred.jpg mosaics '
                        '(reference test.py:187-193 writes them)')
    return p.parse_args(argv)


def main(argv=None):
    opt = parse_args(argv)

    from yolo_tpu.runtime import load_model
    from yolo_tpu.eval.evaluator import evaluate

    import jax.numpy as jnp
    bundle = load_model(opt.cfg, opt.weights, quantized=opt.quantized,
                        a_bit=opt.a_bit, w_bit=opt.w_bit,
                        shortcut_way=opt.shortcut_way,
                        is_gray_scale=opt.gray_scale,
                        maxabsscaler=opt.maxabsscaler,
                        eval_snap_dtype=(jnp.bfloat16
                                         if opt.qat_eval_snap == 'bf16'
                                         else None))
    if opt.quantized == -1:
        bundle = bundle.fuse()   # conv+bn fuse for eval (test.py:52-53)

    eval_params, eval_state = bundle.params, bundle.state
    eval_qapply = bundle._apply if bundle.quantized else None
    eval_qstate = bundle.qstate
    if opt.int8_engine:
        if not bundle.quantized:
            raise SystemExit('--int8-engine requires --quantized {1,2,3}')
        # same wiring as PTQ.py --int8-engine: freeze the calibration into
        # an integer plan and evaluate the deployed numerics
        from yolo_tpu.models.int8_engine import prepare_int8, make_int8_apply
        plan = prepare_int8(bundle.net, bundle.params, bundle.state,
                            bundle.qstate, bundle.qcfg)
        eng = make_int8_apply(bundle.net, plan)
        eval_params, eval_state, eval_qstate = plan.arrays, {}, None
        eval_qapply = lambda pa, st, qs, x, train: (*eng(pa, x), [])

    if opt.task in ('benchmark', 'study'):
        # benchmark: mAP at sizes 256-512 x IoU {0.6, 0.7} -> benchmark.txt
        # (reference test.py:303-309); study: finer size sweep at the CLI
        # IoU -> study_<cfg>.txt (upstream-ultralytics study task the
        # reference help string advertises)
        import time

        import numpy as np
        if opt.task == 'benchmark':
            sizes = opt.sweep_sizes or list(range(256, 640, 128))
            ious = (0.6, 0.7)
            out_file = 'benchmark.txt'
        else:
            sizes = opt.sweep_sizes or list(range(288, 896, 64))
            ious = (opt.iou_thres,)
            cfg_tag = os.path.splitext(os.path.basename(opt.cfg))[0]
            data_tag = os.path.splitext(os.path.basename(opt.data))[0]
            out_file = f'study_{data_tag}_{cfg_tag}.txt'
        results = []
        for size in sizes:
            for iou in ious:
                t0 = time.time()
                r, _, t = evaluate(bundle.net, eval_params, eval_state,
                                   opt.data, batch_size=opt.batch_size,
                                   img_size=size, conf_thres=opt.conf_thres,
                                   iou_thres=iou, fused=(opt.quantized == -1),
                                   single_cls=opt.single_cls,
                                   quant_apply=eval_qapply,
                                   qstate=eval_qstate)
                # row: size, iou, P, R, mAP@0.5, F1, val losses, wall time
                results.append((size, iou) + tuple(r) + (time.time() - t0,))
        np.savetxt(out_file, np.asarray(results), fmt='%10.4g')
        for row in results:
            print(row)
        return results

    r, maps, t = evaluate(bundle.net, eval_params, eval_state, opt.data,
                          batch_size=opt.batch_size, img_size=opt.img_size,
                          conf_thres=opt.conf_thres, iou_thres=opt.iou_thres,
                          fused=(opt.quantized == -1),
                          save_json=opt.save_json, verbose=True,
                          single_cls=opt.single_cls,
                          maxabsscaler=opt.maxabsscaler, augment=opt.augment,
                          quant_apply=eval_qapply,
                          qstate=eval_qstate, plot=not opt.no_plot)
    print(f'speed: {t[0]:.3f}s inference+nms total')
    return r


if __name__ == '__main__':
    main()
