#!/usr/bin/env python
"""Post-training quantization driver (reference PTQ.py:12-117).

Builds the float model and a cos-PTQ quantized twin sharing the same weights,
runs calibration forwards over a train subset (the cos-similarity pow-2
scale search votes per batch), evaluates both, saves the calibrated model.
"""

import argparse

from yolo_tpu.utils.cli import FlexParser
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def parse_args(argv=None):
    p = FlexParser()
    p.add_argument('--cfg', type=str, default='cfg/yolov3/yolov3.cfg')
    p.add_argument('--data', type=str, default='data_cfg/coco2014.data')
    p.add_argument('--weights', type=str, default='weights/last.npz')
    p.add_argument('--img-size', type=int, default=416)
    p.add_argument('--batch-size', type=int, default=16)
    p.add_argument('--subset-len', '--subset_len', dest='subset_len',
                   type=int, default=32,
                   help='calibration images drawn from the train set')
    p.add_argument('--gray-scale', '--gray_scale', dest='gray_scale',
                   action='store_true')
    p.add_argument('--maxabsscaler', '-mas', action='store_true')
    p.add_argument('--single-cls', action='store_true')
    p.add_argument('--augment', action='store_true',
                   help='accepted for CLI compat (reference PTQ.py surface); '
                        'calibration always runs single-pass')
    p.add_argument('--device', type=str, default='',
                   help='accepted for CLI compat; TPU devices are selected '
                        'automatically (JAX_PLATFORMS to override)')
    p.add_argument('--a-bit', type=int, default=8)
    p.add_argument('--w-bit', type=int, default=8)
    p.add_argument('--shortcut_way', type=int, default=1)
    p.add_argument('--out', type=str, default='weights/PTQ.npz')
    p.add_argument('--no-eval', action='store_true')
    p.add_argument('--int8-engine', action='store_true',
                   help='also evaluate the calibrated model on the true-int8 '
                        'MXU engine (s8xs8->s32 convs, int8 HBM edges)')
    return p.parse_args(argv)


def main(argv=None):
    opt = parse_args(argv)

    import jax
    import jax.numpy as jnp
    from yolo_tpu.config import parse_data_cfg
    from yolo_tpu.data.datasets import BatchLoader, DetectionDataset
    from yolo_tpu.eval.evaluator import evaluate
    from yolo_tpu.runtime import load_model, preprocess
    from yolo_tpu.utils.checkpoint import save_checkpoint

    data_dict = parse_data_cfg(opt.data)

    float_bundle = load_model(opt.cfg, opt.weights,
                              is_gray_scale=opt.gray_scale,
                              maxabsscaler=opt.maxabsscaler)
    q_bundle = load_model(opt.cfg, opt.weights, quantized=3,
                          a_bit=opt.a_bit, w_bit=opt.w_bit,
                          shortcut_way=opt.shortcut_way,
                          is_gray_scale=opt.gray_scale,
                          maxabsscaler=opt.maxabsscaler,
                          compute_dtype=jnp.float32)

    if not opt.no_eval:
        print('evaluating the float model...')
        evaluate(float_bundle.net, float_bundle.params, float_bundle.state,
                 opt.data, batch_size=opt.batch_size, img_size=opt.img_size,
                 single_cls=opt.single_cls, is_gray_scale=opt.gray_scale,
                 maxabsscaler=opt.maxabsscaler)

    # calibration: train-mode forwards run the cos-sim scale search
    # (PTQ.py:76-88)
    ds = DetectionDataset(data_dict['train'], opt.img_size, opt.batch_size,
                          subset_len=min(opt.subset_len,
                                         sum(1 for _ in
                                             open(data_dict['train']))),
                          is_gray_scale=opt.gray_scale, seed=0)
    loader = BatchLoader(ds, opt.batch_size)
    calib = jax.jit(lambda p, s, q, x: q_bundle._apply(p, s, q, x, True))
    qstate = q_bundle.qstate
    state = q_bundle.state
    for imgs, _, _, _, _ in loader:
        _, state, qstate = calib(q_bundle.params, state, qstate,
                                 preprocess(imgs, opt.maxabsscaler))
    q_bundle.qstate = qstate

    if not opt.no_eval:
        print('evaluating the quantized model...')
        evaluate(q_bundle.net, q_bundle.params, state, opt.data,
                 batch_size=opt.batch_size, img_size=opt.img_size,
                 single_cls=opt.single_cls, is_gray_scale=opt.gray_scale,
                 maxabsscaler=opt.maxabsscaler,
                 quant_apply=q_bundle._apply, qstate=qstate)

    if opt.int8_engine:
        from yolo_tpu.compress.quant import QuantConfig
        from yolo_tpu.models.int8_engine import prepare_int8, make_int8_apply
        qcfg = QuantConfig(scheme='ptq_cos', a_bits=opt.a_bit,
                           w_bits=opt.w_bit, shortcut_way=opt.shortcut_way)
        plan = prepare_int8(q_bundle.net, q_bundle.params, state, qstate, qcfg)
        eng = make_int8_apply(q_bundle.net, plan)
        if not opt.no_eval:
            print('evaluating the true-int8 engine...')
            evaluate(q_bundle.net, plan.arrays, {}, opt.data,
                     batch_size=opt.batch_size, img_size=opt.img_size,
                     single_cls=opt.single_cls, is_gray_scale=opt.gray_scale,
                     maxabsscaler=opt.maxabsscaler,
                     quant_apply=lambda pa, st, qs, x, train:
                         (*eng(pa, x), []),
                     qstate=None)

    os.makedirs(os.path.dirname(opt.out) or '.', exist_ok=True)
    save_checkpoint(opt.out, params=jax.device_get(q_bundle.params),
                    state=jax.device_get(state),
                    extra={'quantized': 3, 'a_bit': opt.a_bit,
                           'w_bit': opt.w_bit})
    # quantizer state stored alongside
    save_checkpoint(opt.out.replace('.npz', '_qstate.npz'),
                    params=jax.device_get(qstate), state={})
    print(f'saved calibrated model to {opt.out}')


if __name__ == '__main__':
    main()
