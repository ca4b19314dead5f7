#!/usr/bin/env python
"""Weight format conversion: .npz checkpoint <-> darknet .weights <-> torch
.pt (reference convert.py / models.py:785-813 / train.py:160-180).

A reference user's torch checkpoints import directly: the state_dict keys
are deterministic from the cfg walk (yolo_tpu/models/torch_import.py), so
`--weights last.pt` converts without touching the reference's own tools."""

import argparse

from yolo_tpu.utils.cli import FlexParser
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    p = FlexParser()
    p.add_argument('--cfg', type=str, default='cfg/yolov3/yolov3.cfg')
    p.add_argument('--weights', type=str, required=True,
                   help='.npz -> .weights or .weights -> .npz by extension')
    p.add_argument('--output', type=str, default='',
                   help='target path (default: source path with the '
                        'extension swapped)')
    p.add_argument('--img_size', '--img-size', dest='img_size', type=int,
                   default=416, help='accepted for CLI compat; weight '
                                     'conversion is size-independent')
    p.add_argument('--gray-scale', '--gray_scale', dest='gray_scale',
                   action='store_true',
                   help='accepted for CLI compat; channel count comes from '
                        'the cfg')
    p.add_argument('--device', type=str, default='',
                   help='accepted for CLI compat')
    opt = p.parse_args(argv)

    import jax
    from yolo_tpu.ir import build_ir
    from yolo_tpu.models.darknet_io import (load_darknet_weights,
                                            save_darknet_weights)
    from yolo_tpu.models.network import init_params
    from yolo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    net = build_ir(opt.cfg)
    params, state = init_params(jax.random.PRNGKey(0), net)

    def write(params, state, meta=None):
        meta = meta or {}
        if target.endswith('.npz'):
            save_checkpoint(target, params=params, state=state,
                            epoch=meta.get('epoch', -1))
        elif target.endswith('.weights'):
            save_darknet_weights(net, params, state, target)
        elif target.endswith(('.pt', '.pth')):
            from yolo_tpu.models.torch_import import save_torch_checkpoint
            save_torch_checkpoint(net, params, state, target,
                                  epoch=meta.get('epoch', -1),
                                  best_fitness=meta.get('best_fitness', 0.0))
        else:
            raise SystemExit(f'Error: unsupported target extension {target}')
        print(f"Success: converted '{opt.weights}' to '{target}'")

    if opt.weights.endswith('.npz'):
        ck = load_checkpoint(opt.weights)
        # export the deployable EMA pair when present — the reference's
        # checkpoint 'model' entry IS the EMA state_dict (train.py:551-556),
        # so its convert() ships the weights whose mAP was reported
        if ck.get('ema') is not None and ck.get('ema_state') is not None:
            src_p, src_s = ck['ema'], ck['ema_state']
        else:
            src_p, src_s = ck['params'], ck['state']
        target = opt.output or opt.weights.rsplit('.', 1)[0] + '.weights'
        write(src_p, src_s, {'epoch': int(ck.get('epoch', -1))})
    elif opt.weights.endswith('.weights'):
        params, state, version, seen = load_darknet_weights(
            net, params, state, opt.weights)
        target = opt.output or opt.weights.rsplit('.', 1)[0] + '.npz'
        write(params, state)
    elif opt.weights.endswith(('.pt', '.pth')):
        from yolo_tpu.models.torch_import import load_torch_checkpoint
        params, state, _, meta = load_torch_checkpoint(net, params, state,
                                                       opt.weights)
        target = opt.output or opt.weights.rsplit('.', 1)[0] + '.npz'
        write(params, state, meta)
    else:
        print('Error: extension not supported.')


if __name__ == '__main__':
    main()
