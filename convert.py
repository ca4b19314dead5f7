#!/usr/bin/env python
"""Weight format conversion: .npz checkpoint <-> darknet .weights
(reference convert.py / models.py:785-813)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    p = argparse.ArgumentParser()
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

    if opt.weights.endswith('.npz'):
        ck = load_checkpoint(opt.weights)
        target = opt.output or opt.weights.rsplit('.', 1)[0] + '.weights'
        save_darknet_weights(net, ck['params'], ck['state'], target)
        print(f"Success: converted '{opt.weights}' to '{target}'")
    elif opt.weights.endswith('.weights'):
        params, state, version, seen = load_darknet_weights(
            net, params, state, opt.weights)
        target = opt.output or opt.weights.rsplit('.', 1)[0] + '.npz'
        save_checkpoint(target, params=params, state=state, epoch=-1)
        print(f"Success: converted '{opt.weights}' to '{target}'")
    else:
        print('Error: extension not supported.')


if __name__ == '__main__':
    main()
