#!/usr/bin/env python
"""FPGA weight export CLI (reference convert_FPGA.py / convert_FPGA_2.py):
BN-fuse every conv, quantize with the calibrated pow-2 scales, write packed
int8/int16 weight/bias binaries + per-layer shift-exponent binaries,
optionally TM/TN-tile-reordered."""

import argparse

from yolo_tpu.utils.cli import FlexParser
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    p = FlexParser()
    p.add_argument('--cfg', type=str, default='cfg/yolov3/yolov3.cfg')
    p.add_argument('--weights', type=str, default='weights/PTQ.npz')
    p.add_argument('--quantized', type=int, default=3)
    p.add_argument('--a-bit', type=int, default=8)
    p.add_argument('--w-bit', type=int, default=8)
    p.add_argument('--shortcut_way', type=int, default=1)
    p.add_argument('--reorder', action='store_true')
    p.add_argument('--TM', type=int, default=32)
    p.add_argument('--TN', type=int, default=32)
    p.add_argument('--out', type=str, default='fpga_export')
    p.add_argument('--gray-scale', '--gray_scale', dest='gray_scale',
                   action='store_true',
                   help='1-channel model (the reference FPGA flow targets '
                        'IR imagery; convert_FPGA.py:18)')
    # accepted for reference-CLI compat; the reference parses these but its
    # exporter never reads them (detect.py argparse copy-paste)
    p.add_argument('--data', type=str, default='')
    p.add_argument('--source', type=str, default='')
    p.add_argument('--output', type=str, default='')
    p.add_argument('--img_size', '--img-size', type=int, default=416)
    p.add_argument('--conf-thres', type=float, default=0.5)
    p.add_argument('--nms-thres', type=float, default=0.5)
    p.add_argument('--device', type=str, default='')
    p.add_argument('--FPGA', action='store_true')
    opt = p.parse_args(argv)

    from yolo_tpu.compress.fpga_export import export_fpga_weights
    from yolo_tpu.runtime import load_model
    from yolo_tpu.utils.checkpoint import load_checkpoint

    bundle = load_model(opt.cfg, opt.weights, quantized=opt.quantized,
                        a_bit=opt.a_bit, w_bit=opt.w_bit,
                        shortcut_way=opt.shortcut_way,
                        is_gray_scale=opt.gray_scale)
    qpath = opt.weights.replace('.npz', '_qstate.npz')
    if os.path.exists(qpath):
        bundle.qstate = load_checkpoint(qpath)['params']
    out = export_fpga_weights(bundle, opt.out, reorder=opt.reorder,
                              TM=opt.TM, TN=opt.TN)
    print(f'FPGA export written to {out}')


if __name__ == '__main__':
    main()
