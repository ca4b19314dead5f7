#!/usr/bin/env python
"""Model summary CLI (reference info.py + model_info,
utils/torch_utils.py:92-110): per-layer table, params, GFLOPs."""

import argparse

from yolo_tpu.utils.cli import FlexParser
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    p = FlexParser()
    p.add_argument('--cfg', type=str, default='cfg/yolov3/yolov3.cfg')
    p.add_argument('--img-size', type=int, default=416)
    p.add_argument('--device', type=str, default='',
                   help='accepted for reference-CLI compat; devices are '
                        'selected by JAX automatically')
    opt = p.parse_args(argv)

    from yolo_tpu.ir import build_ir
    from yolo_tpu.utils.profiling import count_macs, count_params, model_info

    net = build_ir(opt.cfg)
    print(f'{"idx":>4} {"type":<12} {"filters":>8} {"size":>5} {"stride":>6} '
          f'{"bn":>3} {"activation":>10}')
    for l in net.layers:
        print(f'{l.index:>4} {l.kind:<12} {l.filters:>8} {l.size:>5} '
              f'{l.stride:>6} {int(l.bn):>3} {l.activation:>10}')
    info = model_info(net, opt.img_size)
    print(f"\nModel Summary: {info['layers']} layers, "
          f"{info['params'] / 1e6:.2f}M parameters, "
          f"{info['gflops']:.1f} GFLOPs @ {opt.img_size}")
    return info


if __name__ == '__main__':
    main()
