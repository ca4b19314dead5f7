#!/usr/bin/env python
"""Serving-latency sweep: per-batch ms/image for the production pipelines.

The reference headline is a latency figure (12.3 + 1.7 ms/img on a 2080 Ti,
README.md:228); bench.py measures the throughput-optimal bs=128 point. This
sweeps small serving batches for both production pipelines (int8-mixed and
bf16, the exact graphs bench.py builds) and prints ms/batch, ms/img and
img/s per point. Inputs stay device-resident — through the axon tunnel the
H2D link (44 MB/s) would otherwise dominate every row; a real v5e host
feeds PCIe at tens of GB/s.

Usage: python scripts/prof_latency.py [--sizes 608] [--batches 1,2,4,8,16,32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(pipeline, weights, bs, size, iters=30):
    import jax
    x = jax.device_put(np.random.RandomState(0).rand(bs, size, size, 3)
                       .astype(np.float32), jax.devices()[0])
    np.asarray(pipeline(weights, x))          # compile + warm
    # per-iter sync: latency, not pipelined throughput
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(pipeline(weights, x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--sizes', type=str, default='608')
    p.add_argument('--batches', type=str, default='1,2,4,8,16,32')
    p.add_argument('--pipelines', type=str, default='int8,bf16')
    opt = p.parse_args()

    import bench
    from yolo_tpu.ir import build_ir
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    net = build_ir(os.path.join(root, 'cfg/yolov3/yolov3.cfg'))

    print(f"{'pipeline':>8} {'size':>5} {'bs':>4} {'ms/batch':>9} "
          f"{'ms/img':>7} {'img/s':>7}")
    for name in opt.pipelines.split(','):
        builder = {'int8': bench._int8_pipeline,
                   'bf16': bench._bf16_pipeline}[name]
        pipeline, weights = builder(net)
        for size in (int(s) for s in opt.sizes.split(',')):
            for bs in (int(b) for b in opt.batches.split(',')):
                dt = measure(pipeline, weights, bs, size)
                print(f'{name:>8} {size:>5} {bs:>4} {dt * 1e3:>9.2f} '
                      f'{dt * 1e3 / bs:>7.2f} {bs / dt:>7.1f}', flush=True)


if __name__ == '__main__':
    main()
