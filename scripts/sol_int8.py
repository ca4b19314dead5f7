#!/usr/bin/env python
"""Speed-of-light analysis of the int8 'mixed' serving pipeline.

VERDICT r2 next #3(b): establish the attainable ceiling for the composed
mixed pipeline (bf16 weight-only region >= bf16_min_hw, s8 deep region) at
yolov3 @608/bs128 and compare against the measured end-to-end time — the
per-op roofline sum answers whether ~1008 img/s is near the ceiling or 60%
of it.

Static walk over the IR (no TPU needed): per layer the roofline time is
  t = max(FLOPs / peak(region), bytes / HBM_BW)
with v5e peaks bf16 = 197 TFLOP/s, int8 = 394 TOP/s, HBM = 819 GiB/s.
Elementwise traffic (shortcut adds, requant at the region transition,
concats) is byte-counted too. The NMS/decode tail uses its measured ~5 ms
(PERFORMANCE.md sparse-NMS profile).

Two ceilings are printed:
  SoL(hw)    — pure hardware roofline (compiler assumed perfect);
  SoL(meas)  — per-op best over {bf16, s8} with the MEASURED per-shape
               efficiencies of XLA's conv emitters (hlo_stats shootout,
               PERFORMANCE.md 2026-08-17): XLA's s8 KxK emitter runs at
               12-30%% of int8 peak on large maps, which is WHY the mixed
               backend keeps the high-res region bf16. This is the
               compiler-attainable composed ceiling.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BF16_PEAK = 197e12     # v5e MXU bf16 FLOP/s
INT8_PEAK = 394e12     # v5e MXU s8xs8->s32 OP/s
HBM_BW = 819 * 2**30   # B/s

# measured XLA conv-emitter efficiency by (region dtype, output map size):
# fraction of the respective MXU peak actually achieved on yolov3 shapes
# (hlo_stats per-op shootout, PERFORMANCE.md int8 section). bf16 hits
# ~0.94 of peak on the compute-bound shapes; s8's emitter only reaches
# ~0.5-0.6 of int8 peak even on the deep shapes where it wins.
def measured_eff(dtype: str, out_hw: int, k: int) -> float:
    if dtype == 'bf16':
        return 0.94
    if k == 1:
        return 0.55           # s8 1x1s: HBM-halved, decent emitter
    if out_hw >= 76:
        return 0.25           # s8 KxK high-res: emitter collapses
    return 0.55               # s8 KxK deep region


def analyze(size=608, bs=128, bf16_min_hw=76, nms_ms=5.0, verbose=False):
    from yolo_tpu.ir import build_ir
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    net = build_ir(os.path.join(root, 'cfg/yolov3/yolov3.cfg'))

    head_convs = set()
    layers = net.layers
    for i, lyr in enumerate(layers):
        if lyr.kind == 'yolo' and i:
            head_convs.add(layers[i - 1].index)

    cur = (size, size, 3)
    saved = {}
    t_hw = t_meas = 0.0
    rows = []
    ew_bytes = 0.0           # elementwise side traffic (adds, requants)
    for lyr in layers:
        h, w, c = cur
        if lyr.kind in ('conv', 'depthwise'):
            sy, sx = lyr.stride_xy or (lyr.stride, lyr.stride)
            oh = (h + 2 * lyr.pad - lyr.size) // sy + 1
            ow = (w + 2 * lyr.pad - lyr.size) // sx + 1
            flops = 2 * oh * ow * lyr.size ** 2 * (c // lyr.groups) \
                * lyr.filters * bs
            s8 = min(oh, ow) < bf16_min_hw or lyr.index in head_convs
            bpe_in = 1 if s8 else 2
            bpe_out = 1 if s8 else 2
            bpe_w = 1 if s8 else 2
            bytes_ = (h * w * c * bpe_in * bs
                      + lyr.size ** 2 * (c // lyr.groups) * lyr.filters * bpe_w
                      + oh * ow * lyr.filters * bpe_out * bs)
            peak = INT8_PEAK if s8 else BF16_PEAK
            th = max(flops / peak, bytes_ / HBM_BW)
            eff = measured_eff('s8' if s8 else 'bf16', min(oh, ow), lyr.size)
            tm = max(flops / (peak * eff), bytes_ / HBM_BW)
            t_hw += th
            t_meas += tm
            rows.append((lyr.index, f'{lyr.size}x{lyr.size}s{sy}',
                         f'{min(oh, ow)}px', c, lyr.filters,
                         's8' if s8 else 'bf16', flops / 1e9, bytes_ / 2**20,
                         th * 1e3, tm * 1e3))
            cur = (oh, ow, lyr.filters)
        elif lyr.kind == 'maxpool':
            if not (lyr.size == 2 and lyr.stride == 1):
                p = (lyr.size - 1) // 2
                cur = ((h + 2 * p - lyr.size) // lyr.stride + 1,
                       (w + 2 * p - lyr.size) // lyr.stride + 1, c)
            ew_bytes += 2 * h * w * c * 2 * bs
        elif lyr.kind == 'upsample':
            cur = (h * lyr.stride, w * lyr.stride, c)
            ew_bytes += (1 + lyr.stride ** 2) * h * w * c * 2 * bs
        elif lyr.kind == 'route':
            if len(lyr.layers) > 1:
                hs, ws_, cs = zip(*(saved[j] for j in lyr.layers))
                cur = (hs[0], ws_[0], sum(cs))
                ew_bytes += 2 * hs[0] * ws_[0] * sum(cs) * 2 * bs
            elif lyr.route_groups:
                cur = (h, w, c // 2)
            else:
                cur = saved[lyr.layers[0]]
        elif lyr.kind == 'shortcut':
            # read x + read addend + write sum (+ requant fq chain in the
            # s8 region is fused into the same pass)
            ew_bytes += 3 * h * w * c * (1 if min(h, w) < bf16_min_hw
                                         else 2) * bs
        if lyr.is_routed:
            saved[lyr.index] = cur

    t_ew = ew_bytes / HBM_BW
    if verbose:
        print(f"{'idx':>4} {'conv':>7} {'out':>6} {'cin':>5} {'cout':>5} "
              f"{'reg':>4} {'GFLOP':>8} {'MiB':>7} {'SoL-hw':>8} "
              f"{'SoL-meas':>9}")
        for r in rows:
            print(f'{r[0]:>4} {r[1]:>7} {r[2]:>6} {r[3]:>5} {r[4]:>5} '
                  f'{r[5]:>4} {r[6]:8.1f} {r[7]:7.1f} {r[8]:7.2f}ms '
                  f'{r[9]:8.2f}ms')
    tot_hw = t_hw * 1e3 + t_ew * 1e3 + nms_ms
    tot_meas = t_meas * 1e3 + t_ew * 1e3 + nms_ms
    n_bf16 = sum(1 for r in rows if r[5] == 'bf16')
    print(f'\nyolov3 @{size} bs={bs} mixed(bf16_min_hw={bf16_min_hw}): '
          f'{len(rows)} convs ({n_bf16} bf16-region, '
          f'{len(rows) - n_bf16} s8-region)')
    print(f'conv roofline     : hw {t_hw * 1e3:7.1f} ms   '
          f'meas-eff {t_meas * 1e3:7.1f} ms')
    print(f'elementwise bytes : {ew_bytes / 2**30:.2f} GiB -> '
          f'{t_ew * 1e3:.1f} ms')
    print(f'NMS/decode tail   : {nms_ms:.1f} ms (measured)')
    print(f'TOTAL SoL(hw)     : {tot_hw:7.1f} ms  -> '
          f'{bs / tot_hw * 1e3:5.0f} img/s')
    print(f'TOTAL SoL(meas)   : {tot_meas:7.1f} ms  -> '
          f'{bs / tot_meas * 1e3:5.0f} img/s')
    return tot_hw, tot_meas


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--size', type=int, default=608)
    p.add_argument('--bs', type=int, default=128)
    p.add_argument('--bf16-min-hw', type=int, default=76)
    p.add_argument('--nms-ms', type=float, default=5.0)
    p.add_argument('-v', '--verbose', action='store_true')
    a = p.parse_args()
    analyze(a.size, a.bs, a.bf16_min_hw, a.nms_ms, a.verbose)
