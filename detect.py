#!/usr/bin/env python
"""Detection CLI (reference detect.py:9-233): images / video / webcam / RTSP
sources, on-device NMS, box rescale to original frames, draw + save."""

import argparse

from yolo_tpu.utils.cli import FlexParser
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def parse_args(argv=None):
    p = FlexParser()
    p.add_argument('--cfg', type=str, default='cfg/yolov3/yolov3.cfg')
    p.add_argument('--data', type=str, default='data_cfg/coco2014.data')
    p.add_argument('--weights', type=str, default='weights/last.npz')
    p.add_argument('--source', type=str, default='data/samples')
    p.add_argument('--output', type=str, default='output')
    p.add_argument('--img-size', type=int, default=416)
    p.add_argument('--batch-size', type=int, default=1,
                   help='batch this many frames per TPU dispatch (directory '
                        'and video sources; the last partial batch is '
                        'padded so only one program is ever compiled)')
    p.add_argument('--conf-thres', type=float, default=0.3)
    p.add_argument('--iou-thres', type=float, default=0.6)
    p.add_argument('--classes', nargs='+', type=int)
    p.add_argument('--agnostic-nms', action='store_true')
    p.add_argument('--save-txt', action='store_true')
    p.add_argument('--view-img', action='store_true')
    p.add_argument('--quantized', type=int, default=-1)
    p.add_argument('--a-bit', '--a_bit', dest='a_bit', type=int, default=8)
    p.add_argument('--w-bit', '--w_bit', dest='w_bit', type=int, default=8)
    p.add_argument('--shortcut_way', type=int, default=1)
    p.add_argument('--gray-scale', '--gray_scale', dest='gray_scale',
                   action='store_true')
    p.add_argument('--maxabsscaler', '-mas', action='store_true')
    p.add_argument('--augment', action='store_true',
                   help='test-time augmentation (flip + multi-scale merge)')
    p.add_argument('--names', type=str, default='',
                   help='*.names path (overrides the .data names entry)')
    p.add_argument('--rect', action='store_true',
                   help='rectangular letterbox (minimal 64-multiple pad; '
                        'default is the full square — one compiled shape)')
    p.add_argument('--fourcc', type=str, default='mp4v',
                   help='output video codec (verify ffmpeg support)')
    p.add_argument('--device', type=str, default='',
                   help='accepted for CLI compat; TPU devices are selected '
                        'automatically (JAX_PLATFORMS to override)')
    p.add_argument('--quantizer_output', action='store_true',
                   help='dump per-layer FPGA cross-check artifacts')
    p.add_argument('--reorder', action='store_true')
    p.add_argument('--TM', type=int, default=32)
    p.add_argument('--TN', type=int, default=32)
    p.add_argument('--layer_idx', type=int, default=-1,
                   help='restrict --quantizer_output dumps to one layer')
    p.add_argument('--FPGA', action='store_true',
                   help='accepted for reference-CLI compat and ignored: '
                        'the flag only feeds the reference\'s unwired '
                        'legacy quantized_ptq modules, and reference '
                        'detect.py:26 passing it to Darknet() (which has '
                        'no such kwarg, models.py:443) crashes outright')
    return p.parse_args(argv)


def main(argv=None):
    opt = parse_args(argv)

    import cv2
    import jax.numpy as jnp
    from yolo_tpu.config import load_classes, parse_data_cfg
    from yolo_tpu.data.datasets import LoadImages, LoadStreams, LoadWebcam
    from yolo_tpu.ops.boxes import scale_coords
    from yolo_tpu.ops.nms import to_host_detections
    from yolo_tpu.runtime import load_model, preprocess
    from yolo_tpu.utils.plots import color_for_class, plot_one_box

    os.makedirs(opt.output, exist_ok=True)
    names = load_classes(opt.names or parse_data_cfg(opt.data)['names'])

    bundle = load_model(opt.cfg, opt.weights, quantized=opt.quantized,
                        a_bit=opt.a_bit, w_bit=opt.w_bit,
                        shortcut_way=opt.shortcut_way,
                        is_gray_scale=opt.gray_scale,
                        maxabsscaler=opt.maxabsscaler)
    if opt.quantized == -1:
        bundle = bundle.fuse()
    infer = bundle.make_infer(conf_thres=opt.conf_thres,
                              iou_thres=opt.iou_thres,
                              agnostic=opt.agnostic_nms,
                              augment=opt.augment,
                              classes=tuple(opt.classes)
                              if opt.classes else None)

    # The reference dumps quantizer_output during the forward of the actual
    # detect input and post-passes upsample layers afterwards
    # (detect.py:64-107, :221 output_upsample.Val_upsample); here the dump
    # runs once on the first preprocessed image.
    dump_pending = bool(opt.quantizer_output)

    def maybe_dump(x_u8):
        nonlocal dump_pending
        if not dump_pending:
            return
        dump_pending = False
        if not bundle.quantized:
            # the reference's dump lives inside the quantized modules —
            # a float model has nothing to dump there either
            print('--quantizer_output ignored: model is not quantized')
            return
        from yolo_tpu.compress.fpga_export import (
            dump_input_artifacts, dump_quantizer_output,
            upsample_activation_dumps)
        xin = preprocess(np.asarray(x_u8[:1]), opt.maxabsscaler)
        dump_quantizer_output(bundle, x=xin, reorder=opt.reorder,
                              TM=opt.TM, TN=opt.TN, layer_idx=opt.layer_idx)
        if opt.maxabsscaler:
            dump_input_artifacts(np.asarray(x_u8[0]),
                                 bundle.qcfg.a_bits if bundle.qcfg else 8)
        if opt.layer_idx == -1:
            upsample_activation_dumps(bundle.net, TN=opt.TN)

    src = opt.source
    webcam = src == '0' or src.startswith(('rtsp', 'http')) or \
        src.endswith('.txt')
    if webcam:
        dataset = LoadStreams(src, img_size=opt.img_size) \
            if src != '0' else LoadWebcam(0, img_size=opt.img_size)
    else:
        dataset = LoadImages(src, img_size=opt.img_size,
                             is_gray_scale=opt.gray_scale, rect=opt.rect)

    vid_writer = None
    bs = max(1, opt.batch_size)

    def handle(path, shape_hw, det, im0, vid_cap, dt):
        nonlocal vid_writer
        s = f'{path}: {shape_hw[1]}x{shape_hw[0]} '
        save_path = str(Path(opt.output) / Path(path).name)
        if det is not None and len(det):
            det[:, :4] = np.asarray(scale_coords(
                shape_hw, det[:, :4], im0.shape[:2]))
            # --classes is enforced inside NMS candidate selection (excluded
            # classes never consume max_det slots); no post-filter needed
            for c in np.unique(det[:, 5].astype(int)):
                n = int((det[:, 5] == c).sum())
                s += f'{n} {names[c]}s, '
            for *xyxy, conf, cls in det:
                label = f'{names[int(cls)]} {conf:.2f}'
                plot_one_box(xyxy, im0, label=label,
                             color=color_for_class(int(cls)))
                if opt.save_txt:
                    with open(save_path.rsplit('.', 1)[0] + '.txt', 'a') as f:
                        f.write(('%g ' * 6 + '\n') % (*xyxy, cls, conf))
        print(f'{s}Done. ({dt:.3f}s)')

        if dataset.mode == 'images':
            cv2.imwrite(save_path, im0)
        else:
            if vid_writer is None or not isinstance(vid_writer, cv2.VideoWriter):
                fps = vid_cap.get(cv2.CAP_PROP_FPS) if vid_cap else 30
                h, w = im0.shape[:2]
                vid_writer = cv2.VideoWriter(
                    save_path, cv2.VideoWriter_fourcc(*opt.fourcc), fps,
                    (w, h))
            vid_writer.write(im0)

    def flush(buf):
        # one TPU dispatch for the whole batch; partial batches are padded
        # by repeating the last frame so a single program shape compiles
        if not buf:
            return
        x = np.stack([np.ascontiguousarray(b[1].transpose(1, 2, 0))
                      for b in buf])
        if len(buf) < bs:
            x = np.concatenate([x, np.repeat(x[-1:], bs - len(buf), axis=0)])
        maybe_dump(x)
        t0 = time.time()
        dets = to_host_detections(infer(preprocess(x, opt.maxabsscaler)))
        dt = (time.time() - t0) / len(buf)
        for (path, img, im0, vid_cap), det in zip(buf, dets):
            handle(path, img.shape[1:3], det, im0, vid_cap, dt)

    buf = []
    for item in dataset:
        if item[1].ndim == 4:
            # LoadStreams yields an (S, 3, H, W) multi-stream frame batch —
            # one TPU dispatch covers every stream
            paths, img, im0s, _ = item
            x = np.ascontiguousarray(img.transpose(0, 2, 3, 1))
            maybe_dump(x)
            t0 = time.time()
            dets = to_host_detections(infer(preprocess(x, opt.maxabsscaler)))
            dt = (time.time() - t0) / len(dets)
            for pth, det, im0 in zip(paths, dets, im0s):
                handle(pth, img.shape[2:4], det, im0, None, dt)
            continue
        if buf and item[1].shape != buf[0][1].shape:
            flush(buf)       # shape change (rect mode): new program anyway
            buf = []
        buf.append(item)
        if len(buf) >= bs:
            flush(buf)
            buf = []
    flush(buf)
    print(f'Results saved to {opt.output}')


if __name__ == '__main__':
    main()
