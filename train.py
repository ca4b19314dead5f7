#!/usr/bin/env python
"""Training CLI (reference train.py:598-665 argparse surface).

Examples:
  python train.py --cfg cfg/yolov3/yolov3.cfg --data data_cfg/coco2014.data \
      --epochs 100 --batch-size 16 --img-size 416 416 416
  python train.py --prune 0 --s 0.001 ...        # sparse training for pruning
  python train.py --quantized 1 --a-bit 8 --w-bit 8 ...   # QAT
  python train.py --t_cfg ... --t_weights ... --KDstr 1   # distillation
"""

import argparse

from yolo_tpu.utils.cli import FlexParser
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def parse_args(argv=None):
    p = FlexParser()
    p.add_argument('--cfg', type=str, default='cfg/yolov3/yolov3.cfg')
    p.add_argument('--data', type=str, default='data_cfg/coco2014.data')
    p.add_argument('--weights', type=str, default='')
    p.add_argument('--epochs', type=int, default=300)
    p.add_argument('--batch-size', type=int, default=16)
    p.add_argument('--img-size', nargs='+', type=int, default=[416, 416, 416],
                   help='[min_train, max_train, test]')
    p.add_argument('--multi-scale', action='store_true')
    p.add_argument('--rect', action='store_true')
    p.add_argument('--cache-images', action='store_true')
    p.add_argument('--single-cls', action='store_true')
    p.add_argument('--adam', action='store_true')
    p.add_argument('--ema', action='store_true', default=True)
    p.add_argument('--prune', type=int, default=-1,
                   help='-1 off, 0 normal, 1 shortcut, 2 layer sparse sets')
    p.add_argument('--s', dest='sparsity', type=float, default=0.001,
                   help='BN-gamma L1 sparsity strength')
    p.add_argument('--quantized', type=int, default=-1,
                   help='-1 float, 1 google QAT, 2 TPSQ, 3 cos-PTQ, '
                        '4 DoReFa, 5 binary-W, 6 ternary-W')
    p.add_argument('--a-bit', type=int, default=8)
    p.add_argument('--w-bit', type=int, default=8)
    p.add_argument('--qat-dtype', default='bf16', choices=['bf16', 'f32'],
                   help='QAT conv compute dtype: bf16 (default; quantizer/'
                        'tracker/BN-fold math stays f32) or f32')
    p.add_argument('--no-qat-bn-fast', dest='qat_bn_fast',
                   action='store_false', default=True,
                   help='keep the parallel float BN-stat conv after '
                        'BN_freeze_step (reference-exact trajectory) '
                        'instead of switching to the stat-conv-free step')
    p.add_argument('--shortcut_way', type=int, default=1)
    p.add_argument('--maxabsscaler', '-mas', action='store_true')
    p.add_argument('--gray-scale', '--gray_scale', dest='gray_scale',
                   action='store_true')
    p.add_argument('--pretrain', '--pt', '-pt', dest='pt',
                   action='store_true',
                   help='skip 255-ch COCO heads when loading .weights')
    p.add_argument('--evolve', action='store_true',
                   help='one hyp-evolution generation: mutate from '
                        'evolve.txt, train (notest/nosave), append result')
    p.add_argument('--bucket', type=str, default='',
                   help='gsutil bucket: per-epoch results upload (with '
                        '--name) and evolve.txt download/merge/upload, '
                        'reference train.py:527-528, 669-670')
    p.add_argument('--device', type=str, default='',
                   help='accepted for CLI compat; TPU devices are selected '
                        'automatically (JAX_PLATFORMS to override)')
    p.add_argument('--tp', type=int, default=1,
                   help='model-parallel axis size of the device mesh '
                        '(conv output-channel sharding); data-parallel uses '
                        'the remaining devices. DP over all devices is '
                        'automatic when >1 device is visible.')
    p.add_argument('--no-mesh', action='store_true',
                   help='force single-device training even when multiple '
                        'devices are visible')
    p.add_argument('--remat', default='none',
                   choices=['none', 'blocks', 'full'],
                   help="backward rematerialization: 'blocks' saves only "
                        'shortcut/route boundaries and recomputes the conv '
                        'chains (lower HBM footprint at large batch/size)')
    p.add_argument('--mixedprecision', '-mpt', dest='mpt',
                   action='store_true',
                   help='accepted for CLI compat; compute is always bf16 '
                        'mixed precision on TPU')
    p.add_argument('--rank', default=0,
                   help='accepted for CLI compat; multi-host process index '
                        'comes from jax.distributed (parallel/multihost.py)')
    p.add_argument('--local_rank', type=int, default=-1,
                   help='accepted for CLI compat (DDP launcher parameter)')
    p.add_argument('--coordinator', type=str,
                   default=os.environ.get('YOLO_TPU_COORDINATOR', ''),
                   help="multi-host: coordinator address host:port (the "
                        "reference's env-var DDP launch, train.py:93-107); "
                        "'auto' autodetects on Cloud TPU "
                        "(jax.distributed.initialize with no args)")
    p.add_argument('--num-hosts', '--num_hosts', dest='num_hosts', type=int,
                   default=int(os.environ.get('YOLO_TPU_NUM_HOSTS', '0')),
                   help='multi-host: total process count (WORLD_SIZE)')
    p.add_argument('--host-id', '--host_id', dest='host_id', type=int,
                   default=int(os.environ.get('YOLO_TPU_HOST_ID', '-1')),
                   help='multi-host: this process index (RANK)')
    p.add_argument('--t_cfg', type=str, default='', help='teacher cfg (KD)')
    p.add_argument('--t_weights', type=str, default='')
    p.add_argument('--KDstr', type=int, default=1, help='KD strategy 1-5')
    p.add_argument('--kd5-mask', '--kd5_mask', dest='kd5_mask', type=str,
                   default='diag', choices=['rect', 'diag'],
                   help="KD5 fine-grained mask: 'diag' (default) is "
                        "bit-compatible with the reference's diagonal "
                        "expansion artifact (utils/utils.py:590-596); "
                        "'rect' opts into the fixed full-cell footprint")
    p.add_argument('--notest', action='store_true')
    p.add_argument('--nosave', action='store_true')
    p.add_argument('--name', type=str, default='')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--resume', action='store_true')
    p.add_argument('--max-targets', '--max_targets', dest='max_targets',
                   type=int, default=0,
                   help='per-batch target capacity (padded fixed shape); '
                        '0 = 30*batch_size')
    p.add_argument('--device-aug', action='store_true',
                   help='run mosaic/affine/HSV/flip on the TPU '
                        '(host decodes + letterboxes only)')
    p.add_argument('--cutout', action='store_true',
                   help='cutout augmentation (off by default, like the '
                        'reference utils/datasets.py:718-763)')
    p.add_argument('--ud-flip', '--ud_flip', dest='ud_flip',
                   action='store_true',
                   help='random vertical flip (off by default, like the '
                        'reference utils/datasets.py:486-488)')
    return p.parse_args(argv)


def main(argv=None):
    opt = parse_args(argv)
    if opt.coordinator:
        # join the multi-host job BEFORE any jax op initialises the backend
        # (reference env-var DDP init, train.py:93-107)
        from yolo_tpu.parallel import init_multihost
        if opt.coordinator == 'auto':
            init_multihost()
        else:
            init_multihost(opt.coordinator,
                           num_processes=opt.num_hosts or None,
                           process_id=opt.host_id if opt.host_id >= 0
                           else None)
    from yolo_tpu.train.loop import TrainOptions, run_training
    img_size = opt.img_size
    img_size.extend([img_size[-1]] * (3 - len(img_size)))
    weights = opt.weights
    if opt.resume and not weights:
        weights = 'weights/last.npz'
    hyp_override = None
    if opt.evolve:
        # one generation per invocation (reference train.py:667-717):
        # mutate from evolve.txt (or start from the defaults), train with
        # notest/nosave, append the scored mutation
        from yolo_tpu.config import load_hyp
        from yolo_tpu.train.evolve import mutate_hyp
        opt.notest, opt.nosave = True, True
        if opt.bucket:
            # shared-bucket evolution: fetch the fleet's evolve.txt first
            # (reference train.py:669-670)
            from yolo_tpu.utils import gsutil
            gsutil.download_evolve(opt.bucket)
        hyp_override = mutate_hyp(load_hyp(None))
    topt = TrainOptions(
        cfg=opt.cfg, data=opt.data, weights=weights, epochs=opt.epochs,
        batch_size=opt.batch_size, img_size=tuple(img_size[:3]),
        multi_scale=opt.multi_scale, rect=opt.rect,
        cache_images=opt.cache_images, single_cls=opt.single_cls,
        adam=opt.adam, ema=opt.ema, prune=opt.prune, sparsity=opt.sparsity,
        quantized=opt.quantized, a_bit=opt.a_bit, w_bit=opt.w_bit,
        qat_dtype=opt.qat_dtype, qat_bn_fast=opt.qat_bn_fast,
        shortcut_way=opt.shortcut_way, maxabsscaler=opt.maxabsscaler,
        gray_scale=opt.gray_scale, pt=opt.pt, t_cfg=opt.t_cfg,
        t_weights=opt.t_weights, kd_strategy=opt.KDstr,
        kd5_mask=opt.kd5_mask, notest=opt.notest,
        nosave=opt.nosave, seed=opt.seed, device_aug=opt.device_aug,
        cutout=opt.cutout, ud_flip=opt.ud_flip,
        resume=opt.resume, hyp_override=hyp_override,
        max_targets=opt.max_targets,
        tp=opt.tp, device_mesh=False if opt.no_mesh else None,
        remat=opt.remat, bucket=opt.bucket, name=opt.name,
        results_file=f'results{opt.name}.txt' if opt.name else 'results.txt')
    results = run_training(topt)
    if opt.evolve:
        from yolo_tpu.train.evolve import print_mutation
        print_mutation(hyp_override, results, bucket=opt.bucket)
    return results


if __name__ == '__main__':
    main()
