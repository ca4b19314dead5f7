"""Profile the jitted training step (yolov3, bs and size configurable).

VERDICT r1 next-round #4: measure the 608px train step, locate the MFU gap
(inference runs ~66% of bf16 peak; round-1 training was ~40-45% at 416px),
and attack BN-stat fusion / remat / host syncs. Dumps hlo_stats top rows.

Usage: python scripts/prof_train.py [--bs 64] [--size 608] [--trace]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--bs', type=int, default=64)
    p.add_argument('--size', type=int, default=608)
    p.add_argument('--trace', action='store_true')
    p.add_argument('--trace-dir', default='/tmp/jtrace_train')
    p.add_argument('--top', type=int, default=35)
    p.add_argument('--accum', type=int, default=1)
    p.add_argument('--remat', default='none', choices=['none', 'blocks',
                                                       'full'])
    p.add_argument('--cfg', default='cfg/yolov3/yolov3.cfg')
    p.add_argument('--quantized', type=int, default=-1,
                   help='-1 float, 1 google QAT, 2 TPSQ (measures the '
                        'compression-training hot path, VERDICT r2 #1)')
    p.add_argument('--qat-dtype', default='bf16', choices=['bf16', 'f32'])
    p.add_argument('--qat-layout', default='nhwc',
                   choices=['nhwc', 'anchor_major'])
    p.add_argument('--qat-frozen', action='store_true',
                   help='measure the post-BN-freeze fast step (no parallel '
                        'float stat conv; train/loop.py switches to it at '
                        'BN_freeze_step)')
    p.add_argument('--s2d-min-hw', type=int, default=0,
                   help='lower 3x3/s2 convs with input >= this px through '
                        'the space-to-depth rewrite (0 = off)')
    p.add_argument('--kd', type=int, default=0,
                   help='KD strategy 1-5 (teacher = same cfg, own random '
                        'weights, bf16 apply inside the step)')
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp
    from yolo_tpu.ir import build_ir
    from yolo_tpu.models.network import init_params
    from yolo_tpu.train.loss import LossHyp, pad_targets
    from yolo_tpu.train.schedules import burn_in_scalars
    from yolo_tpu.train.trainer import init_train_state, make_train_functions

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    net = build_ir(os.path.join(root, opt.cfg))
    params, state = init_params(jax.random.PRNGKey(0), net)
    anchor_vecs = [l.anchors / l.yolo_stride for l in net.layers
                   if l.kind == 'yolo']

    qstate = None
    quant_apply = None
    if opt.quantized != -1:
        from yolo_tpu.compress.quant import QuantConfig, init_quant_state, \
            make_quant_apply
        scheme = {1: 'google', 2: 'tpsq'}[opt.quantized]
        qcfg = QuantConfig(scheme=scheme, a_bits=8, w_bits=8, steps=10000)
        qstate, extra = init_quant_state(net, qcfg)
        for k, v in extra.items():
            params[k] = {**params[k], **v}
        quant_apply = make_quant_apply(
            net, qcfg,
            compute_dtype=(jnp.float32 if opt.qat_dtype == 'f32'
                           else jnp.bfloat16),
            head_layout=opt.qat_layout, bn_frozen=opt.qat_frozen)

    kd_fn = None
    if opt.kd:
        from yolo_tpu.models.network import make_apply
        from yolo_tpu.train import kd as kd_mod
        t_params, t_state = init_params(jax.random.PRNGKey(1), net)
        layout = 'nhwc' if opt.kd != 6 else 'anchor_major'
        t_apply = make_apply(net, compute_dtype=jnp.bfloat16,
                             head_layout=layout)
        kd_fn = kd_mod.make_kd_loss_fn(
            opt.kd, t_apply, t_params, t_state, 80, anchor_vecs,
            img_size=opt.size,
            strides=[l.yolo_stride for l in net.layers if l.kind == 'yolo'],
            layout=layout)

    grad_fn, update_fn = make_train_functions(
        net, anchor_vecs, nc=80, hyp=LossHyp(),
        compute_dtype=jnp.bfloat16,
        optimizer='adam' if opt.quantized != -1 else 'sgd',
        kd_loss_fn=kd_fn, quant_apply=quant_apply,
        s2d_min_hw=opt.s2d_min_hw,
        remat=(False if opt.remat == 'none'
               else True if opt.remat == 'full' else opt.remat))
    ts = init_train_state(params, state, use_ema=True, qstate=qstate,
                          optimizer='adam' if opt.quantized != -1 else 'sgd')

    bs = opt.bs
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(bs, opt.size, opt.size, 3).astype(np.float32))
    labels = [np.array([[1, .5, .5, .2, .3], [0, .3, .3, .1, .1]],
                       np.float32)] * bs
    tgt, valid = pad_targets(labels, 32)
    tgt, valid = jnp.asarray(tgt), jnp.asarray(valid)
    scalars, gr, _ = burn_in_scalars(1000, 500, 0, lr0=0.01, momentum=0.937,
                                     weight_decay=5e-4, epochs=10,
                                     batch_size=bs)

    def step(ts):
        for _ in range(opt.accum):
            ts, items = grad_fn(ts, x, tgt, valid, gr, 1.0)
        ts = update_fn(ts, scalars)
        return ts, items

    t0 = time.perf_counter()
    ts, items = step(ts)
    np.asarray(items)
    print(f'compile+first step: {time.perf_counter() - t0:.1f}s', flush=True)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, items = step(ts)
    np.asarray(items)
    dt = time.perf_counter() - t0
    n_img = bs * opt.accum
    mode = (f'q{opt.quantized}/{opt.qat_dtype}/{opt.qat_layout}'
            + ('/frozen' if opt.qat_frozen else '')
            if opt.quantized != -1 else
            f'kd{opt.kd}' if opt.kd else 'float')
    print(f'train [{mode}] bs={bs} size={opt.size} accum={opt.accum}: '
          f'{dt / iters * 1e3:.1f} ms/step, {n_img * iters / dt:.0f} img/s',
          flush=True)

    if not opt.trace:
        return
    os.system(f'rm -rf {opt.trace_dir}')
    jax.profiler.start_trace(opt.trace_dir)
    for _ in range(2):
        ts, items = step(ts)
    np.asarray(items)
    jax.profiler.stop_trace()
    from prof_int8 import dump_hlo_stats
    dump_hlo_stats(opt.trace_dir, opt.top)


if __name__ == '__main__':
    main()
