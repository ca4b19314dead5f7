"""Evaluator-pipeline throughput: dense vs sparse decode, float vs
quantized (VERDICT r3 next #3 measurement).

Times the jitted eval step exactly as evaluate() builds it (forward +
eval-grade NMS conf 0.001/top_k 512/max_det 300 + device TP matching) on
device-resident batches — the hardware-representative figure (the axon
tunnel's 44 MB/s H2D would otherwise dominate; see PERFORMANCE.md
"Evaluator throughput").

Usage: python scripts/prof_eval.py [--bs 128] [--size 608]
       [--modes float_sparse quant_dense quant_sparse int8_engine]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--bs', type=int, default=128)
    p.add_argument('--size', type=int, default=608)
    p.add_argument('--iters', type=int, default=10)
    p.add_argument('--cfg', default='cfg/yolov3/yolov3.cfg')
    p.add_argument('--trace', action='store_true',
                   help='jax.profiler trace of the LAST mode + hlo_stats')
    p.add_argument('--trace-dir', default='/tmp/jtrace_eval')
    p.add_argument('--top', type=int, default=30)
    p.add_argument('--modes', nargs='+',
                   default=['float_sparse', 'quant_dense', 'quant_sparse',
                            'int8_engine'],
                   help="also: quant_sparse_bf16 (bf16 MACs, f32 snaps), "
                        "quant_sparse_bf16snap (bf16 MACs + bf16 snaps)")
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp
    from yolo_tpu.compress import quant as Q
    from yolo_tpu.eval.evaluator import _build_infer
    from yolo_tpu.ir import build_ir
    from yolo_tpu.models.network import init_params
    from yolo_tpu.train.loss import LossHyp, pad_targets

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    net = build_ir(os.path.join(root, opt.cfg))
    anchor_vecs = [l.anchors / l.yolo_stride for l in net.layers
                   if l.kind == 'yolo']

    # init + calibration on the host CPU; only the timed graph touches TPU
    cpu = jax.devices('cpu')[0]
    with jax.default_device(cpu):
        params, state = init_params(jax.random.PRNGKey(0), net)
        cfg = Q.QuantConfig(scheme='google', a_bits=8, w_bits=8, steps=100)
        qstate, _ = Q.init_quant_state(net, cfg)
        qapply = Q.make_quant_apply(net, cfg, compute_dtype=jnp.float32)
        xs = (jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3)) * 0.3
              + 0.4)
        st, qs = state, qstate
        for _ in range(2):
            _, st, qs = qapply(params, st, qs, xs, train=True)

    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    state = jax.device_put(state, dev)
    qs = jax.device_put(qs, dev)
    bs = opt.bs
    x = jax.device_put(np.random.RandomState(0)
                       .rand(bs, opt.size, opt.size, 3).astype(np.float32),
                       dev)
    labels = [np.array([[1, .5, .5, .2, .3]], np.float32)] * bs
    tgt, valid = pad_targets(labels, 2 * bs)
    tgt = jax.device_put(np.asarray(tgt), dev)
    valid = jax.device_put(np.asarray(valid), dev)

    common = dict(anchor_vecs=anchor_vecs, loss_hyp=LossHyp(),
                  want_loss=False, augment=False, fused=False,
                  compute_dtype=jnp.bfloat16, maxabsscaler=False,
                  conf_thres=0.001, iou_thres=0.6, top_k=512, max_det=300,
                  multi_label=True, iouv_t=(0.5,), device_match=True, nc=80)

    def build(mode):
        if mode == 'float_sparse':
            return _build_infer(net, quant_apply=None, sparse=True,
                                **common), (params, state, None)
        if mode == 'quant_dense':
            return _build_infer(net, quant_apply=qapply, sparse=False,
                                **common), (params, state, qs)
        if mode == 'quant_sparse':
            return _build_infer(net, quant_apply=qapply, sparse=True,
                                **common), (params, state, qs)
        if mode in ('quant_a32', 'quant_w32'):
            # isolation probes: a_bits=32 / w_bits=32 disable the activation
            # / weight quantizer chains respectively (bits==32 passthrough)
            c2 = cfg._replace(a_bits=32 if mode == 'quant_a32' else 8,
                              w_bits=32 if mode == 'quant_w32' else 8)
            qa = Q.make_quant_apply(net, c2, compute_dtype=jnp.bfloat16)
            return _build_infer(net, quant_apply=qa, sparse=True,
                                **common), (params, state, qs)
        if mode == 'quant_prepared':
            # prepared eval params + bf16 snaps: the shipped eval pipeline
            qa = Q.make_quant_apply(net, cfg, compute_dtype=jnp.bfloat16,
                                    eval_snap_dtype=jnp.bfloat16)
            with jax.default_device(cpu):
                prep = Q.prepare_eval_params(net, cfg, jax.device_get(params),
                                             jax.device_get(st),
                                             jax.device_get(qs))
            prep = jax.device_put(prep, dev)
            return _build_infer(net, quant_apply=qa, sparse=True,
                                **common), (prep, state, qs)
        if mode in ('quant_sparse_bf16', 'quant_sparse_bf16snap'):
            qa = Q.make_quant_apply(
                net, cfg, compute_dtype=jnp.bfloat16,
                eval_snap_dtype=(jnp.bfloat16 if mode.endswith('snap')
                                 else None))
            return _build_infer(net, quant_apply=qa, sparse=True,
                                **common), (params, state, qs)
        if mode == 'int8_engine':
            from yolo_tpu.models.int8_engine import (make_int8_apply,
                                                     prepare_int8)
            from yolo_tpu.ops.nms import non_max_suppression_heads
            from yolo_tpu.eval.matching import match_device
            with jax.default_device(cpu):
                plan = prepare_int8(net, jax.device_get(params),
                                    jax.device_get(state),
                                    jax.device_get(qs), cfg)
            arrays = jax.device_put(plan.arrays, dev)
            eng = make_int8_apply(net, plan, backend='auto', heads_only=True)
            yolos = [l for l in net.layers if l.kind == 'yolo']

            @jax.jit
            def infer(arrays, _unused, _unused2, x, targets, valid, img_w):
                heads, objs = eng(arrays, x)
                dets = non_max_suppression_heads(
                    heads, [l.anchors for l in yolos],
                    [l.yolo_stride for l in yolos], yolos[0].no,
                    conf_thres=0.001, iou_thres=0.6, top_k=512, max_det=300,
                    multi_label=True, objs=objs, head_scales=eng.head_scales)
                correct = match_device(dets, targets, valid,
                                       float(x.shape[2]), float(x.shape[1]),
                                       (0.5,))
                return dets, jnp.zeros(3), correct
            return infer, (arrays, None, None)
        raise ValueError(mode)

    for mode in opt.modes:
        infer, (p_, s_, q_) = build(mode)
        img_w = jnp.ones(bs, jnp.float32)
        out = infer(p_, s_, q_, x, tgt, valid, img_w)
        np.asarray(out[0])                      # compile + sync
        t0 = time.perf_counter()
        for _ in range(opt.iters):
            out = infer(p_, s_, q_, x, tgt, valid, img_w)
        np.asarray(out[0])
        dt = (time.perf_counter() - t0) / opt.iters
        print(f'eval [{mode}] bs={bs} size={opt.size}: {dt * 1e3:.1f} '
              f'ms/batch, {bs / dt:.0f} img/s', flush=True)
        if opt.trace and mode == opt.modes[-1]:
            os.system(f'rm -rf {opt.trace_dir}')
            jax.profiler.start_trace(opt.trace_dir)
            for _ in range(2):
                out = infer(p_, s_, q_, x, tgt, valid, img_w)
            np.asarray(out[0])
            jax.profiler.stop_trace()
            from prof_int8 import dump_hlo_stats
            dump_hlo_stats(opt.trace_dir, opt.top)


if __name__ == '__main__':
    main()
