"""End-to-end inference benchmark on the flagship model (yolov3, COCO head).

Measures images/sec for the full serving pipeline at 608x608, matching the
reference headline row (README.md:228: 12.3 ms inference + 1.7 ms NMS =
71.4 fps on a 2080 Ti).

Pipeline under test: the **true-int8 engine** (models/int8_engine.py,
'auto' backend — the mixed weight-only-quant bf16 region + s8 deep region
on TPU) with int8 heads feeding the sparse-decode NMS. This is the
production serving path `runtime.make_infer` builds for calibrated
quantized models; measured 2026-08-17 at 129.9 ms/iter @bs=128 on v5e
(986 img/s) vs 142.5 ms for the plain bf16 pipeline. Set BENCH_PIPELINE=bf16
to measure the float pipeline instead.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = our images/sec / 71.4.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_FPS = 71.4  # reference yolov3 @608 total fps (BASELINE.md)

# throughput-optimal serving batch on v5e (sparse-pipeline sweep:
# bs=128 -> 899 img/s bf16, bs=256 -> 881; 128 is the knee — larger
# batches double latency for no throughput)
BS, SIZE = 128, 608


def _bf16_pipeline(net):
    import jax
    import jax.numpy as jnp
    from yolo_tpu.models.network import init_params, make_apply, fuse_params
    from yolo_tpu.ops.nms import non_max_suppression_heads

    params, state = init_params(jax.random.PRNGKey(0), net)
    fused = fuse_params(net, params, state)
    apply = make_apply(net, compute_dtype=jnp.bfloat16, fused=True,
                       heads_only=True)
    yolos = [l for l in net.layers if l.kind == 'yolo']
    anchors = [l.anchors for l in yolos]
    strides = [l.yolo_stride for l in yolos]
    no = net.nc + 5

    @jax.jit
    def pipeline(params, x):
        heads, objs = apply(params, {}, x, train=False)
        return non_max_suppression_heads(
            heads, anchors, strides, no, conf_thres=0.3, iou_thres=0.6,
            top_k=256, max_det=100, objs=objs)

    return pipeline, fused


def _int8_pipeline(net):
    import jax
    from yolo_tpu.compress import quant as Q
    from yolo_tpu.models.network import init_params
    from yolo_tpu.models.int8_engine import prepare_int8, make_int8_apply
    from yolo_tpu.ops.nms import non_max_suppression_heads

    # init + scale calibration on the host CPU (cheap tiny-batch fake-quant
    # passes); only the baked engine graph ever touches the TPU
    cpu = jax.devices('cpu')[0]
    with jax.default_device(cpu):
        params, state = init_params(jax.random.PRNGKey(0), net)
        cfg = Q.QuantConfig(scheme='google', a_bits=8, w_bits=8, steps=100,
                            shortcut_way=1)
        qstate, _ = Q.init_quant_state(net, cfg)
        apply_q = Q.make_quant_apply(net, cfg)
        xs = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3)) * 0.3 + 0.4
        st, qs = state, qstate
        for _ in range(2):
            _, st, qs = apply_q(params, st, qs, xs, train=True)
        plan = prepare_int8(net, params, state, qs, cfg)
    arrays = jax.device_put(plan.arrays, jax.devices()[0])

    eng = make_int8_apply(net, plan, backend='auto', heads_only=True)
    yolos = [l for l in net.layers if l.kind == 'yolo']
    anchors = [l.anchors for l in yolos]
    strides = [l.yolo_stride for l in yolos]
    no = net.nc + 5
    head_scales = eng.head_scales

    @jax.jit
    def pipeline(arrays, x):
        heads, objs = eng(arrays, x)
        return non_max_suppression_heads(
            heads, anchors, strides, no, conf_thres=0.3, iou_thres=0.6,
            top_k=256, max_det=100, objs=objs, head_scales=head_scales)

    return pipeline, arrays


def main():
    import jax
    from yolo_tpu.ir import build_ir

    root = os.path.dirname(os.path.abspath(__file__))
    net = build_ir(os.path.join(root, 'cfg/yolov3/yolov3.cfg'))
    builder = (_bf16_pipeline if os.environ.get('BENCH_PIPELINE') == 'bf16'
               else _int8_pipeline)
    pipeline, weights = builder(net)

    x = jax.device_put(np.random.RandomState(0).rand(BS, SIZE, SIZE, 3)
                       .astype(np.float32), jax.devices()[0])
    # warmup / compile (np.asarray forces a real device->host sync; plain
    # block_until_ready proved unreliable through the axon tunnel at large bs)
    np.asarray(pipeline(weights, x))

    # median of 5 timed blocks: the single-block figure moved ~2% run to
    # run (BENCH_r03 991.7 vs a best-observed 1008), so the reported number
    # is the reproducible median, not the best block
    iters, blocks = 10, 5
    rates = []
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = pipeline(weights, x)
        np.asarray(out)
        rates.append(BS * iters / (time.perf_counter() - t0))
    fps = float(np.median(rates))

    print(json.dumps({
        'metric': 'yolov3_608_detect_images_per_sec',
        'value': round(fps, 2),
        'unit': 'images/sec',
        'vs_baseline': round(fps / BASELINE_FPS, 3),
    }))


if __name__ == '__main__':
    main()
