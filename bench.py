"""End-to-end inference benchmark on the flagship model (yolov3, COCO head).

Measures images/sec for the full detect pipeline — fused bf16 forward + YOLO
decode + on-device batched NMS — at 608x608, matching the reference headline
row (README.md:228: 12.3 ms inference + 1.7 ms NMS = 71.4 fps on a 2080 Ti).

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


def main():
    import jax
    import jax.numpy as jnp
    from yolo_tpu.ir import build_ir
    from yolo_tpu.models.network import init_params, make_apply, fuse_params
    from yolo_tpu.ops.nms import non_max_suppression_heads

    root = os.path.dirname(os.path.abspath(__file__))
    net = build_ir(os.path.join(root, 'cfg/yolov3/yolov3.cfg'))
    params, state = init_params(jax.random.PRNGKey(0), net)
    fused = fuse_params(net, params, state)
    apply = make_apply(net, compute_dtype=jnp.bfloat16, fused=True,
                       heads_only=True)
    yolos = [l for l in net.layers if l.kind == 'yolo']
    anchors = [l.anchors for l in yolos]
    strides = [l.yolo_stride for l in yolos]
    no = net.nc + 5

    # throughput-optimal serving batch on v5e (sparse-pipeline sweep:
    # bs=128 -> 899 img/s, bs=256 -> 881; 128 is the knee — larger batches
    # double latency for no throughput)
    bs, size = 128, 608

    @jax.jit
    def pipeline(params, x):
        heads, objs = apply(params, {}, x, train=False)
        # sparse-decode NMS: obj-logit top-k per scale, decode survivors
        return non_max_suppression_heads(
            heads, anchors, strides, no, conf_thres=0.3, iou_thres=0.6,
            top_k=256, max_det=100, objs=objs)

    x = jnp.asarray(np.random.RandomState(0).rand(bs, size, size, 3)
                    .astype(np.float32))
    # warmup / compile (np.asarray forces a real device->host sync; plain
    # block_until_ready proved unreliable through the axon tunnel at large bs)
    np.asarray(pipeline(fused, x))

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(fused, x)
    np.asarray(out)
    dt = time.perf_counter() - t0
    fps = bs * iters / dt

    print(json.dumps({
        'metric': 'yolov3_608_detect_images_per_sec',
        'value': round(fps, 2),
        'unit': 'images/sec',
        'vs_baseline': round(fps / BASELINE_FPS, 3),
    }))


if __name__ == '__main__':
    main()
