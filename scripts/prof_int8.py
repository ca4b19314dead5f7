"""Profile the true-int8 pipeline (yolov3 @608, bs=128) on the real chip.

Times the end-to-end heads+sparse-NMS int8 engine and dumps the top
hlo_stats rows (self-time, bound-by, achieved GFLOP/s) to locate where the
160 ms goes vs the bf16 pipeline's 142 ms (VERDICT r1 next-round #2).

Usage: python scripts/prof_int8.py [--backend auto|pallas|xla|bf16|mixed]
       [--bs 128] [--size 608] [--trace]
"""

import argparse
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--backend', default='auto',
                   help="int8 engine backend, or 'bf16' for the float "
                        'pipeline (comparison baseline)')
    p.add_argument('--bs', type=int, default=128)
    p.add_argument('--size', type=int, default=608)
    p.add_argument('--trace', action='store_true')
    p.add_argument('--trace-dir', default='/tmp/jtrace_int8')
    p.add_argument('--top', type=int, default=30)
    p.add_argument('--pallas-min-hw', type=int, default=0)
    p.add_argument('--pallas-max-hw', type=int, default=10 ** 9)
    p.add_argument('--bf16-min-hw', type=int, default=76,
                   help="mixed backend's bf16-region boundary (conv output "
                        'map >= this stays bf16 weight-only)')
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp
    from yolo_tpu.compress import quant as Q
    from yolo_tpu.ir import build_ir
    from yolo_tpu.models.int8_engine import make_int8_apply, prepare_int8
    from yolo_tpu.models.network import init_params
    from yolo_tpu.ops.nms import non_max_suppression_heads

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    net = build_ir(os.path.join(root, 'cfg/yolov3/yolov3.cfg'))
    params, state = init_params(jax.random.PRNGKey(0), net)

    yolos = [l for l in net.layers if l.kind == 'yolo']
    anchors = [l.anchors for l in yolos]
    strides = [l.yolo_stride for l in yolos]
    no = net.nc + 5

    if opt.backend == 'bf16':
        from yolo_tpu.models.network import fuse_params, make_apply
        fused = fuse_params(net, params, state)
        applyf = make_apply(net, compute_dtype=jnp.bfloat16, fused=True,
                            heads_only=True)

        @jax.jit
        def pipeline(arrays, x):
            heads, objs = applyf(arrays, {}, x, train=False)
            return non_max_suppression_heads(
                heads, anchors, strides, no, conf_thres=0.3, iou_thres=0.6,
                top_k=256, max_det=100, objs=objs)

        run(opt, pipeline, fused)
        return

    # calibrate at small size (per-tensor scales are size-independent);
    # cache to disk — the fake-quant calibration graph costs minutes of
    # fresh XLA compile per run otherwise
    import pickle
    cfg = Q.QuantConfig(scheme='google', a_bits=8, w_bits=8, steps=100)
    cache = '/tmp/prof_int8_calib.pkl'
    if os.path.exists(cache):
        with open(cache, 'rb') as f:
            st, qs = pickle.load(f)
        st = jax.tree_util.tree_map(jnp.asarray, st)
        qs = jax.tree_util.tree_map(jnp.asarray, qs)
    else:
        qstate, _ = Q.init_quant_state(net, cfg)
        apply_q = Q.make_quant_apply(net, cfg)
        xs = (jax.random.normal(jax.random.PRNGKey(2), (2, 128, 128, 3))
              * 0.3 + 0.4)
        st, qs = state, qstate
        for _ in range(2):
            _, st, qs = apply_q(params, st, qs, xs, train=True)
        with open(cache, 'wb') as f:
            pickle.dump((jax.device_get(st), jax.device_get(qs)), f)
    plan = prepare_int8(net, params, st, qs, cfg)
    eng = make_int8_apply(net, plan, backend=opt.backend,
                          pallas_min_hw=opt.pallas_min_hw,
                          pallas_max_hw=opt.pallas_max_hw, heads_only=True,
                          bf16_min_hw=opt.bf16_min_hw)

    @jax.jit
    def pipeline(arrays, x):
        heads, objs = eng(arrays, x)
        return non_max_suppression_heads(
            heads, anchors, strides, no, conf_thres=0.3, iou_thres=0.6,
            top_k=256, max_det=100, objs=objs,
            head_scales=eng.head_scales)

    run(opt, pipeline, plan.arrays)


def run(opt, pipeline, arrays):
    import jax
    import jax.numpy as jnp
    x = jnp.asarray(np.random.RandomState(0)
                    .rand(opt.bs, opt.size, opt.size, 3).astype(np.float32))
    t0 = time.perf_counter()
    np.asarray(pipeline(arrays, x))
    print(f'compile+first run: {time.perf_counter() - t0:.1f}s', flush=True)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(arrays, x)
    np.asarray(out)
    dt = time.perf_counter() - t0
    print(f'backend={opt.backend} bs={opt.bs} size={opt.size}: '
          f'{dt / iters * 1e3:.1f} ms/iter, {opt.bs * iters / dt:.0f} img/s',
          flush=True)

    if not opt.trace:
        return
    os.system(f'rm -rf {opt.trace_dir}')
    jax.profiler.start_trace(opt.trace_dir)
    for _ in range(2):
        out = pipeline(arrays, x)
    np.asarray(out)
    jax.profiler.stop_trace()
    dump_hlo_stats(opt.trace_dir, opt.top)


def dump_hlo_stats(trace_dir, top, iters=2):
    """Print the top ops by self time: ms/iter, category, bound-by,
    achieved GFLOP/s and BW, operand shapes/layouts, source line."""
    from xprof.convert import raw_to_tool_data
    files = glob.glob(f'{trace_dir}/**/*.xplane.pb', recursive=True)
    data, _ = raw_to_tool_data.xspace_to_tool_data(files, 'hlo_stats', {})
    d = json.loads(data)
    cols = [c['label'] for c in d['cols']]
    I = {c: i for i, c in enumerate(cols)}
    rows = [[c.get('v') for c in r['c']] for r in d['rows']]
    rows.sort(key=lambda v: -(v[I['Total self time (us)']] or 0))
    tot = sum((v[I['Total self time (us)']] or 0) for v in rows)
    print(f'total self time: {tot / iters / 1000:.1f} ms/iter')
    for v in rows[:top]:
        txt = v[I['HLO op text']] or ''
        m = re.findall(r'(s8|s32|f32|bf16|u8|s16|pred)\[([0-9,]+)\]'
                       r'\{([0-9,]+)', txt)
        shapes = ' '.join(f'{t}[{s}]{{{l}}}' for t, s, l in m[:3])
        src = re.search(r"title='([^:']+:\d+)", v[I['Source Info']] or '')
        print(f"{(v[I['Total self time (us)']] or 0) / iters / 1000:7.2f}ms "
              f"{(v[I['HLO op category']] or '')[:24]:24s} "
              f"{v[I['Bound by']] or '':7s} "
              f"GF/s={v[I['Model GFLOP/s']] or 0:9.0f} "
              f"BW={v[I['Measured memory BW (GiB/s)']] or 0:6.0f} "
              f"n={v[I['#Occurrences']]:.0f} {shapes[:90]} "
              f"{src.group(1).split('/')[-1] if src else ''}", flush=True)


if __name__ == '__main__':
    main()
