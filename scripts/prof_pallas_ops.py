"""Per-op conv backend shootout on the real chip (yolov3 conv population).

For every conv shape in yolov3 @608 (bs=128 serving batch), times:
  - XLA bf16 conv (the mixed backend's high-resolution path),
  - XLA s8xs8->s32 conv + fused epilogue (the engine 'xla' path),
  - the Pallas fused int8 kernel at fold=none/kx/full
    (ops/pallas_conv.py; fold folds the KxK taps into the MXU
    contraction depth).

Prints ms/op and the achieved fraction of the respective MXU roof
(197 TF/s bf16 / 394 TOPS int8 on v5e) so per-layer backend policy in
models/int8_engine.py can be chosen from measurements, not guesses.

Usage: python scripts/prof_pallas_ops.py [--bs 128] [--only 76,38]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BF16_PEAK = 197e12
INT8_PEAK = 394e12

# (H, Cin, Cout, K, stride) — yolov3 @608 conv population (+ head convs)
SHAPES = [
    (608, 3, 32, 3, 1),
    (608, 32, 64, 3, 2),
    (304, 64, 32, 1, 1),
    (304, 32, 64, 3, 1),
    (304, 64, 128, 3, 2),
    (152, 128, 64, 1, 1),
    (152, 64, 128, 3, 1),
    (152, 128, 256, 3, 2),
    (76, 256, 128, 1, 1),
    (76, 128, 256, 3, 1),
    (76, 256, 512, 3, 2),
    (38, 512, 256, 1, 1),
    (38, 256, 512, 3, 1),
    (38, 512, 1024, 3, 2),
    (19, 1024, 512, 1, 1),
    (19, 512, 1024, 3, 1),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--bs', type=int, default=128)
    p.add_argument('--iters', type=int, default=3)
    p.add_argument('--repeats', type=int, default=8)
    p.add_argument('--only', default='',
                   help='comma-separated H filter, e.g. 76,38')
    p.add_argument('--folds', default='none,full')
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from yolo_tpu.ops.pallas_conv import fused_conv_int8, supported
    from yolo_tpu.ops import activations as act_mod

    only = {int(s) for s in opt.only.split(',') if s}
    folds = [f for f in opt.folds.split(',') if f]
    rng = np.random.RandomState(0)

    R = opt.repeats

    def timeit(fn, *args):
        # repeat the op R times INSIDE one jitted program (optimization
        # barriers defeat CSE): per-dispatch axon-tunnel latency (~1-2 ms)
        # and full-output transfers would otherwise swamp the op time. The
        # per-iteration jnp.sum adds one HBM read of the output — a known,
        # backend-comparable skew (~0.2 ms at 76px int8).
        def many(*a):
            acc = jnp.float32(0)
            x = a[0]
            for _ in range(R):
                x = jax.lax.optimization_barrier(x)
                y = fn(x, *a[1:])
                acc = acc + jnp.sum(y.astype(jnp.float32))
            return acc
        red = jax.jit(many)
        np.asarray(red(*args))   # sync (block_until_ready unreliable on axon)
        t0 = time.perf_counter()
        for _ in range(opt.iters):
            out = red(*args)
        np.asarray(out)
        return (time.perf_counter() - t0) / (opt.iters * R) * 1e3

    def make_bf16(stride):
        @jax.jit
        def conv_bf16(x, w, b):
            k = w.shape[0]
            y = lax.conv_general_dilated(
                x, w, (stride, stride), [(k // 2, k // 2)] * 2,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.bfloat16)
            return act_mod.get('leaky', False)(y + b)
        return conv_bf16

    def make_s8(stride):
        @jax.jit
        def conv_s8(x8, w8, b):
            k = w8.shape[0]
            y = lax.conv_general_dilated(
                x8, w8, (stride, stride), [(k // 2, k // 2)] * 2,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * np.float32(2 ** -9) + b
            y = act_mod.get('leaky', False)(y)
            q = jnp.clip(jnp.sign(y) * jnp.floor(jnp.abs(y) * 16 + 0.5),
                         -128, 127)
            return q.astype(jnp.int8)
        return conv_s8

    print(f'bs={opt.bs}  (ms/op; %roof = of bf16/int8 MXU peak)')
    print(f'{"shape":>26s} {"bf16":>12s} {"s8-xla":>12s} '
          + ' '.join(f'{"plas-" + f:>12s}' for f in folds))
    for (h, ci, co, k, s) in SHAPES:
        if only and h not in only:
            continue
        n = opt.bs
        h_out = -(-h // s)
        flops = 2.0 * n * h_out * h_out * ci * co * k * k
        x = jnp.asarray(rng.rand(n, h, h, ci).astype(np.float32) - 0.5,
                        jnp.bfloat16)
        w = jnp.asarray(rng.rand(k, k, ci, co).astype(np.float32) * 0.1,
                        jnp.bfloat16)
        b = jnp.zeros((co,), jnp.bfloat16)
        t_bf = timeit(make_bf16(s), x, w, b)

        x8 = jnp.asarray(rng.randint(-128, 128, (n, h, h, ci)), jnp.int8)
        w8 = jnp.asarray(rng.randint(-40, 41, (k, k, ci, co)), jnp.int8)
        bf = jnp.zeros((co,), jnp.float32)
        t_s8 = timeit(make_s8(s), x8, w8, bf)

        row = (f'{h:4d} {ci:4d}->{co:4d} {k}x{k}s{s}: '
               f'{t_bf:7.2f} {flops / (t_bf * 1e-3) / BF16_PEAK:4.0%} '
               f'{t_s8:7.2f} {flops / (t_s8 * 1e-3) / INT8_PEAK:4.0%}')
        for f in folds:
            # 'fold' or 'fold:tile_co' (e.g. none:512 widens the Cout tile)
            fname, _, tco = f.partition(':')
            tco = int(tco) if tco else None
            if supported(k, s, k // 2, 1):
                try:
                    t_pl = timeit(
                        lambda a, ww, bb, _f=fname, _s=s, _t=tco:
                        fused_conv_int8(
                            a, ww, bb, np.float32(2 ** -9),
                            np.float32(2 ** -4), stride=_s, act='leaky',
                            fold=_f, tile_co=_t),
                        x8, w8, bf)
                    row += (f' {t_pl:7.2f} '
                            f'{flops / (t_pl * 1e-3) / INT8_PEAK:4.0%}')
                except Exception as e:
                    row += f'  FAIL({type(e).__name__})'
            else:
                row += '         n/a'
        print(row, flush=True)


if __name__ == '__main__':
    main()
