"""True-int8 inference engine: quantized convs execute on the MXU in s8xs8->s32.

The fake-quant graphs (compress/quant.py, mirroring the reference's
utils/quantized/*.py) *simulate* integer arithmetic in float. This module
runs the calibrated model with real int8 tensors end-to-end:

  - conv weights are pre-quantized to int8 (BN folded, pow-2 scale);
  - activations travel between layers as int8 in HBM (half the bytes of
    bf16 — the pipeline is bandwidth-bound, SURVEY.md §6 north star names
    int8 images/sec/chip as the headline metric);
  - each conv runs ``lax.conv_general_dilated`` s8xs8 with int32
    accumulation (1.4x the MXU throughput of bf16 on v5e), then a fused
    f32 epilogue: scale (s_in * s_w), bias, activation, requantize to the
    layer's own output scale — exactly the arithmetic the fake-quant sim
    models, so engine ≈ sim to f32 rounding;
  - shortcut/concat follow the sim's requantization chains
    (QuantizedShortcut min/max ways, QuantizedFeatureConcat common scale).

Scales are read from a *calibrated* qstate (QAT or PTQ) at prepare time and
baked into the jitted program as constants (they are frozen after
calibration — quantized_google.py Scale_freeze_step semantics).

Layers int8 cannot express (float input edge, SE, avgpool) fall back to
bf16 for that edge only.

Performance status (v5e, 2026-08-17): with ``heads_only`` + the
sparse-decode NMS, the 'mixed' backend (TPU 'auto' default — bf16
weight-only-quant high-resolution region, s8 edges in the deep region,
see make_int8_apply) runs 129.9 ms e2e @bs=128 608px = **986 img/s,
13.8x the reference GPU baseline and ~10% FASTER than the bf16
pipeline's 899** — int8 is the fast serving path, not just the
deployment-semantics one. The bit-faithful all-s8 'xla' backend runs
160 ms @bs=128 (800 img/s) with half the activation HBM footprint. The
engine doubles as the *semantics* reference for integer deployment (and
the FPGA export path).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ir import NetworkIR
from ..ops import activations as act_mod
from ..ops import conv as conv_ops
from ..models.yolo_head import decode_yolo_nhwc, reshape_pred
from ..compress.quant import QuantConfig, qrange, round_half_away

BN_EPS = 1e-5


class Int8Plan(NamedTuple):
    arrays: dict            # {layer_key: {'w8': int8 HWIO, 'bias': f32}}
    meta: dict              # {layer_key: {'sw','sa','in_scale','sc','rs': float}}
    a_bits: int
    shortcut_way: int
    maxabsscaler: bool
    scheme: str = 'google'  # google | ptq_cos share tracker semantics; tpsq
                            # carries the asymmetric quant/dequant grid


def _q_arr(x, scale, bits):
    qmin, qmax = qrange(bits, True)
    return np.clip(np.sign(x) * np.floor(np.abs(x) / scale + 0.5),
                   qmin, qmax).astype(np.int8 if bits <= 8 else np.int32)


def _tpsq_p2(v) -> float:
    """Concrete value of search_pow2 (compress/quant.py): clip to
    [2^-5, 2^13], snap to the nearest power of two by linear distance
    (quantized_TPSQ.py:29-64)."""
    v = float(np.clip(np.asarray(v, np.float64), 2.0 ** -5, 2.0 ** 13))
    lo, hi = 2.0 ** np.floor(np.log2(v)), 2.0 ** np.ceil(np.log2(v))
    return hi if abs(hi - v) < abs(lo - v) else lo


def prepare_int8(net: NetworkIR, params, state, qstate,
                 cfg: QuantConfig) -> Int8Plan:
    """Fold BN, quantize weights/biases to integers, extract frozen scales.

    Mirrors the eval path of compress/quant.py make_quant_apply: w_fold =
    w * gamma/sqrt(var+eps), bias = beta - mean*inv (+ b*inv), both
    fake-quantized with their tracker scales (here: true integer weights plus
    a dequantized f32 bias vector, which is what the fused epilogue adds).

    TPSQ (scheme='tpsq'): scales are trainable params, not tracker state —
    each site's pow-2 range p2 = search_pow2(params[k][{'w','b','a'}_scale]).
    tpsq_quantize is asymmetric (quantized_TPSQ.py:78-118): quant step
    p2/(2^{b-1}-1) with saturation at ±(2^{b-1}-1), dequant grid p2/2^{b-1}.
    The plan stores the *dequant* scale (what the s32 epilogue multiplies
    by); make_int8_apply re-derives the quant step from plan.scheme.
    Shortcuts/concats stay float, exactly like the fake-quant sim
    (reference models.py:273-274 keeps the plain Shortcut for TPSQ).
    """
    arrays: dict[str, dict] = {}
    meta: dict[str, dict] = {}
    tpsq = cfg.scheme == 'tpsq'
    for lyr in net.layers:
        k = str(lyr.index)
        if lyr.kind in ('conv', 'depthwise'):
            p = {f: np.asarray(v, np.float64) for f, v in params[k].items()}
            if lyr.bn:
                st = state[k]
                inv = p['gamma'] / np.sqrt(np.asarray(st['var'], np.float64)
                                           + BN_EPS)
                w_fold = p['w'] * inv[None, None, None, :]
                bias = (p['beta'] + (p.get('b', 0.0) - np.asarray(
                    st['mean'], np.float64)) * inv)
            else:
                w_fold = p['w']
                bias = p.get('b', np.zeros(lyr.filters))
            if tpsq:
                # weight/bias grid from w_bits, activation grid from a_bits
                # — make_int8_apply's rq_fac is a_bits-derived, so sa must
                # use the a_bits dequant divisor or mixed-precision (a!=w)
                # exports silently mis-scale activations
                qr_q = (1 << (cfg.w_bits - 1)) - 1
                qr_dq = 1 << (cfg.w_bits - 1)
                qa_dq = 1 << (cfg.a_bits - 1)
                p2w = _tpsq_p2(params[k]['w_scale'])
                p2b = _tpsq_p2(params[k]['b_scale'])
                p2a = _tpsq_p2(params[k]['a_scale'])
                # clamp-to-±p2 then scale by qr_q/p2 == scale then saturate
                w8 = _q_arr(w_fold, p2w / qr_q, cfg.w_bits)
                w8 = np.clip(w8, -qr_q, qr_q)
                b8 = np.clip(_q_arr(bias, p2b / qr_q, cfg.w_bits),
                             -qr_q, qr_q)
                bias_dq = b8.astype(np.float32) * np.float32(p2b / qr_dq)
                sw, sa = p2w / qr_dq, p2a / qa_dq
            else:
                qs = qstate[k]
                sw = float(np.asarray(qs['wq']['scale']))
                sb = float(np.asarray(qs['bq']['scale']))
                sa = float(np.asarray(qs['aq']['scale']))
                w8 = _q_arr(w_fold, sw, cfg.w_bits)
                bias_dq = _q_arr(bias, sb, cfg.w_bits).astype(np.float32) * sb
            arrays[k] = {'w8': jnp.asarray(w8),
                         'bias': jnp.asarray(bias_dq, jnp.float32)}
            meta[k] = {'sw': sw, 'sa': sa}
        elif lyr.kind == 'shortcut':
            if k in qstate and not tpsq:
                meta[k] = {
                    'in_scale': float(np.asarray(
                        qstate[k]['input_scale' if cfg.shortcut_way == 1
                                  else 'scale'])),
                    'sc': float(np.asarray(qstate[k]['scale'])),
                }
            if lyr.weighted and k in params:
                arrays[k] = {'w': jnp.asarray(params[k]['w'])}
        elif lyr.kind == 'route' and len(lyr.layers) > 1 and k in qstate:
            meta[k] = {'rs': float(np.asarray(qstate[k]['scale']))}
        elif lyr.kind == 'se':
            # float fallback edge (the fake-quant sim keeps SE in float too,
            # quant.py make_quant_apply; reference models.py:217-222)
            arrays[k] = {'fc1': jnp.asarray(params[k]['fc1'], jnp.float32),
                         'fc2': jnp.asarray(params[k]['fc2'], jnp.float32)}
        elif lyr.kind == 'batchnorm':
            st = state[k]
            arrays[k] = {
                'gamma': jnp.asarray(params[k]['gamma'], jnp.float32),
                'beta': jnp.asarray(params[k]['beta'], jnp.float32),
                'mean': jnp.asarray(st['mean'], jnp.float32),
                'var': jnp.asarray(st['var'], jnp.float32)}
    return Int8Plan(arrays=arrays, meta=meta, a_bits=cfg.a_bits,
                    shortcut_way=cfg.shortcut_way,
                    maxabsscaler=cfg.maxabsscaler, scheme=cfg.scheme)


# carried edge: ('q', int8_array, concrete_scale) | ('f', float_array)

def _as_float(t):
    if t[0] == 'f':
        a = t[1]
        return a if a.dtype == jnp.float32 else a.astype(jnp.float32)
    return t[1].astype(jnp.float32) * t[2]


def _on_tpu() -> bool:
    return jax.default_backend() == 'tpu'


def make_int8_apply(net: NetworkIR, plan: Int8Plan, backend: str = 'auto',
                    pallas_interpret: bool = False,
                    pallas_min_hw: int = 152, pallas_max_hw: int = 10 ** 9,
                    heads_only: bool = False, bf16_min_hw: int = 76):
    """Build apply(plan_arrays, x) -> (io, yolo_p). Inference only.

    ``heads_only``: return (head_out, obj_out) instead — dequantized f32
    NHWC head tensors plus per-scale objectness-logit maps (the strided
    obj-channel slice of the still-int8 head, dequantized) for the
    sparse-decode NMS (ops/nms.py non_max_suppression_heads). Skips the
    (bs, N, 5+nc) io build + decode entirely (profiled ~16 ms at
    608px/bs64 on v5e).

    backend:
      'auto'   — 'mixed' on TPU, 'xla' elsewhere (measured best, below);
      'mixed'  — high-resolution region (conv OUTPUT map >= bf16_min_hw,
                 yolo head convs excepted) runs weight-only quantization:
                 int8-derived bf16 weights, plain bf16 activations, plain
                 float residuals/concats — byte-identical per-op to the
                 bf16 pipeline, which XLA runs at ~94% MXU efficiency
                 where its s8 convs collapse to 12-30% of int8 peak. One
                 exact requant at the transition switches to s8 edges for
                 the deep region where s8 genuinely wins (38px 3x3: 2.29
                 vs 2.25 ms; 19px 3x3: 1.81 vs 2.69; 1x1s HBM-halved).
                 v5e @608 bs=128: 129.9 ms e2e = 986 img/s vs 142.5 bf16
                 (hlo_stats 2026-08-17). The bf16 region is strictly MORE
                 accurate than the per-layer fake-quant sim (activations
                 unsnapped; any grid-snap tail fused into a KxK conv
                 measured 1.5-2.4x slower — the convolution emitter loses
                 its fast path);
      'xla'    — every conv on lax.conv_general_dilated s8: the bit-
                 faithful integer reference (engine ≈ sim per-layer),
                 160 ms @608/bs128;
      'pallas' — routes supported convs (1x1 s1 / 3x3 s1,s2, same pad,
                 ungrouped, >= pallas_min_hw) through the fused Pallas
                 kernel (ops/pallas_conv.py). Per-op it wins only on 76px
                 3x3s (2.02 vs 2.30 bf16); composed it loses (269 ms: s2d/
                 pad copies + unfused shortcut requant passes). Kept as
                 the layout-controlled, parity-tested alternative
                 (pallas_interpret=True off-TPU, pallas_min_hw=0 in tests).
    """
    from ..ops import pallas_conv
    layers = net.layers
    bits = plan.a_bits
    qmin, qmax = qrange(bits, True)
    meta = plan.meta
    if backend not in ('auto', 'pallas', 'xla', 'mixed'):
        raise ValueError(f'unknown int8 backend {backend!r}')
    if backend == 'auto':
        backend = 'mixed' if _on_tpu() else 'xla'
    use_pallas = backend == 'pallas'
    use_mixed = backend == 'mixed'
    tpsq = plan.scheme == 'tpsq'
    # tpsq_quantize is asymmetric: quant step p2/qmax saturating at ±qmax,
    # dequant grid p2/(qmax+1). Edges carry the DEQUANT scale s, so the
    # requant multiplier is rq_fac/s with rq_fac = qmax/(qmax+1); the
    # tracker schemes quantize and dequantize with the same scale.
    rq_fac = (qmax / (qmax + 1.0)) if tpsq else 1.0
    rq_min = -qmax if tpsq else qmin

    def requant_edge(t, scale):
        """Requantize a carried edge to dequant-scale ``scale`` (saturating),
        honoring the plan's quant grid. Multiplies by the inverse — exact
        for the pow-2 scale family, and an f32 division would throttle the
        fused epilogue."""
        if t[0] == 'q' and t[2] == scale:
            return t
        y = round_half_away(_as_float(t) * (rq_fac / scale))
        return ('q', jnp.clip(y, rq_min, qmax).astype(jnp.int8), scale)

    def conv_i8(lyr, arr, t):
        stride = lyr.stride_xy or lyr.stride
        m = meta[str(lyr.index)]
        pad = [(lyr.pad, lyr.pad)] * 2
        s_min = (stride if isinstance(stride, int)
                 else min(stride[0], stride[1]))
        out_hw = -(-min(t[1].shape[1], t[1].shape[2]) // max(s_min, 1))
        if (use_mixed and out_hw >= bf16_min_hw
                and lyr.index not in head_conv_ids):
            # mixed backend (measured on v5e, hlo_stats 2026-08-17, yolov3
            # @608 bs128): XLA's s8 convs collapse to 12-30% of int8 peak
            # on high-resolution maps (304->152 s2: 19.1 ms s8 vs 6.9 bf16;
            # 76px 3x3: 3.8 vs 2.3 — bf16 runs at ~94% of its MXU peak
            # there), and per-layer s8<->bf16 transitions materialise
            # dequant passes that eat any per-op win (mixed-v2 measured
            # 161 ms vs 160 all-s8). So the whole high-resolution region
            # runs the bf16 pipeline shape-for-shape, but with FAKE-QUANT
            # epilogues: dequantized-int8 weights, and each conv output
            # snapped to its activation grid (clip(round(y/sa))*sa) inside
            # the fused epilogue. Edges stay bf16-on-the-int8-grid
            # (('f', y, sa) 3-tuples) until the single transition below
            # bf16_min_hw, where one exact requant (values already on the
            # grid) switches to s8 edges. Arithmetic still tracks the
            # fake-quant sim; head convs are pinned to s8 so the exported
            # head_scales contract stays static.
            # NO per-layer activation snap here: any grid-snap tail fused
            # into a KxK convolution measured 1.5-2.4x slower on v5e (the
            # convolution emitter loses its fast path; 1x1s, which lower
            # to dots, are unaffected). The bf16 region therefore runs
            # weight-only quantization — int8-derived weights, plain bf16
            # activations (strictly MORE accurate than the per-layer-
            # snapped sim) — and the single activation quantization
            # happens at the s8 transition below, using the producer's
            # own calibrated scale.
            xf = t[1] if t[0] == 'f' else (t[1].astype(jnp.bfloat16)
                                           * jnp.bfloat16(t[2]))
            wf = arr['w8'].astype(jnp.bfloat16) * jnp.bfloat16(m['sw'])
            y = conv_ops.conv2d(xf.astype(jnp.bfloat16), wf, stride=stride,
                                padding=lyr.pad, groups=lyr.groups,
                                compute_dtype=jnp.bfloat16)
            y = y + arr['bias'].astype(jnp.bfloat16)
            y = act_mod.get(lyr.activation, plan.maxabsscaler)(y)
            return ('f', y, m['sa'])
        if use_mixed and t[0] == 'f' and len(t) == 3:
            # bf16->s8 region transition: values sit on the t[2] grid, so
            # this requant is exact
            t = requant_edge(t, t[2])
        if t[0] == 'q':
            s_int = stride if isinstance(stride, int) else stride[0]
            # the Pallas epilogue bakes the symmetric tracker grid
            # (round(y/sa), clip to [qmin,qmax]) — tpsq's asymmetric grid
            # runs on the lax path
            if (use_pallas and not tpsq
                    and not isinstance(stride, (tuple, list))
                    and pallas_min_hw <= min(t[1].shape[1], t[1].shape[2])
                    <= pallas_max_hw
                    and pallas_conv.supported(lyr.size, s_int, lyr.pad,
                                              lyr.groups)):
                q = pallas_conv.fused_conv_int8(
                    t[1], arr['w8'], arr['bias'],
                    jnp.float32(t[2] * m['sw']), jnp.float32(m['sa']),
                    stride=s_int, act=lyr.activation,
                    maxabs=plan.maxabsscaler, out_q=True, bits=bits,
                    interpret=pallas_interpret)
                return ('q', q, m['sa'])
            y = lax.conv_general_dilated(
                t[1], arr['w8'], (stride, stride) if isinstance(stride, int)
                else tuple(stride), pad,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                feature_group_count=lyr.groups,
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (t[2] * m['sw'])
        else:  # float edge (network input): dequantized-weight bf16 conv
            wf = (arr['w8'].astype(jnp.bfloat16) *
                  jnp.bfloat16(m['sw']))
            y = conv_ops.conv2d(t[1], wf, stride=stride, padding=lyr.pad,
                                groups=lyr.groups,
                                compute_dtype=jnp.bfloat16)
            y = y.astype(jnp.float32)
        y = y + arr['bias']
        y = act_mod.get(lyr.activation, plan.maxabsscaler)(y)
        # multiply by the exact pow-2 inverse — XLA cannot strength-reduce
        # a true f32 division and it throttles the fused epilogue
        q = jnp.clip(round_half_away(y * (rq_fac / m['sa'])), rq_min, qmax)
        return ('q', q.astype(jnp.int8), m['sa'])

    def shortcut_i8(lyr, arr, t, outs):
        prefer_float = use_mixed and t[0] == 'f'
        k = str(lyr.index)
        if k not in meta:
            # unquantized shortcut (tpsq keeps the plain float Shortcut,
            # reference models.py:273-274): weighted BiFPN-style sum +
            # channel-slicing rules identical to the float lowering
            # (utils/layers.py:43-72)
            x = _as_float(t)
            ws = None
            if lyr.weighted and arr is not None:
                ws = jax.nn.sigmoid(arr['w']) * (2.0 / (len(lyr.layers) + 1))
                x = x * ws[0]
            for i, j in enumerate(lyr.layers):
                a = _as_float(outs[j])
                if ws is not None:
                    a = a * ws[i + 1]
                nx_, na_ = x.shape[-1], a.shape[-1]
                if nx_ == na_:
                    x = x + a
                elif nx_ > na_:
                    x = jnp.concatenate([x[..., :na_] + a, x[..., na_:]], -1)
                else:
                    x = x + a[..., :nx_]
            return ('f', x)
        # BiFPN-style fusion weights apply in every branch, before any
        # fake-quant — mirroring the sim's qshortcut (quant.py:477-485)
        ws = None
        if lyr.weighted and arr is not None and 'w' in arr:
            ws = jax.nn.sigmoid(arr['w']) * (2.0 / (len(lyr.layers) + 1))
        if prefer_float:
            # mixed bf16 region: plain float residual (weight-only
            # quantization — see conv_i8); the calibrated sum scale rides
            # along for the eventual s8 transition
            x = t[1]
            if ws is not None:
                x = x * ws[0].astype(x.dtype)
            for i, j in enumerate(lyr.layers):
                e = outs[j]
                a = (e[1] if e[0] == 'f' else
                     e[1].astype(x.dtype) * jnp.asarray(e[2], x.dtype))
                if ws is not None:
                    a = a * ws[i + 1].astype(a.dtype)
                nx_, na_ = x.shape[-1], a.shape[-1]
                if nx_ == na_:
                    x = x + a
                elif nx_ > na_:
                    x = jnp.concatenate([x[..., :na_] + a, x[..., na_:]], -1)
                else:
                    x = x + a[..., :nx_]
            return ('f', x, meta[k]['sc'])
        m = meta[k]
        # scales are pure pow-2 (google: pow2/128, cospt: exp2/128), so the
        # precomputed inverses are exact and every fq below is a multiply,
        # never an f32 division; the mixed bf16 region runs the whole chain
        # in bf16 (values stay on 8-bit grids — exactly representable)
        dt = jnp.bfloat16 if prefer_float else jnp.float32
        in_s, inv_in = dt(m['in_scale']), dt(1.0 / m['in_scale'])
        sc, inv_sc = dt(m['sc']), dt(1.0 / m['sc'])

        def asdt(e):
            if e[0] == 'f':
                return e[1] if e[1].dtype == dt else e[1].astype(dt)
            return e[1].astype(dt) * dt(e[2])

        x = asdt(t)
        if ws is not None:
            x = x * ws[0].astype(dt)
        for i, j in enumerate(lyr.layers):
            a = asdt(outs[j])
            if ws is not None:
                a = a * ws[i + 1].astype(dt)
            if plan.shortcut_way == 2:      # max-way: saturating fq
                xq = jnp.clip(round_half_away(x * inv_in),
                              qmin, qmax) * in_s
                aq = jnp.clip(round_half_away(a * inv_in),
                              qmin, qmax) * in_s
            else:                            # min-way: round, no clamp
                xq = round_half_away(x * inv_in) * in_s
                aq = round_half_away(a * inv_in) * in_s
            nx_, na_ = xq.shape[-1], aq.shape[-1]
            if nx_ == na_:
                s = xq + aq
            elif nx_ > na_:
                s = jnp.concatenate([xq[..., :na_] + aq, xq[..., na_:]], -1)
            else:
                s = xq + aq[..., :nx_]
            x = jnp.clip(round_half_away(s * inv_sc), qmin, qmax) * sc
        q = jnp.clip(round_half_away(x * inv_sc), qmin, qmax)
        if prefer_float:    # mixed bf16 region: stay on the grid, in bf16
            return ('f', q * sc, m['sc'])
        return ('q', q.astype(jnp.int8), m['sc'])

    # static per-yolo head dequant scales for the sparse NMS (None where
    # the head conv has no exported activation scale — e.g. a scheme whose
    # head conv stays a float edge; tracker schemes and tpsq both export
    # meta['sa'], so their heads stay int8): darknet cfgs place each yolo
    # right after its head conv, so prev at the yolo layer is that conv's
    # output with scale meta['sa']
    head_scales = []
    head_conv_ids = set()
    for i, lyr in enumerate(layers):
        if lyr.kind == 'yolo' and i:
            head_scales.append(meta.get(str(layers[i - 1].index),
                                        {}).get('sa'))
            head_conv_ids.add(layers[i - 1].index)
    head_keep_q = [s is not None for s in head_scales]

    def apply(arrays, x):
        outs: dict[int, Any] = {}
        yolo_p = []
        head_out = []
        obj_out = []
        prev = ('f', x)
        for lyr in layers:
            k = str(lyr.index)
            if lyr.kind in ('conv', 'depthwise'):
                prev = conv_i8(lyr, arrays[k], prev)
            elif lyr.kind == 'maxpool':
                # monotonic: safe directly on int8 (and grid-preserving)
                pooled = conv_ops.max_pool(prev[1], lyr.size, lyr.stride)
                prev = (prev[0], pooled, *prev[2:])
            elif lyr.kind == 'upsample':
                a = conv_ops.upsample_nearest(prev[1], lyr.stride)
                prev = (prev[0], a, *prev[2:])
            elif lyr.kind == 'route':
                if len(lyr.layers) > 1:
                    parts = [outs[j] for j in lyr.layers]
                    if (use_mixed and k in meta
                            and any(t[0] == 'f' for t in parts)):
                        # a bf16-region part: float concat (weight-only
                        # quantization), carrying the calibrated common
                        # scale for the s8 transition
                        fp = [t[1].astype(jnp.bfloat16) if t[0] == 'f'
                              else t[1].astype(jnp.bfloat16)
                              * jnp.bfloat16(t[2]) for t in parts]
                        prev = ('f', jnp.concatenate(fp, -1), meta[k]['rs'])
                    elif k in meta:  # requantized concat at the common scale
                        rs = meta[k]['rs']
                        parts = [requant_edge(t, rs)[1] for t in parts]
                        prev = ('q', jnp.concatenate(parts, -1), rs)
                    else:
                        prev = ('f', jnp.concatenate(
                            [_as_float(t) for t in parts], -1))
                elif lyr.route_groups:
                    c = prev[1].shape[-1]
                    prev = (prev[0], prev[1][..., c // 2:], *prev[2:])
                else:
                    prev = outs[lyr.layers[0]]
            elif lyr.kind == 'shortcut':
                prev = shortcut_i8(lyr, arrays.get(k), prev, outs)
            elif lyr.kind == 'se':
                # float fallback edge, like the fake-quant sim (the SE gate
                # is a global pool + 2 tiny FCs — negligible vs the convs)
                a = arrays[k]
                prev = ('f', conv_ops.se_block(_as_float(prev),
                                               a['fc1'], a['fc2']))
            elif lyr.kind == 'avgpool':
                prev = ('f', jnp.mean(_as_float(prev), axis=(1, 2),
                                      keepdims=True))
            elif lyr.kind == 'scale_channels':
                prev = ('f', _as_float(outs[lyr.layers[0]]) * _as_float(prev))
            elif lyr.kind == 'batchnorm':
                # standalone BatchNorm2d block: float fallback edge
                # (LONE_BN eps 1e-4, models/network.py)
                a = arrays[k]
                prev = ('f', conv_ops.batch_norm_infer(
                    _as_float(prev), a['gamma'], a['beta'],
                    a['mean'], a['var'], 1e-4))
            elif lyr.kind == 'reorg3d':
                # pure layout op: works directly on int8, scale unchanged
                prev = (prev[0],
                        conv_ops.space_to_depth(prev[1], lyr.stride),
                        *prev[2:])
            elif lyr.kind == 'dropout':
                pass
            elif lyr.kind == 'yolo':
                if heads_only:
                    # obj-logit map: strided obj-channel slice of the
                    # (still-quantized) head; head convs are linear so the
                    # dequantized value IS the logit. The head itself stays
                    # int8 when its static scale is exported below — the
                    # sparse NMS dequantizes only the gathered survivor
                    # cells (ops/nms.py head_scales), so the full f32 head
                    # tensors are never materialised.
                    if prev[0] == 'q' and head_keep_q[len(obj_out)]:
                        om = (prev[1][..., 4::lyr.no].astype(jnp.float32)
                              * prev[2])
                        head_out.append(prev[1])
                    else:
                        hf = _as_float(prev)
                        om = hf[..., 4::lyr.no]
                        head_out.append(hf)
                    obj_out.append(om)
                else:
                    hf = _as_float(prev)
                    yolo_p.append(reshape_pred(hf, lyr.na, lyr.no))
                    head_out.append(hf)
            if lyr.is_routed:
                outs[lyr.index] = prev

        if heads_only:
            return head_out, obj_out

        ios = []
        yi = 0
        for lyr in layers:
            if lyr.kind == 'yolo':
                ios.append(decode_yolo_nhwc(head_out[yi], lyr.anchors,
                                            lyr.yolo_stride, lyr.no))
                yi += 1
        return jnp.concatenate(ios, axis=1), yolo_p

    # pass as head_scales= to non_max_suppression_heads alongside the int8
    # head_out tensors
    apply.head_scales = tuple(head_scales)
    return apply
