"""Fused int8 conv Pallas kernel: s8 x s8 -> s32 MXU conv + epilogue.

The true-int8 engine (models/int8_engine.py) composes ``lax.conv`` s8 convs,
but XLA's TPU backend assigns batch-minor layouts to s8 activations in the
composed program and inserts ~20 ms relayout copies per early layer, so the
engine trails bf16 end-to-end. This kernel owns the whole quantized conv —
int8 NHWC in, int8 NHWC out, epilogue fused — so activations flow between
layers in plain row-major int8 HBM buffers and XLA's layout assignment never
sees an s8 conv at all.

Reference semantics (what the epilogue must reproduce): the reference's
quantized conv dequantizes the s32 accumulator with the input*weight scale,
adds the (dequantized) bias, applies the activation, and requantizes to the
layer's activation scale — utils/quantized/quantized_google.py
(BNFold_QuantizedConv2d forward) via compress/quant.py. Rounding is
round-half-away-from-zero, saturating to [-2^{b-1}, 2^{b-1}-1].

Design (one pallas_call per conv layer):
  - grid = (batch, H_out / TILE_H, Cout / TILE_CO); TILE_CO = 128.
  - conv = sum over the K*K taps of a (TILE_H*W_out, Cin) x (Cin, TILE_CO)
    int8 matmul with s32 accumulation — each tap reads a shifted (and for
    stride 2, decimated) window of the input rows held in VMEM.
  - input x is zero-padded once in XLA (cheap elementwise copy) so the
    kernel's row/column windows are always in bounds; the kernel DMAs the
    row slab for the current (batch, row-block) from HBM into a two-slot
    VMEM scratch, prefetching the next slab while computing (double
    buffering, overlapped with the MXU work).
  - weights/bias ride normal BlockSpec pipelining over the Cout grid dim.

Supported: groups == 1, kernel 1x1 (stride 1) and 3x3 (stride 1 or 2),
'same' padding (pad = K // 2) — exactly the conv population of the
yolov3/yolov4 families. Anything else falls back to the lax path in the
engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import activations as act_mod

TILE_CO_MAX = 128
ACC_BUDGET_BYTES = 4 * 1024 * 1024  # f32 accumulator tile cap


def _round_half_away(x):
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def _pick_tile_h(h_out: int, w_out: int, tile_co: int) -> int:
    """Largest divisor of h_out whose f32 accumulator tile fits the budget."""
    cap = max(1, ACC_BUDGET_BYTES // (w_out * tile_co * 4))
    best = 1
    for d in range(1, h_out + 1):
        if h_out % d == 0 and d <= cap:
            best = d
    return best


def supported(k: int, stride: int, pad: int, groups: int) -> bool:
    return (groups == 1 and pad == k // 2
            and ((k == 1 and stride == 1) or (k == 3 and stride in (1, 2))))


def _kernel(scale_ref, oinv_ref, x_hbm, w_ref, b_ref, o_ref, xs, sem, *,
            k: int, s: int, tile_h: int, w_out: int, cin: int, tile_co: int,
            rows_alloc: int, n_chunks: int, act: str, maxabs: bool,
            out_q: bool, qmin: int, qmax: int, out_dtype):
    b = pl.program_id(0)
    hb = pl.program_id(1)
    cob = pl.program_id(2)
    n_hb = pl.num_programs(1)
    step = b * n_hb + hb

    def dma(slot, st):
        bb = st // n_hb
        row0 = (st % n_hb) * (tile_h * s)
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(row0, rows_alloc)], xs.at[slot], sem.at[slot])

    slot = jax.lax.rem(step, 2)

    @pl.when(cob == 0)
    def _():
        @pl.when(step == 0)
        def _():
            dma(slot, step).start()

        @pl.when(step + 1 < n_chunks)
        def _():
            dma(jax.lax.rem(step + 1, 2), step + 1).start()

        dma(slot, step).wait()

    xv = xs[slot]                                   # (rows_alloc, W_al, Cin)
    acc = jnp.zeros((tile_h * w_out, tile_co), jnp.int32)
    for ky in range(k):
        if s == 1:
            rows = xv[ky:ky + tile_h]
        else:   # decimate rows: pick ky + s*t for t in [0, tile_h)
            rows = xv[ky:ky + s * tile_h].reshape(tile_h, s, -1, cin)[:, 0]
        for kx in range(k):
            if s == 1:
                win = rows[:, kx:kx + w_out]
            else:   # decimate cols: pick kx + s*u for u in [0, w_out)
                win = (rows[:, kx:kx + s * w_out]
                       .reshape(tile_h, w_out, s, cin)[:, :, 0])
            acc = acc + jax.lax.dot_general(
                win.reshape(tile_h * w_out, cin), w_ref[ky, kx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

    y = acc.astype(jnp.float32) * scale_ref[0, 0] + b_ref[0]
    y = act_mod.get(act, maxabs)(y)
    if out_q:
        q = jnp.clip(_round_half_away(y * oinv_ref[0, 0]), qmin, qmax)
        o_ref[0] = q.astype(jnp.int8).reshape(tile_h, w_out, tile_co)
    else:
        o_ref[0] = y.astype(out_dtype).reshape(tile_h, w_out, tile_co)


@functools.partial(
    jax.jit, static_argnames=('stride', 'act', 'maxabs', 'out_q', 'bits',
                              'interpret'))
def fused_conv_int8(x8, w8, bias, scale, out_scale, *, stride: int,
                    act: str = 'leaky', maxabs: bool = False,
                    out_q: bool = True, bits: int = 8,
                    interpret: bool = False):
    """Quantized conv: int8 NHWC x int8 HWIO -> int8 (or f32) NHWC.

    y = act(conv_s32(x8, w8) * scale + bias); out_q: requantize to
    ``out_scale`` (round half away, saturate to the ``bits`` range).

    scale / out_scale are scalar (per-tensor) f32; bias is f32[Cout].
    """
    n, h, w, cin = x8.shape
    k, _, _, cout = w8.shape
    p = k // 2
    if not supported(k, stride, p, 1):
        raise ValueError(f'unsupported conv for pallas kernel: k={k} s={stride}')
    h_out = (h + 2 * p - k) // stride + 1
    w_out = (w + 2 * p - k) // stride + 1

    # pad Cout up to the tile; zero channels are sliced off below
    tile_co = min(cout, TILE_CO_MAX)
    co_pad = -cout % tile_co
    if co_pad:
        w8 = jnp.pad(w8, ((0, 0),) * 3 + ((0, co_pad),))
        bias = jnp.pad(bias, (0, co_pad))
    cout_p = cout + co_pad

    tile_h = _pick_tile_h(h_out, w_out, tile_co)
    rows_alloc = stride * tile_h + k - 1
    # spatial zero-pad; the extra (stride-1) tail keeps every kernel window
    # slice in bounds (the decimation reshape reads, then discards, it)
    xp = jnp.pad(x8, ((0, 0), (p, p + stride - 1), (p, p + stride - 1),
                      (0, 0)))
    w_alloc = xp.shape[2]

    n_hb = h_out // tile_h
    n_cob = cout_p // tile_co
    qmin, qmax = -(2 ** (bits - 1)), 2 ** (bits - 1) - 1
    out_dtype = jnp.int8 if out_q else jnp.float32

    kern = functools.partial(
        _kernel, k=k, s=stride, tile_h=tile_h, w_out=w_out, cin=cin,
        tile_co=tile_co, rows_alloc=rows_alloc, n_chunks=n * n_hb, act=act,
        maxabs=maxabs, out_q=out_q, qmin=qmin, qmax=qmax, out_dtype=out_dtype)

    scale2 = jnp.asarray(scale, jnp.float32).reshape(1, 1)
    oinv2 = (jnp.float32(1.0)
             / jnp.asarray(out_scale, jnp.float32)).reshape(1, 1)

    out = pl.pallas_call(
        kern,
        grid=(n, n_hb, n_cob),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda b, i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((k, k, cin, tile_co), lambda b, i, j: (0, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_co), lambda b, i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w_out, tile_co),
                               lambda b, i, j: (b, i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h_out, w_out, cout_p), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows_alloc, w_alloc, cin), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(scale2, oinv2, xp, w8, bias.astype(jnp.float32).reshape(1, -1))
    if co_pad:
        out = out[..., :cout]
    return out
