"""Fused int8 conv Pallas kernel: s8 x s8 -> s32 MXU conv + epilogue.

Historically XLA's TPU backend assigned batch-minor layouts to s8
activations in the composed engine program and inserted ~20 ms relayout
copies per early layer; this kernel owns the whole quantized conv — int8
NHWC in, int8 NHWC out, epilogue fused — so activations flow between
layers in plain row-major int8 HBM buffers and XLA's layout assignment
never sees an s8 conv at all. After the heads_only/sparse-NMS rework that
pathology no longer composes into the graph and the engine's measured-best
backends are 'mixed'/'xla' (see models/int8_engine.py make_int8_apply);
the kernel remains the parity-tested, layout-controlled alternative.

Reference semantics (what the epilogue must reproduce): the reference's
quantized conv dequantizes the s32 accumulator with the input*weight scale,
adds the (dequantized) bias, applies the activation, and requantizes to the
layer's activation scale — utils/quantized/quantized_google.py
(BNFold_QuantizedConv2d forward) via compress/quant.py. Rounding is
round-half-away-from-zero, saturating to [-2^{b-1}, 2^{b-1}-1].

Design (one pallas_call per conv layer):
  - Everything is lowered to a stride-1 VALID conv: sum over the K*K taps
    of a (tile_h, W_T, Cin) x (Cin, TILE_CO) int8 matmul with s32
    accumulation, each tap reading a shifted window of the input row slab
    in VMEM.
  - Stride-2 convs are rewritten as stride-1 2x2 convs over a
    space-to-depth input (4*Cin phase channels, weights rearranged to
    match) — both transforms are cheap XLA int8 copies done in the
    wrapper. This also quadruples the MXU contraction depth for the
    shallow early layers.
  - The wrapper zero-pads x spatially; the kernel reads it zero-copy
    through halo-row BlockSpec operands — the main operand carries tile_h
    rows per grid step and each of the (K - 1) halo rows rides its own
    single-row BlockSpec whose index map overlaps the next block, so
    Mosaic's pipelining streams overlapping windows HBM->VMEM with
    automatic double buffering and no gathered slab copy (the earlier
    slab-gather design this replaced cost an extra (K-1)/tile_h HBM pass).
  - grid = (N * n_row_blocks, Cout / TILE_CO); weights/bias/scales ride
    BlockSpec pipelining over the Cout grid dim; the output index map
    scatters row blocks back into the (N, H_out, W_T, Cout) result, whose
    W_T / Cout padding is sliced off in XLA.

Mosaic constraints probed on v5e (2026-08), which shape this design:
  - manual ANY->VMEM DMA under a grid crashes the compiler -> BlockSpec
    pipelining (today: the halo-row operands above) instead;
  - int8 dot operands with an odd second-minor (sublane) dim and a
    contraction (lane) dim < 128 crash the compiler -> W_T is padded to a
    multiple of 8 and the kernel computes/stores the padded width;
  - the reshape-based column decimation for strided windows crashes the
    compiler for int8 regardless of alignment -> space-to-depth instead.

Supported: groups == 1, kernel 1x1 (stride 1) and 3x3 (stride 1 or 2),
'same' padding (pad = K // 2) — exactly the conv population of the
yolov3/yolov4 families. Anything else falls back to the lax path in the
engine.

fold='full' (opt-in, default 'none'): im2col the K*K tap windows into the
lane (contraction) dim via a VMEM scratch, then ONE deep K*K*Cin dot
instead of K*K shallow dots. Measured on v5e (2026-08, prof_pallas_ops):
isolated int8 MXU efficiency does rise with contraction depth (47% at
256-deep -> 79% at 1024-deep), but the scratch *stores* for the shifted
windows cost more than the shallow dots save — fold='full' is net slower
at every yolov3 shape, so it stays a parity-tested negative result, not a
backend.

fold='kx' and tile_co (opt-in, r4): the two levers between 'none' and
'full' — fold only the kx taps (k scratch stores, k dots at k*Cin
contraction) and widen the Cout tile to whole-Cout weight residency.
Measured on v5e (2026-08-19, PERFORMANCE.md §SoL #7): both lose to XLA's
s8 emitter on every deep yolov3 shape (38px 3x3: 3.06-3.71 ms across
variants vs 2.53 XLA); the kx fold's deeper dots never pay for their
sublane-shifted stores. Parity-locked negatives, like 'full'.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import activations as act_mod

TILE_CO_MAX = 128
VMEM_BUDGET_BYTES = 10 * 1024 * 1024  # of the 16 MiB scoped-vmem limit


def _round_half_away(x):
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _vmem_est(d: int, w_t: int, tile_co: int, cin: int, w_alloc: int,
              k: int, fold: str = 'none') -> int:
    """Estimate the kernel's VMEM stack for a tile_h of ``d``, in padded
    (lane 128 / sublane 8 f32, 32 int8) tile units: pipelined input slabs
    (x2) plus the in-kernel halo concat, two output buffers, the s32
    accumulator, and ~two tap-window temporaries (the im2col concat for the
    fold variants; 'kx' im2cols all d+k-1 rows once)."""
    co_p = _round_up(tile_co, 128)
    cin_p = _round_up(cin, 128)
    n_win = {'full': k * k, 'kx': k}.get(fold, 1)
    d_win = d + k - 1 if fold == 'kx' else d
    slab = (d + k - 1) * _round_up(w_alloc, 32) * cin_p           # int8
    out = d * _round_up(w_t, 32) * co_p                           # int8
    acc = d * _round_up(w_t, 8) * co_p * 4                        # s32
    win = d_win * _round_up(w_t, 32) * _round_up(n_win * cin, 128)  # int8
    return 3 * slab + 2 * out + acc + 2 * win


def _pick_tile_h(h_out: int, w_t: int, tile_co: int, cin: int,
                 w_alloc: int, k: int, fold: str = 'none') -> int:
    """Largest divisor of h_out whose estimated VMEM stack fits the budget."""
    best = 1
    for d in range(1, h_out + 1):
        if (h_out % d == 0
                and _vmem_est(d, w_t, tile_co, cin, w_alloc, k, fold)
                <= VMEM_BUDGET_BYTES):
            best = d
    return best


def supported(k: int, stride: int, pad: int, groups: int) -> bool:
    return (groups == 1 and pad == k // 2
            and ((k == 1 and stride == 1) or (k == 3 and stride in (1, 2))))


def _kernel(scale_ref, oinv_ref, x_ref, *rest, k: int, tile_h: int,
            w_t: int, cin: int, tile_co: int, n_halo: int, act: str,
            maxabs: bool, out_q: bool, qmin: int, qmax: int, out_dtype,
            fold: str = 'none'):
    halo = rest[:n_halo]            # n_halo x (1, 1, w_alloc, cin) row blocks
    if fold in ('full', 'kx') and k > 1:
        w_ref, b_ref, o_ref, im_ref = rest[n_halo:n_halo + 4]
    else:
        w_ref, b_ref, o_ref = rest[n_halo:n_halo + 3]
    if n_halo:
        xv = jnp.concatenate([x_ref[0]] + [h[0] for h in halo], axis=0)
    else:
        xv = x_ref[0]                              # (tile_h+k-1, w_alloc, cin)
    if fold == 'kx' and k > 1:
        # fold only the kx taps into the lane (contraction) dim: k scratch
        # stores over all tile_h+k-1 rows (vs full's k*k over tile_h), then
        # k dots at k*Cin contraction depth — the middle point between the
        # k*k shallow dots (fold='none') and the one k*k*Cin dot whose
        # scratch stores were measured net-negative (fold='full').
        for kx in range(k):
            im_ref[:, :, kx * cin:(kx + 1) * cin] = xv[:, kx:kx + w_t]
        acc = jnp.zeros((tile_h, w_t, tile_co), jnp.int32)
        for ky in range(k):
            acc = acc + jax.lax.dot_general(
                im_ref[ky:ky + tile_h],
                w_ref[ky].reshape(k * cin, tile_co),
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    elif fold == 'full' and k > 1:
        # im2col the K*K window stack into the lane (contraction) dim via a
        # VMEM scratch (a direct lane concat of sublane-shifted windows is
        # unsupported: "offset mismatch on non-concat dimension"), then ONE
        # deep dot — K*K*Cin contraction instead of K*K shallow 128-ish
        # dots. Measured on v5e: int8 MXU efficiency tracks contraction
        # depth (47% at 256, 79% at 1024), so the fold is what unlocks the
        # 2x int8 rate on KxK convs.
        for ky in range(k):
            rows = xv[ky:ky + tile_h]
            for kx in range(k):
                j = (ky * k + kx) * cin
                im_ref[:, :, j:j + cin] = rows[:, kx:kx + w_t]
        acc = jax.lax.dot_general(
            im_ref[...], w_ref[...].reshape(k * k * cin, tile_co),
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    else:
        acc = jnp.zeros((tile_h, w_t, tile_co), jnp.int32)
        for ky in range(k):
            rows = xv[ky:ky + tile_h]
            for kx in range(k):
                win = rows[:, kx:kx + w_t]
                acc = acc + jax.lax.dot_general(
                    win, w_ref[ky, kx], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)

    y = acc.astype(jnp.float32) * scale_ref[0, 0] + b_ref[0]
    y = act_mod.get(act, maxabs)(y)
    if out_q:
        q = jnp.clip(_round_half_away(y * oinv_ref[0, 0]), qmin, qmax)
        o_ref[0] = q.astype(jnp.int8)
    else:
        o_ref[0] = y.astype(out_dtype)


def _space_to_depth_conv(x8, w8):
    """Rewrite a 3x3 stride-2 'same' conv as a 2x2 stride-1 VALID conv:
    x -> space-to-depth phase channels (py, px, c); the 3x3 kernel, zero-
    padded to 4x4, splits into 2x2 taps over those phases."""
    n, h, w, cin = x8.shape
    _, _, _, cout = w8.shape
    h_out, w_out = (h - 1) // 2 + 1, (w - 1) // 2 + 1
    hp, wp = 2 * (h_out + 1), 2 * (w_out + 1)
    xp = jnp.pad(x8, ((0, 0), (1, hp - h - 1), (1, wp - w - 1), (0, 0)))
    x2 = (xp.reshape(n, hp // 2, 2, wp // 2, 2, cin)
          .transpose(0, 1, 3, 2, 4, 5)
          .reshape(n, hp // 2, wp // 2, 4 * cin))
    w4 = jnp.zeros((2, 2, 4 * cin, cout), w8.dtype)
    for ky2 in range(2):
        for kx2 in range(2):
            for py in range(2):
                for px in range(2):
                    ky, kx = 2 * ky2 + py, 2 * kx2 + px
                    if ky < 3 and kx < 3:
                        c0 = (py * 2 + px) * cin
                        w4 = w4.at[ky2, kx2, c0:c0 + cin].set(w8[ky, kx])
    return x2, w4, h_out, w_out


@functools.partial(
    jax.jit, static_argnames=('stride', 'act', 'maxabs', 'out_q', 'bits',
                              'interpret', 'fold', 'tile_co'))
def fused_conv_int8(x8, w8, bias, scale, out_scale, *, stride: int,
                    act: str = 'leaky', maxabs: bool = False,
                    out_q: bool = True, bits: int = 8,
                    interpret: bool = False, fold: str = 'none',
                    tile_co: int | None = None):
    """Quantized conv: int8 NHWC x int8 HWIO -> int8 (or f32) NHWC.

    y = act(conv_s32(x8, w8) * scale + bias); out_q: requantize to
    ``out_scale`` (round half away, saturate to the ``bits`` range).

    scale / out_scale are scalar (per-tensor) f32; bias is f32[Cout].

    ``tile_co``: output-channel tile width (default TILE_CO_MAX=128).
    Wider tiles mean fewer weight reloads and a wider MXU N dim per dot —
    worth trying on the deep low-resolution shapes whose whole row slab
    fits VMEM at tile_co=Cout.
    """
    n, h, w, cin = x8.shape
    k, _, _, cout = w8.shape
    p = k // 2
    if not supported(k, stride, p, 1):
        raise ValueError(f'unsupported conv for pallas kernel: k={k} s={stride}')

    # normalise to a stride-1 VALID conv on x_eff / w_eff
    if stride == 2:
        x_eff, w_eff, h_out, w_out = _space_to_depth_conv(x8, w8)
        k_eff, cin_eff = 2, 4 * cin
    else:
        h_out = (h + 2 * p - k) // stride + 1
        w_out = (w + 2 * p - k) // stride + 1
        x_eff = jnp.pad(x8, ((0, 0), (p, p), (p, p), (0, 0))) if p else x8
        w_eff, k_eff, cin_eff = w8, k, cin

    # pad Cout up to the tile; zero channels are sliced off below
    tile_co = min(cout, tile_co if tile_co else TILE_CO_MAX)
    co_pad = -cout % tile_co
    if co_pad:
        w_eff = jnp.pad(w_eff, ((0, 0),) * 3 + ((0, co_pad),))
        bias = jnp.pad(bias, (0, co_pad))
    cout_p = cout + co_pad

    # compute width padded to a sublane multiple (odd-width int8 dot
    # operands crash Mosaic); the extra columns are sliced off below
    w_t = _round_up(w_out, 8)
    w_alloc = max(x_eff.shape[2], w_t + k_eff - 1)
    if w_alloc > x_eff.shape[2]:
        x_eff = jnp.pad(x_eff, ((0, 0), (0, 0),
                                (0, w_alloc - x_eff.shape[2]), (0, 0)))

    if fold not in ('none', 'full', 'kx'):
        raise ValueError(f'unknown fold mode {fold!r}')
    if k_eff == 1 or cin_eff % 128:
        # 1x1 is already one deep dot; misaligned Cin would make the im2col
        # scratch stores lane-misaligned (unsupported/slow in Mosaic)
        fold = 'none'
    tile_h = _pick_tile_h(h_out, w_t, tile_co, cin_eff, w_alloc, k_eff, fold)
    rows = tile_h + k_eff - 1
    n_hb = h_out // tile_h

    # Row blocking reads x directly through BlockSpecs — no gather copy.
    # The main block carries tile_h rows; each of the (k-1) halo rows is a
    # separate single-row operand of the SAME array whose index map points
    # just past the main block. x must hold n_hb*tile_h + k - 1 rows.
    need_h = n_hb * tile_h + k_eff - 1
    if x_eff.shape[1] < need_h:
        x_eff = jnp.pad(x_eff, ((0, 0), (0, need_h - x_eff.shape[1]),
                                (0, 0), (0, 0)))
    n_halo = 0 if n_hb == 1 else k_eff - 1

    n_cob = cout_p // tile_co
    qmin, qmax = -(2 ** (bits - 1)), 2 ** (bits - 1) - 1
    out_dtype = jnp.int8 if out_q else jnp.float32

    kern = functools.partial(
        _kernel, k=k_eff, tile_h=tile_h, w_t=w_t, cin=cin_eff,
        tile_co=tile_co, n_halo=n_halo, act=act, maxabs=maxabs, out_q=out_q,
        qmin=qmin, qmax=qmax, out_dtype=out_dtype, fold=fold)

    scale2 = jnp.asarray(scale, jnp.float32).reshape(1, 1)
    oinv2 = (jnp.float32(1.0)
             / jnp.asarray(out_scale, jnp.float32)).reshape(1, 1)

    if n_hb == 1:
        x_specs = [pl.BlockSpec((1, rows, w_alloc, cin_eff),
                                lambda i, j: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)]
        x_args = [x_eff[:, :rows]]
    else:
        x_specs = [pl.BlockSpec(
            (1, tile_h, w_alloc, cin_eff),
            lambda i, j: (i // n_hb, i % n_hb, 0, 0),
            memory_space=pltpu.VMEM)]
        x_specs += [
            pl.BlockSpec((1, 1, w_alloc, cin_eff),
                         functools.partial(
                             lambda i, j, r: (i // n_hb,
                                              (i % n_hb + 1) * tile_h + r,
                                              0, 0), r=r),
                         memory_space=pltpu.VMEM)
            for r in range(n_halo)]
        x_args = [x_eff] * (1 + n_halo)

    out = pl.pallas_call(
        kern,
        grid=(n * n_hb, n_cob),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            *x_specs,
            pl.BlockSpec((k_eff, k_eff, cin_eff, tile_co),
                         lambda i, j: (0, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_co), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, w_t, tile_co),
            lambda i, j: (i // n_hb, i % n_hb, 0, j),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h_out, w_t, cout_p), out_dtype),
        scratch_shapes=(
            [pltpu.VMEM((tile_h, w_t, k_eff * k_eff * cin_eff), jnp.int8)]
            if fold == 'full' and k_eff > 1 else
            [pltpu.VMEM((tile_h + k_eff - 1, w_t, k_eff * cin_eff),
                        jnp.int8)]
            if fold == 'kx' and k_eff > 1 else []),
        interpret=interpret,
    )(scale2, oinv2, *x_args, w_eff,
      bias.astype(jnp.float32).reshape(1, -1))
    if co_pad or w_t != w_out:
        out = out[:, :, :w_out, :cout]
    return out
