"""Pallas fused int8 conv kernel parity vs lax reference (interpret mode).

The kernel must reproduce the int8 engine's conv semantics bit-exactly:
s8xs8->s32 conv, f32 scale+bias epilogue, activation, round-half-away
saturating requantization (reference: utils/quantized/quantized_google.py
BNFold_QuantizedConv2d forward, via compress/quant.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import lax

from yolo_tpu.ops import activations as act_mod
from yolo_tpu.ops.pallas_conv import fused_conv_int8, supported


def _ref(x8, w8, bias, scale, out_scale, stride, act, out_q):
    p = w8.shape[0] // 2
    y = lax.conv_general_dilated(x8, w8, (stride, stride), [(p, p)] * 2,
                                 dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                                 preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * scale + bias
    y = act_mod.get(act, False)(y)
    if out_q:
        q = jnp.clip(jnp.sign(y) * jnp.floor(jnp.abs(y) / out_scale + 0.5),
                     -128, 127)
        return q.astype(jnp.int8)
    return y


CASES = [
    # N, H, W, Cin, Cout, K, stride, act, out_q
    (2, 16, 16, 32, 64, 3, 1, 'leaky', True),
    (2, 16, 16, 32, 64, 3, 2, 'leaky', True),
    (2, 19, 19, 64, 255, 1, 1, 'linear', False),   # head conv: f32 out, Cout pad
    (1, 13, 13, 128, 256, 3, 2, 'leaky', True),    # odd H, stride 2
    (2, 8, 8, 16, 48, 1, 1, 'relu', True),
    (1, 38, 38, 96, 160, 3, 1, 'mish', True),
]


@pytest.mark.parametrize('case', CASES, ids=lambda c: f'{c[5]}x{c[5]}s{c[6]}'
                         f'_{c[3]}to{c[4]}_{c[7]}')
def test_parity(case):
    n, h, w, ci, co, k, s, act, out_q = case
    rng = np.random.RandomState(0)
    x8 = jnp.asarray(rng.randint(-128, 128, (n, h, w, ci)), jnp.int8)
    w8 = jnp.asarray(rng.randint(-40, 41, (k, k, ci, co)), jnp.int8)
    bias = jnp.asarray(rng.randn(co).astype(np.float32))
    scale, oscale = np.float32(2 ** -9), np.float32(2 ** -4)
    got = np.asarray(fused_conv_int8(x8, w8, bias, scale, oscale, stride=s,
                                     act=act, out_q=out_q, interpret=True))
    want = np.asarray(_ref(x8, w8, bias, scale, oscale, s, act, out_q))
    assert got.shape == want.shape
    if out_q:
        np.testing.assert_array_equal(got, want)
    else:
        np.testing.assert_allclose(got, want, atol=1e-3)


FOLD_CASES = [
    # fold='full' engages only for K>1 with 128-aligned effective Cin
    (2, 16, 16, 128, 64, 3, 1, 'leaky', True),     # direct 128-ch
    (2, 16, 16, 32, 64, 3, 2, 'leaky', True),      # via space-to-depth 4*32
    (1, 19, 19, 256, 255, 3, 1, 'linear', False),  # f32 out, Cout pad
]


@pytest.mark.parametrize('case', FOLD_CASES, ids=lambda c: f'{c[5]}x{c[5]}s'
                         f'{c[6]}_{c[3]}to{c[4]}_{c[7]}')
def test_parity_fold_full(case):
    """The im2col-fold variant (one deep K*K*Cin dot via a VMEM scratch)
    must match the tap-sum path bit for bit. It is a measured negative
    result perf-wise (see module docstring) but stays parity-locked."""
    n, h, w, ci, co, k, s, act, out_q = case
    rng = np.random.RandomState(1)
    x8 = jnp.asarray(rng.randint(-128, 128, (n, h, w, ci)), jnp.int8)
    w8 = jnp.asarray(rng.randint(-40, 41, (k, k, ci, co)), jnp.int8)
    bias = jnp.asarray(rng.randn(co).astype(np.float32))
    scale, oscale = np.float32(2 ** -9), np.float32(2 ** -4)
    got = np.asarray(fused_conv_int8(x8, w8, bias, scale, oscale, stride=s,
                                     act=act, out_q=out_q, interpret=True,
                                     fold='full'))
    want = np.asarray(_ref(x8, w8, bias, scale, oscale, s, act, out_q))
    assert got.shape == want.shape
    if out_q:
        np.testing.assert_array_equal(got, want)
    else:
        np.testing.assert_allclose(got, want, atol=1e-3)


@pytest.mark.parametrize('case', FOLD_CASES, ids=lambda c: f'{c[5]}x{c[5]}s'
                         f'{c[6]}_{c[3]}to{c[4]}_{c[7]}')
def test_parity_fold_kx(case):
    """The kx-fold variant (k scratch stores, k dots at k*Cin contraction
    depth) must match the tap-sum path bit for bit."""
    n, h, w, ci, co, k, s, act, out_q = case
    rng = np.random.RandomState(2)
    x8 = jnp.asarray(rng.randint(-128, 128, (n, h, w, ci)), jnp.int8)
    w8 = jnp.asarray(rng.randint(-40, 41, (k, k, ci, co)), jnp.int8)
    bias = jnp.asarray(rng.randn(co).astype(np.float32))
    scale, oscale = np.float32(2 ** -9), np.float32(2 ** -4)
    got = np.asarray(fused_conv_int8(x8, w8, bias, scale, oscale, stride=s,
                                     act=act, out_q=out_q, interpret=True,
                                     fold='kx'))
    want = np.asarray(_ref(x8, w8, bias, scale, oscale, s, act, out_q))
    assert got.shape == want.shape
    if out_q:
        np.testing.assert_array_equal(got, want)
    else:
        np.testing.assert_allclose(got, want, atol=1e-3)


@pytest.mark.parametrize('tco', [256, 512])
def test_parity_wide_tile_co(tco):
    """tile_co wider than the 128 default (whole-Cout weight residency for
    the deep low-resolution shapes) is bit-identical to the tiled path."""
    rng = np.random.RandomState(3)
    n, h, w, ci, co = 1, 10, 10, 128, 512
    x8 = jnp.asarray(rng.randint(-128, 128, (n, h, w, ci)), jnp.int8)
    w8 = jnp.asarray(rng.randint(-40, 41, (3, 3, ci, co)), jnp.int8)
    bias = jnp.asarray(rng.randn(co).astype(np.float32))
    scale, oscale = np.float32(2 ** -9), np.float32(2 ** -4)
    got = np.asarray(fused_conv_int8(x8, w8, bias, scale, oscale, stride=1,
                                     act='leaky', interpret=True,
                                     tile_co=tco))
    want = np.asarray(_ref(x8, w8, bias, scale, oscale, 1, 'leaky', True))
    np.testing.assert_array_equal(got, want)


def test_supported_predicate():
    assert supported(3, 1, 1, 1) and supported(3, 2, 1, 1)
    assert supported(1, 1, 0, 1)
    assert not supported(3, 1, 1, 2)     # grouped
    assert not supported(5, 1, 2, 1)     # 5x5
    assert not supported(1, 2, 0, 1)     # 1x1 stride 2
    assert not supported(3, 1, 0, 1)     # valid padding
