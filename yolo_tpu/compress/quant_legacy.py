"""Legacy quantizer family kept for parity with the reference's unreferenced
modules: DoReFa (utils/quantized/quantized_dorefa.py), plain min/max PTQ
(quantized_ptq.py) and 1-bit/ternary experiments (quantized_lowbit.py).

The reference defines these but models.py never imports them (SURVEY.md §2.5
'legacy' rows); they are exposed here as pure fake-quant functions usable as
drop-in ``w_quant``/``a_quant`` transforms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quant import fq, pow2_snap, round_half_away


def _ste_round(x):
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def quantize_k(x, k: int):
    """Uniform k-bit quantization of x in [0, 1] with STE
    (DoReFa quantize_k)."""
    n = float((1 << k) - 1)
    return _ste_round(x * n) / n


def dorefa_weight(w, bits: int):
    """DoReFa-Net weight quantization (quantized_dorefa.py:97-111):
    tanh-normalise to [0, 1], k-bit quantize, map back to [-1, 1]. 1-bit
    is rejected, as in the reference (:99-102 asserts); use binary_weight/
    bwn_weight (the quantized_lowbit.py family) for 1-bit weights."""
    if bits == 32:
        return w
    if bits == 1:
        raise ValueError('DoReFa 1-bit weights are unsupported (reference '
                         'quantized_dorefa.py:99-102 asserts); use the '
                         "'wbin' scheme instead")
    t = jnp.tanh(w)
    t = t / (2.0 * jnp.max(jnp.abs(t)) + 1e-12) + 0.5
    return 2.0 * quantize_k(t, bits) - 1.0


def dorefa_activation(x, bits: int):
    """DoReFa activation (quantized_dorefa.py:54-67): pre-scale by 0.1 to
    shrink clipping error, clip to [0, 1], k-bit quantize. The reference
    never undoes the 0.1 — the quantized activation IS 0.1x the float one;
    bit-faithful parity keeps that. 1-bit activations are rejected there
    (:58-60) and here."""
    if bits == 32:
        return x
    if bits == 1:
        raise ValueError('DoReFa 1-bit activations are unsupported '
                         '(reference quantized_dorefa.py:58-60 asserts)')
    return quantize_k(jnp.clip(x * 0.1, 0.0, 1.0), bits)


def binary_weight(w):
    """BinaryConv2d: sign with STE (quantized_lowbit.py)."""
    return jax.lax.stop_gradient(jnp.sign(w) - w) + w


def bwn_weight(w):
    """Binary-Weight-Network: sign(w) * mean(|w|) per tensor."""
    alpha = jnp.mean(jnp.abs(w))
    return jax.lax.stop_gradient(jnp.sign(w) * alpha - w) + w


def ternary_weight(w, thresh_factor: float = 0.7):
    """Ternarize to {-a, 0, +a} with delta = factor * mean|w|
    (quantized_lowbit.py Ternarize)."""
    delta = thresh_factor * jnp.mean(jnp.abs(w))
    mask_pos = w > delta
    mask_neg = w < -delta
    nz = mask_pos | mask_neg
    alpha = jnp.sum(jnp.abs(w) * nz) / jnp.maximum(jnp.sum(nz), 1)
    t = alpha * (mask_pos.astype(w.dtype) - mask_neg.astype(w.dtype))
    return jax.lax.stop_gradient(t - w) + w


def minmax_ptq_scale(x, bits: int, sym: bool = True, pow2: bool = False):
    """Plain min/max calibration (quantized_ptq.py): scale from observed
    range, optional pow-2 snap. Returns (scale, zero_point)."""
    qmax = (1 << (bits - 1)) - 1 if sym else (1 << bits) - 1
    if sym:
        r = jnp.maximum(jnp.abs(jnp.min(x)), jnp.abs(jnp.max(x)))
        r = pow2_snap(r) if pow2 else r
        return r / qmax, jnp.zeros(())
    r = jnp.max(x) - jnp.min(x)
    r = pow2_snap(r) if pow2 else r
    scale = r / qmax
    zp = round_half_away(qmax - jnp.max(x) / scale)
    return scale, zp


def minmax_ptq(x, bits: int, sym: bool = True, pow2: bool = False):
    scale, zp = minmax_ptq_scale(jax.lax.stop_gradient(x), bits, sym, pow2)
    return fq(x, scale, zp, bits, sym)
