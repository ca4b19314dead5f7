"""Darknet ``.weights`` binary interchange (bit-compatible with the reference).

File format (reference models.py:587-813): 5-int header (3x int32 version,
1x int64 seen) followed by float32 params in layer order. Per layer:

  conv+bn:    bn_beta, bn_gamma, bn_running_mean, bn_running_var, conv_w(OIHW)
  conv nobn:  conv_bias, conv_w(OIHW)
  depthwise:  same as conv (groups implicit)
  se:         fc1.weight (out,in), fc2.weight (out,in)

``quant=True`` is accepted for API parity with the reference loader
(models.py:610-628), where it redirects BN rows into the folded quantized
conv's own buffers. The byte order is identical and our pytree layout is
the same for float and quantized models, so the flag is a no-op here.

Kernels are transposed OIHW <-> HWIO at the boundary; everything else is a
straight memcpy, so round-trips are bit-exact.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..ir import NetworkIR

HEADER_VERSION = np.array([0, 2, 5], dtype=np.int32)


def _take(weights: np.ndarray, ptr: int, n: int, shape) -> tuple[np.ndarray, int]:
    arr = weights[ptr:ptr + n].reshape(shape)
    return arr, ptr + n


def load_darknet_weights(net: NetworkIR, params, state, path,
                         cutoff: int = -1, pt: bool = False,
                         quant: bool = False):
    """Read a .weights file into (params, state) pytrees.

    Returns (params, state, version, seen). ``cutoff`` loads layers [0, cutoff);
    auto-set for the standard backbone files (models.py:590-595). ``pt`` skips
    255-channel COCO heads (models.py:655-661).
    """
    file = Path(path).name
    if file == 'darknet53.conv.74':
        cutoff = 75
    elif file == 'yolov3-tiny.conv.15':
        cutoff = 15

    with open(path, 'rb') as f:
        version = np.fromfile(f, dtype=np.int32, count=3)
        seen = np.fromfile(f, dtype=np.int64, count=1)
        weights = np.fromfile(f, dtype=np.float32)

    params = {k: dict(v) for k, v in params.items()}
    state = {k: dict(v) for k, v in state.items()}
    layers = net.layers if cutoff == -1 else net.layers[:cutoff]
    ptr = 0
    for lyr in layers:
        k = str(lyr.index)
        if lyr.kind in ('conv', 'depthwise'):
            O = lyr.filters
            I = lyr.in_channels // lyr.groups
            kh = kw = lyr.size
            if lyr.bn:
                beta, ptr = _take(weights, ptr, O, (O,))
                gamma, ptr = _take(weights, ptr, O, (O,))
                mean, ptr = _take(weights, ptr, O, (O,))
                var, ptr = _take(weights, ptr, O, (O,))
                # The reference's quant=True path only redirects WHERE the BN
                # rows are stored (the folded conv's own buffers instead of a
                # separate BN module, models.py:608-635) — the file layout is
                # identical. Our pytrees have one layout for float and
                # quantized models (gamma/beta in params, running stats in
                # state, read by make_quant_apply's _bn_fold), so both paths
                # store identically; ``quant`` is kept for API parity.
                params[k]['beta'] = jnp.asarray(beta)
                params[k]['gamma'] = jnp.asarray(gamma)
                state[k]['mean'] = jnp.asarray(mean)
                state[k]['var'] = jnp.asarray(var)
                w, ptr = _take(weights, ptr, O * I * kh * kw, (O, I, kh, kw))
                params[k]['w'] = jnp.asarray(w.transpose(2, 3, 1, 0))
            else:
                if pt and os.path.basename(str(path)).split('.')[-1] == 'weights':
                    # skip pretrained 255-channel COCO heads regardless of this
                    # model's own head width (reference models.py:655-661)
                    ptr += 255
                    ptr += I * 255 * kh * kw
                else:
                    b, ptr = _take(weights, ptr, O, (O,))
                    params[k]['b'] = jnp.asarray(b)
                    w, ptr = _take(weights, ptr, O * I * kh * kw, (O, I, kh, kw))
                    params[k]['w'] = jnp.asarray(w.transpose(2, 3, 1, 0))
        elif lyr.kind == 'se':
            c, r = lyr.filters, lyr.reduction
            fc1, ptr = _take(weights, ptr, (c // r) * c, (c // r, c))
            fc2, ptr = _take(weights, ptr, c * (c // r), (c, c // r))
            params[k]['fc1'] = jnp.asarray(fc1)
            params[k]['fc2'] = jnp.asarray(fc2)

    if cutoff == -1 and not pt:
        assert ptr == len(weights), \
            f'weight file not fully consumed: {ptr} != {len(weights)}'
    return params, state, version, seen


def save_darknet_weights(net: NetworkIR, params, state, path,
                         cutoff: int = -1, version=None, seen=None):
    """Write (params, state) to darknet .weights format (models.py:738-782)."""
    version = HEADER_VERSION if version is None else np.asarray(version, np.int32)
    seen = np.array([0], np.int64) if seen is None else np.asarray(seen, np.int64)
    layers = net.layers if cutoff == -1 else net.layers[:cutoff]
    with open(path, 'wb') as f:
        version.tofile(f)
        seen.tofile(f)
        for lyr in layers:
            k = str(lyr.index)
            if lyr.kind in ('conv', 'depthwise'):
                p = params[k]
                if lyr.bn:
                    np.asarray(p['beta'], np.float32).tofile(f)
                    np.asarray(p['gamma'], np.float32).tofile(f)
                    st = state.get(k, p)  # folded-quant keeps stats in params
                    np.asarray(st['mean'], np.float32).tofile(f)
                    np.asarray(st['var'], np.float32).tofile(f)
                else:
                    np.asarray(p['b'], np.float32).tofile(f)
                w = np.asarray(p['w'], np.float32).transpose(3, 2, 0, 1)  # HWIO->OIHW
                w.tofile(f)
            elif lyr.kind == 'se':
                p = params[k]
                np.asarray(p['fc1'], np.float32).tofile(f)
                np.asarray(p['fc2'], np.float32).tofile(f)
