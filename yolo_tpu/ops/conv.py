"""Core spatial ops lowered for TPU: conv, batch-norm, pooling, upsample, SE.

Layout contract: activations NHWC, kernels HWIO. Convolutions run on the MXU
in bfloat16 with float32 accumulation (``preferred_element_type``); everything
element-wise rides the VPU and is fused by XLA into the conv epilogue.

Reference semantics: models.py:92-113 (conv+bn+act), :176-197 (depthwise),
:199-222 (standalone BN / SE), :207-215 (maxpool incl. tiny zero-pad case),
:224-225 (nearest upsample), utils/layers.py:176-192 (SE block).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax

DIMNUMS = ('NHWC', 'HWIO', 'NHWC')


def conv2d(x, w, *, stride=1, padding: int = 0, groups: int = 1,
           compute_dtype=jnp.bfloat16):
    """Grouped 2-D convolution. ``w`` is HWIO with I = in_channels // groups.

    MXU path: inputs cast to ``compute_dtype`` (bf16 by default), accumulation
    forced to float32 via preferred_element_type. ``stride`` may be an int or
    an (sy, sx) pair.
    """
    orig_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    strides = (stride, stride) if isinstance(stride, int) else tuple(stride)
    # NOTE on dtypes: with bf16 operands the TPU MXU accumulates in f32 in
    # hardware; forcing preferred_element_type=f32 here would make the conv
    # VJP transpose see an f32 cotangent against bf16 weights (dtype-mismatch
    # error), so the op runs in the compute dtype end-to-end and the result
    # is upcast outside.
    out = lax.conv_general_dilated(
        x, w,
        window_strides=strides,
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=DIMNUMS,
        feature_group_count=groups,
        preferred_element_type=None if compute_dtype is not None else jnp.float32,
    )
    return out.astype(orig_dtype)


def conv2d_s2d_stride2(x, w, *, compute_dtype=jnp.bfloat16):
    """3x3 stride-2 pad-1 conv rewritten as a 2x2 stride-1 conv over the
    space-to-depth input — numerics-identical (same multiply-adds, scattered
    weights), differentiable end-to-end.

    Why: at 608px the stride-2 stem convs are HBM-bound and XLA assigns
    batch-minor layouts to their backward ops (PERFORMANCE.md train trail
    #3); the rewrite presents XLA dense stride-1 shapes with 4x the
    contraction depth at the cost of +78% stem FLOPs (16*Cin vs 9*Cin
    MACs/output — the zero quarter of the 2x2x4Cin kernel is still
    multiplied). The int8 Pallas kernel uses the same transform for strided
    windows (ops/pallas_conv.py).

    Derivation (per spatial dim, pad 1): out[i] reads x[2i-1], x[2i],
    x[2i+1]; with phases P0[a]=x[2a], P1[a]=x[2a+1] that is P1[i-1],
    P0[i], P1[i] — a 2-tap stride-1 conv over blocks with block-pad (1,0)
    whose tap-0 weight on P0 is zero. Zero-padding the 3x3 kernel to 4x4
    at the front and splitting each spatial dim into (block, phase) places
    every original tap: d+1 = 2*b + p.

    ``w`` is the canonical HWIO (3,3,Cin,Cout) parameter — rearrangement
    happens inside the jitted program (a trivial transform of the small
    weight), so checkpoints, optimizer state and gradients stay canonical.
    Requires even spatial dims (darknet sizes are multiples of 32).
    """
    n, h, ww, c = x.shape
    cout = w.shape[-1]
    orig_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    # weights: (3,3,Cin,Cout) -> front-pad to (4,4) -> (bi,pi,bj,pj,Cin,Cout)
    # -> (2,2, 4*Cin, Cout) with channel order (pi,pj,cin)
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w2 = wp.reshape(2, 2, 2, 2, c, cout).transpose(0, 2, 1, 3, 4, 5) \
           .reshape(2, 2, 4 * c, cout)
    # input: (N,H,W,C) -> (N, H/2, W/2, 4C), channel order (pi,pj,c)
    x2 = x.reshape(n, h // 2, 2, ww // 2, 2, c).transpose(0, 1, 3, 2, 4, 5) \
          .reshape(n, h // 2, ww // 2, 4 * c)
    out = lax.conv_general_dilated(
        x2, w2, window_strides=(1, 1), padding=[(1, 0), (1, 0)],
        dimension_numbers=DIMNUMS,
        preferred_element_type=None if compute_dtype is not None else jnp.float32,
    )
    return out.astype(orig_dtype)


def batch_norm_infer(x, gamma, beta, mean, var, eps: float = 1e-5):
    """Inference-mode BN (running statistics). The scale/shift are computed
    in f32 then cast to the activation dtype so bf16 activations stay bf16
    (no f32 round-trip through HBM)."""
    scale = gamma * lax.rsqrt(var + eps)
    shift = beta - mean * scale
    return x * scale.astype(x.dtype) + shift.astype(x.dtype)


def batch_norm_train(x, gamma, beta, running_mean, running_var,
                     eps: float = 1e-5, momentum: float = 0.1):
    """Training-mode BN over NHWC (reduce N,H,W).

    Returns (y, new_running_mean, new_running_var). Matches torch semantics:
    normalisation uses the biased batch variance, the running-var update uses
    the unbiased one; running = (1-m)*running + m*batch.

    Statistics are always computed in f32 — activations may be stored bf16
    (halves train-step HBM traffic) without degrading the running stats or
    the normalisation math; only the final y is cast back.

    mean and E[x^2] are reduced in ONE pass over x (var = E[x^2] - mean^2)
    so XLA fuses both reductions into a single read of the activation —
    the two-pass (x - mean)^2 form cost a second full HBM read of every
    BN'd feature map in the train step (hlo_stats: ~4 ms per stem layer
    at 608px/bs64 on v5e). f32 accumulation keeps the cancellation error
    of the E[x^2] form well under bf16 input noise.
    """
    axes = (0, 1, 2)
    n = x.shape[0] * x.shape[1] * x.shape[2]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes)
    if x.dtype == jnp.float32:
        # f32 (parity/CPU) path: two-pass variance. The one-pass form
        # E[x^2]-mean^2 cancels catastrophically when |mean| >> std (e.g.
        # near-constant inputs), which perturbs the BN backward at the 1e-2
        # level — measured against torch in the trajectory-parity test.
        var = jnp.mean(jnp.square(xf - mean), axis=axes)
    else:
        mean_sq = jnp.mean(jnp.square(xf), axis=axes)
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)  # biased
    y = ((xf - mean) * lax.rsqrt(var + eps) * gamma + beta).astype(x.dtype)
    unbiased = var * (n / max(n - 1, 1))
    new_mean = (1.0 - momentum) * running_mean + momentum * mean
    new_var = (1.0 - momentum) * running_var + momentum * unbiased
    return y, new_mean, new_var


def max_pool(x, size: int, stride: int):
    """Darknet maxpool.

    General case: torch MaxPool2d(k, s, padding=(k-1)//2) — -inf padding.
    Tiny case k=2, s=1: explicit (0,1,0,1) ZERO pad then 2x2/1 pool
    (reference models.py:211-213).
    """
    if size == 2 and stride == 1:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        pad = [(0, 0), (0, 0), (0, 0), (0, 0)]
    else:
        p = (size - 1) // 2
        pad = [(0, 0), (p, p), (p, p), (0, 0)]
    # float init must stay a Python scalar: reduce_window's VJP rejects
    # array-valued init; the typed array init is only needed (and only
    # used) on the inference-only int8 path
    init = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.array(jnp.iinfo(x.dtype).min, x.dtype))
    return lax.reduce_window(
        x, init,
        lax.max,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, stride, stride, 1),
        padding=pad,
    )


def space_to_depth(x, stride: int):
    """NHWC space-to-depth: (N,H,W,C) -> (N,H/s,W/s,s*s*C), output channel
    index = (sy*s + sx)*C + c — the [reorg3d] lowering.

    The reference no-ops reorg3d (models.py:307-308), which leaves its only
    user cfg (cfg/yolov3/yolov3-spp-pan-scale.cfg:773-791) unrunnable
    upstream: the following PAN route concats get a 2x spatial mismatch.
    Here the block runs for real (same move as the ASFF head fusion), so
    the cfg forwards/trains. Pure layout op — no FLOPs, grid-preserving on
    quantized tensors.
    """
    n, h, w, c = x.shape
    s = stride
    x = x.reshape(n, h // s, s, w // s, s, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // s, w // s, s * s * c)


def upsample_nearest(x, scale: int):
    """Nearest-neighbour upsample by integer factor (reference models.py:224-225)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, scale, w, scale, c))
    return x.reshape(b, h * scale, w * scale, c)


def se_block(x, fc1_w, fc2_w):
    """Squeeze-and-Excitation (reference utils/layers.py:176-192).

    fc weights kept in torch Linear layout (out_features, in_features) for
    bit-compatible darknet serialisation (reference models.py:720-732).
    Gate is HardSigmoid.
    """
    y = jnp.mean(x, axis=(1, 2))                       # (b, c) squeeze
    y = jax.nn.relu(y @ fc1_w.T)                       # (b, c//r)
    y = y @ fc2_w.T                                    # (b, c)
    y = jnp.clip(y + 3.0, 0.0, 6.0) / 6.0              # hard sigmoid
    return x * y[:, None, None, :]


def mixconv2d(x, weights: list, *, stride: int = 1,
              compute_dtype=jnp.bfloat16):
    """MixConv: mixed-kernel-size grouped convolution
    (reference utils/layers.py:75-100, unused by the zoo cfgs).

    ``weights``: list of HWIO kernels with odd sizes; outputs concatenate
    along channels; each branch uses 'same' padding k//2."""
    outs = []
    for w in weights:
        k = w.shape[0]
        outs.append(conv2d(x, w, stride=stride, padding=k // 2,
                           compute_dtype=compute_dtype))
    return jnp.concatenate(outs, axis=-1)


def mixconv_channel_split(out_ch: int, ks=(3, 5, 7), method='equal_params'):
    """Per-branch channel counts (layers.py:80-89): 'equal_ch' splits
    channels evenly; 'equal_params' solves for equal parameter count."""
    import numpy as np
    groups = len(ks)
    if method == 'equal_ch':
        i = np.floor(np.linspace(0, groups - 1e-6, out_ch))
        return [int((i == g).sum()) for g in range(groups)]
    b = [out_ch] + [0] * groups
    a = np.eye(groups + 1, groups, k=-1)
    a -= np.roll(a, 1, axis=1)
    a *= np.array(ks) ** 2
    a[0] = 1
    return np.linalg.lstsq(a, b, rcond=None)[0].round().astype(int).tolist()


def fuse_conv_bn(w, b, gamma, beta, mean, var, eps: float = 1e-5):
    """Fold BN into conv weights/bias for inference
    (reference utils/torch_utils.py:65-89, Darknet.fuse models.py:563-577).

    w: HWIO. Returns (w_fused, b_fused).
    """
    scale = gamma / jnp.sqrt(var + eps)                # (O,)
    w_f = w * scale[None, None, None, :]
    if b is None:
        b = jnp.zeros_like(mean)
    b_f = (b - mean) * scale + beta
    return w_f, b_f
