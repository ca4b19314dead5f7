"""cfg -> IR -> single jitted apply function.

The reference walks an nn.ModuleList per forward (models.py:508-561). Here
``make_apply`` closes over the NetworkIR and emits one pure function; tracing
unrolls the graph so XLA sees the entire detector as a single program and can
fuse conv+bn+activation chains, tile convs onto the MXU, and schedule the
whole thing without Python in the loop.

Params pytree:  {layer_index(str): {field: array}}   (trainable)
State pytree:   {layer_index(str): {'mean','var'}}   (BN running stats)

Conv kernels are HWIO, activations NHWC, compute bf16/accumulate f32.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field as dc_field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from .. import ir as ir_mod
from ..ops import activations as act_mod
from ..ops import conv as conv_ops
from .yolo_head import decode_yolo_nhwc, reshape_pred

# BN hyper-params: per-conv BN (torch default eps, momentum=0.1,
# reference models.py:100) vs standalone BatchNorm2d blocks
# (momentum=0.03, eps=1e-4, reference models.py:201).
CONV_BN_EPS, CONV_BN_MOM = 1e-5, 0.1
LONE_BN_EPS, LONE_BN_MOM = 1e-4, 0.03


def _kaiming_uniform(key, shape, fan_in):
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_params(rng, net: ir_mod.NetworkIR):
    """Initialise (params, state) pytrees with torch-equivalent defaults,
    including smart bias init for YOLO-preceding convs (models.py:325-335)."""
    params: dict[str, dict] = {}
    state: dict[str, dict] = {}
    keys = jax.random.split(rng, max(len(net.layers), 1) * 3).reshape(
        len(net.layers), 3, -1)

    for lyr in net.layers:
        k = str(lyr.index)
        kw, kb, _ = keys[lyr.index]
        if lyr.kind in ('conv', 'depthwise'):
            in_per_group = lyr.in_channels // lyr.groups
            fan_in = in_per_group * lyr.size * lyr.size
            p = {'w': _kaiming_uniform(kw, (lyr.size, lyr.size, in_per_group,
                                            lyr.filters), fan_in)}
            if lyr.bn:
                p['gamma'] = jnp.ones(lyr.filters, jnp.float32)
                p['beta'] = jnp.zeros(lyr.filters, jnp.float32)
                state[k] = {'mean': jnp.zeros(lyr.filters, jnp.float32),
                            'var': jnp.ones(lyr.filters, jnp.float32)}
            else:
                p['b'] = _kaiming_uniform(kb, (lyr.filters,), fan_in)
            params[k] = p
        elif lyr.kind == 'batchnorm':
            c = lyr.filters
            params[k] = {'gamma': jnp.ones(c, jnp.float32),
                         'beta': jnp.zeros(c, jnp.float32)}
            if lyr.index == 0 and c == 3:
                # imagenet input normaliser (reference models.py:202-205)
                state[k] = {'mean': jnp.array([0.485, 0.456, 0.406], jnp.float32),
                            'var': jnp.array([0.0524, 0.0502, 0.0506], jnp.float32)}
            else:
                state[k] = {'mean': jnp.zeros(c, jnp.float32),
                            'var': jnp.ones(c, jnp.float32)}
        elif lyr.kind == 'se':
            c, r = lyr.filters, lyr.reduction
            params[k] = {
                'fc1': _kaiming_uniform(kw, (c // r, c), c),
                'fc2': _kaiming_uniform(kb, (c, c // r), c // r),
            }
        elif lyr.kind == 'shortcut' and lyr.weighted:
            params[k] = {'w': jnp.zeros(len(lyr.layers) + 1, jnp.float32)}

    # smart bias init for YOLO-preceding convs
    for lyr in net.layers:
        if lyr.kind in ('conv',) and lyr.smart_bias and 'b' in params[str(lyr.index)]:
            # find the yolo layer that follows to get na/nc
            for y in net.layers[lyr.index + 1:]:
                if y.kind == 'yolo':
                    na, no, nc = y.na, y.no, y.nc
                    b = params[str(lyr.index)]['b']
                    if b.shape[0] >= na * no:
                        head = np.asarray(b[:na * no]).reshape(na, no).copy()
                        head[:, 4] -= 4.5
                        head[:, 5:] += math.log(0.6 / (nc - 0.99))
                        b = b.at[:na * no].set(jnp.asarray(head.reshape(-1)))
                        params[str(lyr.index)]['b'] = b
                    break
    return params, state


def make_apply(net: ir_mod.NetworkIR, *, compute_dtype=jnp.bfloat16,
               maxabsscaler: bool = False, fused: bool = False,
               heads_only: bool = False,
               head_layout: str = 'anchor_major',
               remat_tags: bool = False,
               s2d_min_hw: int = 0) -> Callable:
    """Build the network apply function.

    apply(params, state, x, train=False) ->
      train: ((yolo_p list, feature_out list), new_state)
        yolo_p entries are (bs, na, ny, nx, no) — the reference layout
        (models.py:404-408) — unless ``head_layout='nhwc'``, which emits
        (bs, ny, nx, na, no): a free reshape of the NHWC head conv output
        (no permute; saves ~6 ms of f32 data-formatting per step at
        608px/bs64). compute_loss(layout='nhwc') consumes it directly.
      eval:  (io (bs, total, no), yolo_p list, feature_out list)
      eval + heads_only: (head_out, obj_out) — raw NHWC head-conv
        outputs (bs, ny, nx, na*no) plus per-scale objectness-logit maps
        (bs, ny, nx, na) for the sparse-decode NMS path (ops/nms.py
        non_max_suppression_heads); skips the full-tensor decode and the
        reference-layout (bs,na,ny,nx,no) permute. The obj map is the
        head conv re-run with only its na objectness output channels
        (w[..., a*no+4]) — a near-free slim conv that saves the NMS
        candidate stage a full lane-relayout pass over the 255-channel
        head tensor (profiled ~3 ms at 608px/bs128 on v5e). obj_out
        entries are None when the head conv isn't a plain linear conv
        (then the NMS falls back to slicing obj from the head rows).

    ``fused`` skips BN (params must be pre-folded via fuse_params).

    ``s2d_min_hw`` (training-perf knob): lower 3x3 stride-2 convs whose
    input spatial extent is >= this threshold through the numerics-identical
    space-to-depth rewrite (conv_ops.conv2d_s2d_stride2) — trades +78% stem
    FLOPs for stride-1 MXU-dense shapes on the HBM-bound stem. 0 disables.

    ``remat_tags`` marks every shortcut / multi-route output with
    ``checkpoint_name('block_out')`` so a trainer-level
    ``jax.checkpoint(policy=save_only_these_names('block_out'))`` saves only
    block boundaries for the backward and recomputes the conv/BN/act chains
    inside each block. At 608px/bs128 the activation set (~20+ GB) exceeds
    HBM, so XLA's automatic HLO rematerializer already rewrites the
    backward; the explicit block policy replaces its greedy choices with
    aligned boundaries (trainer.py remat='blocks').
    """
    layers = net.layers
    if remat_tags:
        from jax.ad_checkpoint import checkpoint_name
        tag = lambda t: checkpoint_name(t, 'block_out')
    else:
        tag = lambda t: t

    # ASFF (reference models.py:381-399, hardcoded-dead upstream): a yolo
    # block with `from=` head layers whose maps carry na*no + nl channels
    # fuses all scales — per-pixel sigmoid weights from this scale's last
    # nl channels, other scales bilinear-resized (align_corners=False ==
    # antialias-off half-pixel). cfg/yolov3/yolov3-asff.cfg ships exactly
    # this layout (258 = 3*85 + 3), which the reference cannot run at all
    # (ASFF=False crashes reshaping 258ch to 3*85); here it just works.
    asff_yolo = set()
    for lyr in layers:
        if (lyr.kind == 'yolo' and len(lyr.layers) >= 2
                and all(0 <= j < lyr.index
                        and layers[j].filters
                        == lyr.na * lyr.no + len(lyr.layers)
                        for j in lyr.layers)):
            asff_yolo.add(lyr.index)

    def asff_fuse(outs, lyr):
        srcs = [outs[j].astype(jnp.float32) for j in lyr.layers]
        n, i = len(srcs), lyr.yolo_index
        p = srcs[i]
        w = jax.nn.sigmoid(p[..., -n:]) * (2.0 / n)    # models.py:390
        fused = p[..., :-n] * w[..., i:i + 1]
        bs, ny, nx, _ = p.shape
        for j, s in enumerate(srcs):
            if j != i:
                r = jax.image.resize(s[..., :-n],
                                     (bs, ny, nx, s.shape[-1] - n),
                                     method='bilinear', antialias=False)
                fused = fused + w[..., j:j + 1] * r
        return fused

    # head conv index -> (na, no) for yolo layers that consume the
    # immediately preceding conv's output (darknet cfgs always do)
    head_meta = {}
    obj_src = {}    # yolo layer index -> its head conv's index
    if heads_only:
        for i, lyr in enumerate(layers):
            if lyr.kind != 'yolo' or i == 0:
                continue
            hc = layers[i - 1]
            if (lyr.index not in asff_yolo   # obj lives in the FUSED map
                    and hc.kind == 'conv' and hc.groups == 1
                    and hc.activation in ('linear', None)
                    and (fused or not hc.bn)):
                head_meta[hc.index] = (lyr.na, lyr.no)
                # pair by the conv's actual .index (list position and IR
                # index must agree for the pending_obj handoff below —
                # keying both sides off hc.index makes that explicit)
                obj_src[lyr.index] = hc.index

    def apply(params, state, x, train: bool = False):
        outs: dict[int, Any] = {}
        yolo_p = []
        head_out = []
        obj_out = []
        pending_obj: dict[int, Any] = {}
        feature_out = []
        new_state = {}
        # activations stay in the compute dtype end-to-end, training
        # included (halves train-step HBM traffic); BN batch statistics are
        # computed in f32 inside batch_norm_train, and the loss upcasts the
        # head outputs, so the bf16 storage only rounds intermediates
        prev = x if compute_dtype is None else x.astype(compute_dtype)

        for lyr in layers:
            k = str(lyr.index)
            if lyr.kind in ('conv', 'depthwise'):
                p = params[k]
                if lyr.index in head_meta and 'b' in p:
                    # slim objectness conv: same layer, obj channels only
                    na_, no_ = head_meta[lyr.index]
                    cols = np.asarray([a * no_ + 4 for a in range(na_)])
                    yo = conv_ops.conv2d(prev, p['w'][..., cols],
                                         stride=lyr.stride_xy or lyr.stride,
                                         padding=lyr.pad, groups=1,
                                         compute_dtype=compute_dtype)
                    pending_obj[lyr.index] = yo + p['b'][cols].astype(yo.dtype)
                if (s2d_min_hw and lyr.size == 3 and lyr.pad == 1
                        and lyr.groups == 1 and lyr.stride_xy is None
                        and lyr.stride == 2
                        and min(prev.shape[1], prev.shape[2]) >= s2d_min_hw
                        and prev.shape[1] % 2 == 0
                        and prev.shape[2] % 2 == 0):
                    y = conv_ops.conv2d_s2d_stride2(
                        prev, p['w'], compute_dtype=compute_dtype)
                else:
                    y = conv_ops.conv2d(prev, p['w'],
                                        stride=lyr.stride_xy or lyr.stride,
                                        padding=lyr.pad, groups=lyr.groups,
                                        compute_dtype=compute_dtype)
                if lyr.bn and not fused:
                    if train:
                        y, m, v = conv_ops.batch_norm_train(
                            y, p['gamma'], p['beta'], state[k]['mean'],
                            state[k]['var'], CONV_BN_EPS, CONV_BN_MOM)
                        new_state[k] = {'mean': m, 'var': v}
                    else:
                        y = conv_ops.batch_norm_infer(
                            y, p['gamma'], p['beta'], state[k]['mean'],
                            state[k]['var'], CONV_BN_EPS)
                elif 'b' in p:
                    y = y + p['b'].astype(y.dtype)
                y = act_mod.get(lyr.activation, maxabsscaler)(y)
                prev = y

            elif lyr.kind == 'batchnorm':
                p = params[k]
                if train:
                    y, m, v = conv_ops.batch_norm_train(
                        prev, p['gamma'], p['beta'], state[k]['mean'],
                        state[k]['var'], LONE_BN_EPS, LONE_BN_MOM)
                    new_state[k] = {'mean': m, 'var': v}
                else:
                    y = conv_ops.batch_norm_infer(
                        prev, p['gamma'], p['beta'], state[k]['mean'],
                        state[k]['var'], LONE_BN_EPS)
                prev = y

            elif lyr.kind == 'maxpool':
                prev = conv_ops.max_pool(prev, lyr.size, lyr.stride)

            elif lyr.kind == 'se':
                p = params[k]
                prev = conv_ops.se_block(prev, p['fc1'], p['fc2'])

            elif lyr.kind == 'upsample':
                prev = conv_ops.upsample_nearest(prev, lyr.stride)

            elif lyr.kind == 'route':
                if len(lyr.layers) > 1:
                    prev = tag(jnp.concatenate([outs[j] for j in lyr.layers],
                                               axis=-1))
                elif lyr.route_groups:
                    # half-channel split of the incoming tensor
                    # (reference utils/layers.py:36-38, yolov4-tiny)
                    c = prev.shape[-1]
                    prev = prev[..., c // 2:]
                else:
                    prev = outs[lyr.layers[0]]

            elif lyr.kind == 'shortcut':
                x_ = prev
                if lyr.weighted:
                    w = jax.nn.sigmoid(params[k]['w']) * (2.0 / (len(lyr.layers) + 1))
                    x_ = x_ * w[0]
                nx_ = x_.shape[-1]
                for idx, j in enumerate(lyr.layers):
                    a = outs[j]
                    if lyr.weighted:
                        a = a * w[idx + 1]
                    na_ = a.shape[-1]
                    if nx_ == na_:
                        x_ = x_ + a
                    elif nx_ > na_:  # add into leading channels (layers.py:67-68)
                        x_ = jnp.concatenate([x_[..., :na_] + a, x_[..., na_:]], -1)
                    else:            # slice the feature (layers.py:69-70)
                        x_ = x_ + a[..., :nx_]
                prev = tag(x_)

            elif lyr.kind == 'avgpool':
                # global average pool to 1x1 (SE squeeze); f32 reduction for
                # stable means under bf16 activations
                prev = jnp.mean(prev.astype(jnp.float32), axis=(1, 2),
                                keepdims=True).astype(prev.dtype)

            elif lyr.kind == 'scale_channels':
                # excite: per-channel gate (1x1 spatial) scales the `from` map
                prev = outs[lyr.layers[0]] * prev

            elif lyr.kind == 'reorg3d':
                # space-to-depth (the reference no-ops this, models.py:307-308,
                # making yolov3-spp-pan-scale.cfg unrunnable there; it runs
                # for real here — see ops/conv.py:space_to_depth)
                prev = conv_ops.space_to_depth(prev, lyr.stride)

            elif lyr.kind == 'dropout':
                pass  # inference-identity

            elif lyr.kind == 'yolo':
                hmap = (asff_fuse(outs, lyr) if lyr.index in asff_yolo
                        else prev)
                if head_layout == 'nhwc':
                    bs_, ny_, nx_, _ = hmap.shape
                    p_raw = hmap.reshape(bs_, ny_, nx_, lyr.na, lyr.no)
                else:
                    p_raw = reshape_pred(hmap, lyr.na, lyr.no)
                yolo_p.append(p_raw)
                head_out.append(hmap)   # NHWC conv output for transpose-free decode
                obj_out.append(pending_obj.get(obj_src.get(lyr.index, -1)))
                # prev intentionally unchanged (models.py:534-535)

            if lyr.is_routed:
                outs[lyr.index] = prev
            if lyr.feature_out:
                feature_out.append(prev)

        if train:
            return (yolo_p, feature_out), new_state
        if heads_only:
            return head_out, obj_out

        ios = []
        yi = 0
        for lyr in layers:
            if lyr.kind == 'yolo':
                # decode in f32 regardless of compute dtype (box precision);
                # straight from the NHWC head output so the (bs,na,ny,nx,no)
                # permute in yolo_p is dead code unless a caller uses it
                ios.append(decode_yolo_nhwc(head_out[yi], lyr.anchors,
                                            lyr.yolo_stride, lyr.no))
                yi += 1
        io = jnp.concatenate(ios, axis=1)
        return io, yolo_p, feature_out

    return apply


def scale_img(x, ratio: float, same_shape: bool = False, gs: int = 64):
    """Bilinear scale + pad with the imagenet-mean grey 0.447
    (reference utils/torch_utils.py:131-139). NHWC."""
    if ratio == 1.0:
        return x
    b, h, w, c = x.shape
    nh, nw = int(h * ratio), int(w * ratio)
    # antialias=False: torch F.interpolate(bilinear, align_corners=False)
    # applies no antialiasing prefilter on downscale — required for TTA
    # output parity with the reference (torch_utils.py:134)
    y = jax.image.resize(x, (b, nh, nw, c), method='bilinear',
                         antialias=False)
    if not same_shape:
        h, w = (math.ceil(h * ratio / gs) * gs, math.ceil(w * ratio / gs) * gs)
    pad_h, pad_w = max(h - nh, 0), max(w - nw, 0)
    return jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                   constant_values=0.447)


def make_augmented_apply(net: ir_mod.NetworkIR, **kw):
    """Test-time augmentation: original + lr-flip@0.83 + 0.67 scale, merged
    detections (reference Darknet.forward augment path, models.py:482-506)."""
    apply = make_apply(net, **kw)

    def aug_apply(params, state, x):
        img_w = x.shape[2]
        io0, _, _ = apply(params, state, x, train=False)
        x1 = scale_img(jnp.flip(x, axis=2), 0.83)
        io1, _, _ = apply(params, state, x1, train=False)
        io1 = io1.at[..., :4].divide(0.83)
        io1 = io1.at[..., 0].set(img_w - io1[..., 0])   # un-flip x centres
        x2 = scale_img(x, 0.67)
        io2, _, _ = apply(params, state, x2, train=False)
        io2 = io2.at[..., :4].divide(0.67)
        return jnp.concatenate([io0, io1, io2], axis=1)

    return aug_apply


def fuse_params(net: ir_mod.NetworkIR, params, state):
    """Fold BN into conv weights for inference (Darknet.fuse,
    models.py:563-577). Returns a fused params pytree for make_apply(fused=True)."""
    fused = {k: dict(v) for k, v in params.items()}
    for lyr in net.layers:
        k = str(lyr.index)
        if lyr.kind in ('conv', 'depthwise') and lyr.bn and k in state:
            p = fused[k]
            w, b = conv_ops.fuse_conv_bn(
                p['w'], p.get('b'), p['gamma'], p['beta'],
                state[k]['mean'], state[k]['var'], CONV_BN_EPS)
            fused[k] = {'w': w, 'b': b}
    return fused


@dataclass
class Network:
    """Convenience bundle: IR + params/state + jitted apply fns.

    Mirrors the role of the reference Darknet module (models.py:440-581)
    without being a stateful interpreter.
    """
    net: ir_mod.NetworkIR
    params: Any
    state: Any
    compute_dtype: Any = jnp.bfloat16
    maxabsscaler: bool = False
    _apply: Callable = dc_field(init=False, repr=False, default=None)

    @classmethod
    def from_cfg(cls, cfg, img_size=416, rng=None, is_gray_scale=False,
                 compute_dtype=jnp.bfloat16, maxabsscaler=False):
        del img_size  # shapes are resolved per-call; kept for API parity
        net = ir_mod.build_ir(cfg, is_gray_scale=is_gray_scale)
        rng = jax.random.PRNGKey(0) if rng is None else rng
        params, state = init_params(rng, net)
        obj = cls(net=net, params=params, state=state,
                  compute_dtype=compute_dtype, maxabsscaler=maxabsscaler)
        return obj

    def __post_init__(self):
        self._apply = make_apply(self.net, compute_dtype=self.compute_dtype,
                                 maxabsscaler=self.maxabsscaler)

    @property
    def apply(self):
        return self._apply

    def __call__(self, x, train=False):
        return self._apply(self.params, self.state, x, train=train)

    @property
    def yolo_layers(self):
        return self.net.yolo_layers

    @property
    def nc(self):
        return self.net.nc

    def anchor_vecs(self):
        """Per-YOLO-layer anchors divided by stride (grid units)."""
        return [np.asarray(l.anchors) / l.yolo_stride
                for l in self.net.layers if l.kind == 'yolo']

    def num_params(self) -> int:
        return sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(self.params)) + \
               sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(self.state))
