"""Model loading / inference bundles — the user-facing runtime API.

Plays the role of the reference's Darknet-constructor + weight-load
boilerplate repeated in every script (train.py:111-186, test.py:30-50,
detect.py:24-45): build IR, init pytrees, load .npz checkpoints or darknet
.weights, optionally attach a quantization scheme, and hand back jitted
apply/predict functions.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp

# Persistent XLA compilation cache: the deep QAT-sim graphs compile in
# minutes cold (75 convs x tracker updates); cache makes re-runs instant.
# Opt out with YOLO_TPU_NO_COMPILE_CACHE=1.
if not os.environ.get('YOLO_TPU_NO_COMPILE_CACHE'):
    _cache_dir = os.environ.get(
        'YOLO_TPU_COMPILE_CACHE',
        os.path.join(os.path.expanduser('~'), '.cache', 'yolo_tpu_xla'))
    try:
        jax.config.update('jax_compilation_cache_dir', _cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    except Exception:  # older jax without the knobs
        pass

from .compress.quant import QuantConfig, init_quant_state, make_quant_apply
from .ir import NetworkIR, build_ir
from .models.darknet_io import load_darknet_weights
from .models.network import fuse_params, init_params, make_apply
from .ops.nms import non_max_suppression
from .utils.checkpoint import load_checkpoint


@dataclass
class ModelBundle:
    net: NetworkIR
    params: Any
    state: Any
    qstate: Any = None
    qcfg: QuantConfig | None = None
    compute_dtype: Any = jnp.bfloat16
    maxabsscaler: bool = False
    _apply: Callable = field(default=None, repr=False)

    @property
    def quantized(self) -> bool:
        return self.qcfg is not None

    def apply(self, params, state, x, train=False, qstate=None):
        if self.quantized:
            return self._apply(params, state,
                               qstate if qstate is not None else self.qstate,
                               x, train)
        return self._apply(params, state, x, train)

    def anchor_vecs(self):
        return [l.anchors / l.yolo_stride for l in self.net.layers
                if l.kind == 'yolo']

    @property
    def strides(self):
        return [l.yolo_stride for l in self.net.layers if l.kind == 'yolo']

    @property
    def nc(self):
        return self.net.nc

    def fuse(self):
        """Conv+BN fusion for float inference (Darknet.fuse,
        models.py:563-577). Returns a new bundle with fused params."""
        fused = fuse_params(self.net, self.params, self.state)
        apply = make_apply(self.net, compute_dtype=self.compute_dtype,
                           maxabsscaler=self.maxabsscaler, fused=True)
        return ModelBundle(net=self.net, params=fused, state={},
                           compute_dtype=self.compute_dtype,
                           maxabsscaler=self.maxabsscaler, _apply=apply)

    def make_infer(self, conf_thres=0.3, iou_thres=0.6, top_k=512,
                   max_det=300, multi_label=True, agnostic=False,
                   augment=False, sparse=None, classes=None, engine=None):
        """Jitted full pipeline: forward + decode + batched NMS.

        ``augment`` = test-time augmentation (original + flip@0.83 + 0.67
        scale merged before NMS; reference models.py:482-506).

        ``sparse`` selects the sparse-decode NMS path (objectness top-k on
        raw head logits, decode only survivors — skips the (bs, N, 5+nc)
        io materialisation, ~15% e2e on v5e @608). Default: on for plain
        float inference on TPU; the dense path everywhere else.

        ``engine``: quantized models only — run the true-int8 MXU engine
        (models/int8_engine.py: real s8 convs, int8 HBM edges, int8 heads
        into the sparse NMS) instead of the fake-quant simulation. Default
        None = auto: the engine on TPU when the scheme exports frozen
        scales (google/ptq_cos), the sim elsewhere."""
        if augment and self.quantized:
            print('WARNING: --augment (TTA) is not supported with quantized '
                  'inference; running single-pass')
        if augment and not self.quantized:
            from .models.network import make_augmented_apply
            aug_apply = make_augmented_apply(
                self.net, compute_dtype=self.compute_dtype,
                maxabsscaler=self.maxabsscaler,
                fused=(not self.state))

            def fn(params, state, x):
                io = aug_apply(params, state, x)
                return non_max_suppression(
                    io, conf_thres=conf_thres, iou_thres=iou_thres,
                    top_k=top_k, max_det=max_det, multi_label=multi_label,
                    agnostic=agnostic, classes=classes)
            jfn = jax.jit(fn)
            return lambda x: jfn(self.params, self.state, x)
        if self.quantized:
            if engine is None:
                engine = (jax.default_backend() == 'tpu'
                          and self.qcfg.scheme in ('google', 'ptq_cos'))
            if engine:
                from .models.int8_engine import (make_int8_apply,
                                                 prepare_int8)
                from .ops.nms import non_max_suppression_heads
                plan = prepare_int8(self.net, self.params, self.state,
                                    self.qstate, self.qcfg)
                eng = make_int8_apply(self.net, plan, backend='auto',
                                      heads_only=True)
                yolos = [l for l in self.net.layers if l.kind == 'yolo']
                anchors = [l.anchors for l in yolos]
                strides = [l.yolo_stride for l in yolos]
                no = self.nc + 5

                def fn(arrays, x):
                    heads, objs = eng(arrays, x)
                    return non_max_suppression_heads(
                        heads, anchors, strides, no, conf_thres=conf_thres,
                        iou_thres=iou_thres, top_k=top_k, max_det=max_det,
                        multi_label=multi_label, agnostic=agnostic,
                        objs=objs, classes=classes,
                        head_scales=eng.head_scales)
                jfn = jax.jit(fn)
                arrays = plan.arrays
                return lambda x: jfn(arrays, x)

            def fn(params, state, qstate, x):
                io, _, _ = self._apply(params, state, qstate, x, False)
                return non_max_suppression(
                    io, conf_thres=conf_thres, iou_thres=iou_thres,
                    top_k=top_k, max_det=max_det, multi_label=multi_label,
                    agnostic=agnostic, classes=classes)
            jfn = jax.jit(fn)
            return lambda x: jfn(self.params, self.state, self.qstate, x)
        if sparse is None:
            sparse = jax.default_backend() == 'tpu'
        if sparse:
            from .ops.nms import non_max_suppression_heads
            heads_apply = make_apply(
                self.net, compute_dtype=self.compute_dtype,
                maxabsscaler=self.maxabsscaler, fused=(not self.state),
                heads_only=True)
            yolos = [l for l in self.net.layers if l.kind == 'yolo']
            anchors = [l.anchors for l in yolos]
            strides = [l.yolo_stride for l in yolos]
            no = self.nc + 5

            def fn(params, state, x):
                heads, objs = heads_apply(params, state, x, False)
                return non_max_suppression_heads(
                    heads, anchors, strides, no, conf_thres=conf_thres,
                    iou_thres=iou_thres, top_k=top_k, max_det=max_det,
                    multi_label=multi_label, agnostic=agnostic, objs=objs,
                    classes=classes)
            jfn = jax.jit(fn)
            return lambda x: jfn(self.params, self.state, x)

        def fn(params, state, x):
            io, _, _ = self._apply(params, state, x, False)
            return non_max_suppression(
                io, conf_thres=conf_thres, iou_thres=iou_thres, top_k=top_k,
                max_det=max_det, multi_label=multi_label, agnostic=agnostic,
                classes=classes)
        jfn = jax.jit(fn)
        return lambda x: jfn(self.params, self.state, x)


def load_model(cfg, weights=None, *, quantized: int = -1, a_bit: int = 8,
               w_bit: int = 8, shortcut_way: int = 1, steps: int = 0,
               is_gray_scale: bool = False, maxabsscaler: bool = False,
               compute_dtype=jnp.bfloat16, rng=None,
               pt: bool = False, prefer_ema: bool = True,
               eval_snap_dtype=None) -> ModelBundle:
    """Build + load a detector.

    ``quantized``: -1 float, 1 google QAT, 2 TPSQ, 3 cos-PTQ (models.py:34-90);
    extensions beyond the reference surface: 4 DoReFa (its
    quantized_dorefa.py modules are defined but never wired into models.py),
    5 binary weights, 6 ternary weights (quantized_lowbit.py).
    ``weights``: .npz checkpoint or darknet .weights (auto-detected).
    ``prefer_ema``: .npz checkpoints from an --ema training run carry both
    the raw trajectory (params/state) and the EMA copy (ema/ema_state) whose
    mAP the run reported. Inference surfaces load the EMA copy — the
    reference ships the EMA state_dict AS ckpt['model'] (train.py:551-556).
    Pass False to read the raw trajectory (the --resume path).
    """
    net = build_ir(cfg, is_gray_scale=is_gray_scale)
    params, state = init_params(rng or jax.random.PRNGKey(0), net)

    qcfg = None
    qstate = None
    if quantized != -1:
        scheme = {1: 'google', 2: 'tpsq', 3: 'ptq_cos', 4: 'dorefa',
                  5: 'wbin', 6: 'ternary'}[quantized]
        qcfg = QuantConfig(scheme=scheme, a_bits=a_bit, w_bits=w_bit,
                           shortcut_way=shortcut_way,
                           maxabsscaler=maxabsscaler, steps=steps)
        qstate, extra = init_quant_state(net, qcfg)
        for k, v in extra.items():
            params[k] = {**params[k], **v}

    if weights and weights not in ('None', ''):
        if str(weights).endswith(('.npz',)):
            ck = load_checkpoint(weights)
            src_params, src_state = ck['params'], ck['state']
            if prefer_ema and ck.get('ema') is not None \
                    and ck.get('ema_state') is not None:
                # only swap in the EMA copy as a PAIR: EMA params normalised
                # by the raw trajectory's BN running stats is a weight/stat
                # combination no eval ever measured (pre-r4 checkpoints
                # stored 'ema' without 'ema_state' — those load raw/raw)
                src_params, src_state = ck['ema'], ck['ema_state']
            params = _merge_compatible(params, src_params)
            state = _merge_compatible(state, src_state)
            if qstate is not None:
                # restore quantizer calibration: embedded (QAT training
                # checkpoints) or the PTQ driver's sibling `_qstate.npz` —
                # the reference keeps these as state_dict buffers so any
                # quantized .pt reloads calibrated (quantized_google.py
                # registered buffers)
                saved_qs = ck.get('qstate')
                if saved_qs is None:
                    qs_path = str(weights)[:-len('.npz')] + '_qstate.npz'
                    if os.path.exists(qs_path):
                        saved_qs = load_checkpoint(qs_path)['params']
                if saved_qs is not None:
                    qstate = _merge_tree(qstate, saved_qs)
        elif str(weights).endswith(('.pt', '.pth')):
            # reference torch checkpoint, read directly (train.py:160-180)
            from .models.torch_import import load_torch_checkpoint
            params, state, qstate, _ = load_torch_checkpoint(
                net, params, state, weights, qstate=qstate)
        else:  # darknet binary
            params, state, _, _ = load_darknet_weights(
                net, params, state, weights, pt=pt, quant=(quantized != -1))

    if qcfg is not None:
        apply = make_quant_apply(net, qcfg, compute_dtype=compute_dtype,
                                 eval_snap_dtype=eval_snap_dtype)
    else:
        apply = make_apply(net, compute_dtype=compute_dtype,
                           maxabsscaler=maxabsscaler)
    return ModelBundle(net=net, params=params, state=state, qstate=qstate,
                       qcfg=qcfg, compute_dtype=compute_dtype,
                       maxabsscaler=maxabsscaler, _apply=apply)


def _merge_tree(dst, src):
    """Recursive shape-checked restore for arbitrarily nested pytrees
    (quantizer state: {layer: {wq/aq/bq: {scale/min/max/...}}})."""
    if isinstance(dst, dict) and isinstance(src, dict):
        out = dict(dst)
        for k, v in src.items():
            out[k] = _merge_tree(dst[k], v) if k in dst else jnp.asarray(v)
        return out
    if isinstance(dst, (list, tuple)) and isinstance(src, (list, tuple)) \
            and len(dst) == len(src):
        return type(dst)(_merge_tree(a, b) for a, b in zip(dst, src))
    if dst is None or src is None:
        return dst if src is None else jnp.asarray(src)
    return jnp.asarray(src) if np.shape(dst) == np.shape(src) else dst


def _merge_compatible(dst, src):
    """Load matching-shaped entries, skip the rest (reference's size-filtered
    load_state_dict, train.py:160-166)."""
    out = {k: dict(v) for k, v in dst.items()}
    for k, d in (src or {}).items():
        if k not in out:
            out[k] = {f: jnp.asarray(v) for f, v in d.items()}
            continue
        for f, v in d.items():
            if f not in out[k] or np.shape(out[k][f]) == np.shape(v):
                out[k][f] = jnp.asarray(v)
    return out


@partial(jax.jit, static_argnames=('maxabsscaler',))
def _normalize(x_u8, maxabsscaler: bool = False):
    x = x_u8.astype(jnp.float32) / 256.0
    if maxabsscaler:
        x = x * 2.0 - 1.0
    return x


def preprocess(imgs_uint8, maxabsscaler: bool = False):
    """uint8 NHWC batch -> float input (reference /256 normalisation,
    train.py:345-348; maxabs (-1,1) mode models.py:103).

    The batch crosses host->device as uint8 and is normalised on-device:
    4x less H2D traffic per step (decisive over slow links, and free
    bandwidth on PCIe hosts too)."""
    if isinstance(imgs_uint8, jax.Array):
        x_u8 = imgs_uint8          # already device-resident: no host bounce
    else:
        x_u8 = jnp.asarray(np.ascontiguousarray(imgs_uint8))
    return _normalize(x_u8, maxabsscaler)
