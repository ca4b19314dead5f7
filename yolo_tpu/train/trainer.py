"""Jitted train step + TrainState (functional core of the trainer).

Reference hot loop: train.py:342-477. Differences by design:
- the whole step (forward, loss, backward, BN-gamma sparsity, optimizer,
  EMA) is ONE jitted XLA program with donated buffers;
- gradient accumulation splits into compute_grads / apply_updates programs
  (reference train.py:450-459 steps every ``accumulate`` batches);
- DP gradient reduction is emitted by XLA from the batch sharding — there is
  no DDP wrapper (SURVEY.md §2.6).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..ir import NetworkIR
from ..models.network import make_apply
from .ema import EMAState, ema_init, ema_update
from .loss import LossHyp, compute_loss
from .optim import (PerGroupScalars, adam_init,
                    adam_update, label_tree, sgd_init, sgd_update)


class TrainState(NamedTuple):
    params: Any
    bn_state: Any
    opt_state: Any
    ema: EMAState | None
    grad_accum: Any         # accumulated grads pytree (zeros between bursts)
    accum_count: jnp.ndarray
    qstate: Any = None      # quantizer state (QAT paths only)


def init_train_state(params, bn_state, *, optimizer: str = 'sgd',
                     use_ema: bool = True, qstate=None) -> TrainState:
    # deep-copy the inputs: the jitted step functions donate the TrainState
    # (its buffers are reused in place), so the state chain must own its
    # arrays — callers keep their originals
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
    params = copy(params)
    bn_state = copy(bn_state)
    qstate = copy(qstate) if qstate is not None else None
    opt_init = sgd_init if optimizer == 'sgd' else adam_init
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return TrainState(params=params, bn_state=bn_state,
                      opt_state=opt_init(params),
                      ema=ema_init(params, bn_state) if use_ema else None,
                      grad_accum=zeros,
                      accum_count=jnp.zeros((), jnp.int32),
                      qstate=qstate)


def make_train_functions(net: NetworkIR, anchor_vecs, nc: int, hyp: LossHyp,
                         *, optimizer: str = 'sgd',
                         compute_dtype=jnp.bfloat16,
                         sparsity_s: float = 0.0,
                         sparse_gamma_layers: tuple[int, ...] = (),
                         kd_loss_fn: Callable | None = None,
                         remat: bool | str = False,
                         quant_apply: Callable | None = None,
                         s2d_min_hw: int = 0):
    """Build (grad_fn, update_fn) jittables.

    grad_fn(state, imgs, targets, valid, gr, loss_scale [, t_args])
        -> (state', loss_items)   accumulates grads + updates BN stats
    update_fn(state, scalars) -> state'   applies optimizer + EMA, resets accum

    ``sparse_gamma_layers`` + ``sparsity_s`` add the L1 subgradient
    s*sign(gamma) to BN-gamma grads (BNOptimizer.updateBN,
    utils/prune_utils.py:130-138) for sparse training before pruning.
    ``kd_loss_fn(yolo_p, feats, targets, valid, imgs) -> scalar`` lets the
    caller add a distillation term (train.py:389-435).
    """
    # the heads flow to the loss in their native NHWC-derived
    # (bs,ny,nx,na,no) shape — a free reshape instead of a per-scale
    # permute (hlo_stats: ~6 ms of f32 data formatting at 608px/bs64).
    # QAT and KD paths advertise their own layout (make_quant_apply /
    # make_kd_loss_fn ship 'nhwc' from the CLI; KD6 pins anchor_major).
    if quant_apply is not None:
        head_layout = getattr(quant_apply, 'head_layout', 'anchor_major')
    elif kd_loss_fn is not None:
        head_layout = getattr(kd_loss_fn, 'layout', 'anchor_major')
    else:
        head_layout = 'nhwc'
    if quant_apply is not None and kd_loss_fn is not None:
        assert getattr(kd_loss_fn, 'layout', 'anchor_major') == head_layout, \
            (getattr(kd_loss_fn, 'layout', None), head_layout)
    if quant_apply is not None:
        apply = quant_apply            # QAT path: signature takes qstate too
        if remat in ('blocks', True):
            # no checkpoint_name tags inside the quant apply — both remat
            # modes save only the jit boundary and recompute the forward
            # during the backward (memory headroom for larger QAT batches;
            # QAT @608/bs64 misses HBM by ~0.4G without it)
            apply = jax.checkpoint(apply, static_argnums=(4,))
    else:
        # remat: False/'none' -> XLA's automatic rematerializer (kicks in
        # when the activation set exceeds HBM); 'blocks' -> save only
        # shortcut/route boundaries, recompute the conv/BN/act chains inside
        # each block; True/'full' -> save nothing, recompute everything.
        apply = make_apply(net, compute_dtype=compute_dtype,
                           head_layout=head_layout,
                           remat_tags=(remat == 'blocks'),
                           s2d_min_hw=s2d_min_hw)
        if remat == 'blocks':
            apply = jax.checkpoint(
                apply, static_argnums=(3,),
                policy=jax.checkpoint_policies.save_only_these_names(
                    'block_out'))
        elif remat:
            apply = jax.checkpoint(apply, static_argnums=(3,))

    def loss_fn(params, bn_state, qstate, imgs, targets, valid, gr):
        if quant_apply is not None:
            (yolo_p, feats), new_bn, new_q = apply(params, bn_state, qstate,
                                                   imgs, True)
        else:
            (yolo_p, feats), new_bn = apply(params, bn_state, imgs, True)
            new_q = qstate
        loss, items = compute_loss(yolo_p, targets, valid, anchor_vecs, nc,
                                   hyp, gr, layout=head_layout)
        if kd_loss_fn is not None:
            loss = loss + kd_loss_fn(yolo_p, feats, targets, valid, imgs)
        return loss, (items, new_bn, new_q)

    # donate the TrainState: its buffers (params, momentum, EMA, grad
    # accumulators — the largest HBM residents) are reused in place instead
    # of copied every step
    @partial(jax.jit, donate_argnums=(0,))
    def grad_fn(state: TrainState, imgs, targets, valid, gr, loss_scale):
        def scaled(params):
            loss, aux = loss_fn(params, state.bn_state, state.qstate, imgs,
                                targets, valid, gr)
            return loss * loss_scale, aux  # loss *= bs/64 (train.py:437)

        grads, (items, new_bn, new_q) = jax.grad(scaled, has_aux=True)(
            state.params)

        if sparsity_s > 0 and sparse_gamma_layers:
            for li in sparse_gamma_layers:
                k = str(li)
                if 'gamma' in grads.get(k, {}):
                    grads[k]['gamma'] = grads[k]['gamma'] + \
                        sparsity_s * jnp.sign(state.params[k]['gamma'])

        acc = jax.tree_util.tree_map(jnp.add, state.grad_accum, grads)
        new_q = jax.lax.stop_gradient(new_q) if new_q is not None else None
        return state._replace(bn_state=new_bn, grad_accum=acc,
                              accum_count=state.accum_count + 1,
                              qstate=new_q), items

    opt_update = sgd_update if optimizer == 'sgd' else adam_update

    @partial(jax.jit, donate_argnums=(0,))
    def update_fn(state: TrainState, scalars: PerGroupScalars):
        lbl = label_tree(state.params)
        new_params, new_opt = opt_update(state.params, state.grad_accum,
                                         state.opt_state, lbl, scalars)
        ema = state.ema
        if ema is not None:
            ema = ema_update(ema, new_params, state.bn_state)
        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.grad_accum)
        return state._replace(params=new_params, opt_state=new_opt, ema=ema,
                              grad_accum=zeros,
                              accum_count=jnp.zeros((), jnp.int32))

    return grad_fn, update_fn
