"""Optimizers with torch-parity semantics, as pure pytree transforms.

The reference builds 3 (or 4, TPSQ) optimizer param groups (train.py:121-151):
  - 'weight' : conv kernels              -> weight decay applied
  - 'bias'   : conv biases + BN beta     -> burn-in lr starts at 0.1
  - 'other'  : BN gamma, SE fc, shortcut w, quant scales
Group membership is decided here from pytree structure (field names), not
string matching on module names.

SGD matches torch nesterov SGD (d = g + wd*p; v = mu*v + d; step = d + mu*v);
Adam matches torch Adam defaults. Per-step scalars (lr per group, wd,
momentum) are traced arguments so the reference's burn-in interpolation
(train.py:356-365) runs inside jit without recompiles.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

GROUP_WEIGHT, GROUP_BIAS, GROUP_OTHER, GROUP_SCALE = 0, 1, 2, 3


def group_label(layer_key: str, field: str) -> int:
    """Param-group assignment by pytree field name.

    Mirrors reference string-matching (train.py:124-133): conv/depthwise
    kernels 'w' -> weight group; 'b' (conv bias) and 'beta' (BN bias) ->
    bias group; everything else (gamma, se fc, shortcut weights) -> other;
    quantizer scales -> scale group (TPSQ pg3).
    """
    if field == 'w':
        return GROUP_WEIGHT
    if field in ('b', 'beta'):
        return GROUP_BIAS
    if 'scale' in field:
        return GROUP_SCALE
    return GROUP_OTHER


def label_tree(params) -> Any:
    """Build an int-labelled pytree congruent with params."""
    return {k: {f: group_label(k, f) for f in v} for k, v in params.items()}


class SGDState(NamedTuple):
    momentum_buf: Any


class PerGroupScalars(NamedTuple):
    """Per-step hyper-parameters; each is a 4-vector indexed by group."""
    lr: jnp.ndarray          # (4,)
    weight_decay: jnp.ndarray  # (4,)
    momentum: jnp.ndarray    # () shared


def sgd_init(params) -> SGDState:
    return SGDState(momentum_buf=jax.tree_util.tree_map(jnp.zeros_like, params))


def sgd_update(params, grads, opt_state: SGDState, labels,
               scalars: PerGroupScalars, nesterov: bool = True):
    """One torch-semantics SGD step. Returns (new_params, new_state)."""

    def upd(p, g, v, lab):
        lr = scalars.lr[lab]
        wd = scalars.weight_decay[lab]
        mu = scalars.momentum
        d = g + wd * p
        v_new = mu * v + d
        step = d + mu * v_new if nesterov else v_new
        return p - lr * step, v_new

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_v = treedef.flatten_up_to(opt_state.momentum_buf)
    flat_l = treedef.flatten_up_to(labels)
    new_p, new_v = [], []
    for p, g, v, lab in zip(flat_p, flat_g, flat_v, flat_l):
        np_, nv = upd(p, g, v, lab)
        new_p.append(np_)
        new_v.append(nv)
    return (jax.tree_util.tree_unflatten(treedef, new_p),
            SGDState(jax.tree_util.tree_unflatten(treedef, new_v)))


class AdamState(NamedTuple):
    step: jnp.ndarray
    m: Any
    v: Any


def adam_init(params) -> AdamState:
    zeros = lambda t: jax.tree_util.tree_map(jnp.zeros_like, t)
    return AdamState(step=jnp.zeros((), jnp.int32), m=zeros(params),
                     v=zeros(params))


def adam_update(params, grads, opt_state: AdamState, labels,
                scalars: PerGroupScalars, b1=0.9, b2=0.999, eps=1e-8):
    """torch Adam semantics (bias-corrected, wd added to grad)."""
    t = opt_state.step + 1
    bc1 = 1 - b1 ** t.astype(jnp.float32)
    bc2 = 1 - b2 ** t.astype(jnp.float32)

    def upd(p, g, m, v, lab):
        lr = scalars.lr[lab]
        wd = scalars.weight_decay[lab]
        g = g + wd * p
        m_new = b1 * m + (1 - b1) * g
        v_new = b2 * v + (1 - b2) * g * g
        step = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + eps)
        return p - lr * step, m_new, v_new

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(opt_state.m)
    flat_v = treedef.flatten_up_to(opt_state.v)
    flat_l = treedef.flatten_up_to(labels)
    new_p, new_m, new_v = [], [], []
    for p, g, m, v, lab in zip(flat_p, flat_g, flat_m, flat_v, flat_l):
        np_, nm, nv = upd(p, g, m, v, lab)
        new_p.append(np_)
        new_m.append(nm)
        new_v.append(nv)
    return (jax.tree_util.tree_unflatten(treedef, new_p),
            AdamState(step=t, m=jax.tree_util.tree_unflatten(treedef, new_m),
                      v=jax.tree_util.tree_unflatten(treedef, new_v)))


def adabound_init(params) -> AdamState:
    """AdaBound shares Adam's state shape (utils/adabound.py)."""
    return adam_init(params)


def adabound_update(params, grads, opt_state: AdamState, labels,
                    scalars: PerGroupScalars, *, base_lr: float,
                    final_lr: float = 0.1, gamma: float = 1e-3,
                    b1=0.9, b2=0.999, eps=1e-8):
    """AdaBound (utils/adabound.py:60-120): Adam with per-element step size
    clamped into [lower, upper] bounds that converge to final_lr — smoothly
    transitions Adam -> SGD. Kept for parity (the reference defines but never
    selects it)."""
    t = opt_state.step + 1
    tf = t.astype(jnp.float32)
    bc1 = 1 - b1 ** tf
    bc2 = 1 - b2 ** tf

    def upd(p, g, m, v, lab):
        lr = scalars.lr[lab]
        wd = scalars.weight_decay[lab]
        g = g + wd * p
        m_new = b1 * m + (1 - b1) * g
        v_new = b2 * v + (1 - b2) * g * g
        denom = jnp.sqrt(v_new) + eps
        step_size = lr * jnp.sqrt(bc2) / bc1
        flr = final_lr * lr / base_lr
        lower = flr * (1 - 1 / (gamma * tf + 1))
        upper = flr * (1 + 1 / (gamma * tf))
        stepped = jnp.clip(step_size / denom, lower, upper) * m_new
        return p - stepped, m_new, v_new

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(opt_state.m)
    flat_v = treedef.flatten_up_to(opt_state.v)
    flat_l = treedef.flatten_up_to(labels)
    new_p, new_m, new_v = [], [], []
    for p, g, m, v, lab in zip(flat_p, flat_g, flat_m, flat_v, flat_l):
        np_, nm, nv = upd(p, g, m, v, lab)
        new_p.append(np_)
        new_m.append(nm)
        new_v.append(nv)
    return (jax.tree_util.tree_unflatten(treedef, new_p),
            AdamState(step=t, m=jax.tree_util.tree_unflatten(treedef, new_m),
                      v=jax.tree_util.tree_unflatten(treedef, new_v)))
