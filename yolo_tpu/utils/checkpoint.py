"""Checkpoint / resume (reference train.py:562-573, 169-180).

Checkpoint contract mirrors the reference dict {epoch, best_fitness,
training_results, model, optimizer} but stores pytrees as flat
path-keyed arrays in a single ``.npz`` — no pickle, portable, and
mmap-friendly for large models. ``strip_optimizer``
(utils/utils.py:887-891) drops the optimizer arrays in place.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

_SEP = '/'
_META_KEY = '__meta__'


def _flatten(tree, prefix=''):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f'{prefix}{k}{_SEP}'))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f'{prefix}#{i}{_SEP}'))
    elif hasattr(tree, '_fields'):  # NamedTuple
        for k in tree._fields:
            out.update(_flatten(getattr(tree, k), f'{prefix}{k}{_SEP}'))
    elif tree is None:
        out[prefix.rstrip(_SEP) + '!none'] = np.zeros(0)
    else:
        out[prefix.rstrip(_SEP)] = np.asarray(tree)
    return out


def _unflatten(flat: dict):
    tree: dict = {}
    for path, arr in flat.items():
        if path.endswith('!none'):
            path, arr = path[:-len('!none')], None
        parts = path.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    def fix(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.startswith('#') for k in keys):
            return [fix(node[f'#{i}']) for i in range(len(keys))]
        return {k: fix(v) for k, v in node.items()}
    return fix(tree)


def save_checkpoint(path, *, params, state, epoch: int = -1,
                    best_fitness: float = 0.0, training_results: str = '',
                    opt_state: Any = None, ema: Any = None,
                    ema_state: Any = None, qstate: Any = None,
                    extra: dict | None = None):
    os.makedirs(os.path.dirname(str(path)) or '.', exist_ok=True)
    payload = {'params': params, 'state': state}
    if opt_state is not None:
        payload['opt_state'] = opt_state
    if ema is not None:
        # the deployable copy: eval/fitness during training run on the EMA
        # weights (reference train.py:551-556 saves ema.ema.state_dict() AS
        # the model), so checkpoints must ship them — runtime.load_model
        # prefers 'ema'/'ema_state' for inference; 'params'/'state' keep the
        # raw trajectory for --resume
        payload['ema'] = ema
    if ema_state is not None:
        payload['ema_state'] = ema_state
    if qstate is not None:
        # quantizer calibration (scales/trackers/BN-fold stats) — the
        # reference persists these as state_dict buffers in every .pt
        # (quantized_google.py registered buffers); without them a QAT
        # checkpoint reloads uncalibrated
        payload['qstate'] = qstate
    flat = _flatten(payload)
    meta = {'epoch': int(epoch), 'best_fitness': float(best_fitness),
            'training_results': training_results, **(extra or {})}
    flat[_META_KEY] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    np.savez(str(path), **flat)


def load_checkpoint(path):
    """Returns dict with keys params/state[/opt_state][/ema] + meta fields."""
    data = np.load(str(path), allow_pickle=False)
    flat = {k: data[k] for k in data.files if k != _META_KEY}
    tree = _unflatten(flat)
    meta = json.loads(bytes(data[_META_KEY]).decode()) if _META_KEY in data.files else {}
    tree.update(meta)
    return tree


def strip_optimizer(path):
    """Remove optimizer arrays from a checkpoint file in place
    (utils/utils.py:887-891). The reference checkpoint's 'model' entry IS
    the EMA state_dict (train.py:551-556), so the stripped artifact keeps
    the EMA weights: here the EMA copy is promoted to params/state and the
    raw trajectory dropped — the result is deploy-only, not resumable."""
    ck = load_checkpoint(path)
    # promote the EMA copy only as a PAIR (params + BN state) — mixing EMA
    # params with raw running stats is a combination no eval measured
    if ck.get('ema') is not None and ck.get('ema_state') is not None:
        params, state = ck['ema'], ck['ema_state']
    else:
        params, state = ck['params'], ck['state']
    save_checkpoint(path, params=params, state=state,
                    epoch=ck.get('epoch', -1),
                    best_fitness=ck.get('best_fitness', 0.0),
                    training_results=ck.get('training_results', ''),
                    qstate=ck.get('qstate'))
