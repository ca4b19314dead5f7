"""Darknet ``.cfg`` / ``.data`` parsing and hyper-parameter handling.

Behavioural contract follows the reference parser
(/root/reference/utils/parse_config.py:6-70) exactly, including its quirks:

- ``anchors`` -> float ndarray reshaped (-1, 2).
- ``from``/``layers``/``mask`` (and comma ``size``) -> list[int].
- values that are pure digit strings -> int; anything else (including floats
  like ``0.9``) stays a *string* — downstream code casts where needed.
- a field whitelist is enforced over all blocks after ``[net]``.

The hyp dict mirrors the reference trainer defaults (train.py:25-42).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

# Field whitelist, as in reference utils/parse_config.py:40-43.
SUPPORTED_FIELDS = [
    'type', 'batch_normalize', 'filters', 'size', 'stride', 'pad', 'activation',
    'layers', 'groups', 'reduction', 'from', 'mask', 'anchors', 'classes', 'num',
    'jitter', 'ignore_thresh', 'truth_thresh', 'random', 'stride_x', 'stride_y',
    'weights_type', 'weights_normalization', 'scale_x_y', 'beta_nms', 'nms_kind',
    'iou_loss', 'iou_normalizer', 'cls_normalizer', 'iou_thresh', 'group_id',
    'resize',
    # extension over the reference whitelist: [dropout] blocks appear in the
    # efficientnetB0 zoo cfg but the reference parser rejects them
    # (parse_config.py:40-49 would assert) — we support them instead.
    'probability',
    # 'share_index' appears in yolov3-spp-matrix.cfg (also rejected by the
    # reference parser); accepted and ignored here.
    'share_index',
]


def parse_model_cfg(path: str | os.PathLike) -> list[dict]:
    """Parse a Darknet .cfg into a list of block dicts (first block = [net])."""
    path = str(path)
    if not path.endswith('.cfg'):
        path += '.cfg'
    if not os.path.exists(path) and os.path.exists(os.path.join('cfg', path)):
        path = os.path.join('cfg', path)

    with open(path, 'r') as f:
        lines = f.read().split('\n')
    lines = [x for x in lines if x and not x.startswith('#')]
    lines = [x.strip() for x in lines]

    mdefs: list[dict] = []
    for line in lines:
        if line.startswith('['):
            mdefs.append({})
            mdefs[-1]['type'] = line[1:-1].rstrip()
            if mdefs[-1]['type'] == 'convolutional':
                # pre-populate; may be overwritten (reference parse_config.py:22-23)
                mdefs[-1]['batch_normalize'] = 0
        else:
            key, val = line.split('=')
            key = key.rstrip()
            if key == 'anchors':
                mdefs[-1][key] = np.array(
                    [float(x) for x in val.split(',')]).reshape((-1, 2))
            elif (key in ('from', 'layers', 'mask')) or (key == 'size' and ',' in val):
                mdefs[-1][key] = [int(x) for x in val.split(',')]
            else:
                val = val.strip()
                if val.isnumeric():
                    mdefs[-1][key] = int(val) if (int(val) - float(val)) == 0 else float(val)
                else:
                    mdefs[-1][key] = val

    fields: list[str] = []
    for blk in mdefs[1:]:
        for k in blk:
            if k not in fields:
                fields.append(k)
    unsupported = [x for x in fields if x not in SUPPORTED_FIELDS]
    assert not unsupported, f'Unsupported fields {unsupported} in {path}'
    return mdefs


def parse_data_cfg(path: str | os.PathLike) -> dict[str, str]:
    """Parse a .data dataset descriptor (classes/train/valid/names keys)."""
    path = str(path)
    if not os.path.exists(path):
        for prefix in ('data', 'data_cfg'):
            cand = os.path.join(prefix, os.path.basename(path))
            if os.path.exists(cand):
                path = cand
                break
    options: dict[str, str] = {}
    with open(path, 'r') as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith('#'):
                continue
            key, val = line.split('=')
            options[key.strip()] = val.strip()
    return options


def load_classes(path: str | os.PathLike) -> list[str]:
    """Load class names from a .names file (reference utils/utils.py:38-41).

    Falls back to recursive-glob location so `.data` files that reference
    `data/foo.names` resolve when the names live under `data_cfg/`.
    """
    path = str(path)
    if not os.path.exists(path):
        path = find_file(path)
    with open(str(path), 'r') as f:
        names = f.read().split('\n')
    return list(filter(None, names))


# Default hyper-parameters — reference train.py:25-42 (coco-tuned).
DEFAULT_HYP = {
    'giou': 3.54,        # giou loss gain
    'cls': 37.4,         # cls loss gain
    'cls_pw': 1.0,       # cls BCELoss positive_weight
    'obj': 64.3,         # obj loss gain (*=img_size/320 if img_size != 320)
    'obj_pw': 1.0,       # obj BCELoss positive_weight
    'iou_t': 0.20,       # iou training threshold
    'lr0': 0.001,        # initial learning rate
    'lrf': 0.0005,       # final learning rate
    'momentum': 0.937,
    'weight_decay': 0.000484,
    'fl_gamma': 0.0,     # focal loss gamma (efficientDet default is gamma=1.5)
    'hsv_h': 0.0138,     # image HSV-Hue augmentation (fraction)
    'hsv_s': 0.678,      # image HSV-Saturation augmentation (fraction)
    'hsv_v': 0.36,       # image HSV-Value augmentation (fraction)
    'degrees': 1.98 * 0, # image rotation (+/- deg)
    'translate': 0.05 * 0,
    'scale': 0.05 * 0,
    'shear': 0.641 * 0,
}


def load_hyp(hyp_txt: str | None = None) -> dict:
    """Return hyp dict, optionally overridden by a hyp*.txt file
    (reference train.py:45-49)."""
    hyp = dict(DEFAULT_HYP)
    if hyp_txt:
        for line in Path(hyp_txt).read_text().splitlines()[2:]:
            parts = line.split()
            if len(parts) >= 2:
                hyp[parts[0]] = float(parts[1])
    return hyp


def find_file(path: str, roots: tuple[str, ...] = ('.', 'cfg', 'data_cfg', 'data')) -> str:
    """Recursive-glob file location, mirroring reference train.py:639."""
    if os.path.exists(path):
        return path
    base = os.path.basename(path)
    for root in roots:
        if not os.path.isdir(root):
            continue
        hits = sorted(Path(root).rglob(base))
        if hits:
            return str(hits[0])
    raise FileNotFoundError(path)
