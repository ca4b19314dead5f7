"""Loader for the runnable torch reference at /root/reference.

The reference imports ``torchvision`` (only for ``ops.boxes.nms``,
utils/utils.py:843) which is not installed; a pure-torch greedy-NMS stub is
installed into ``sys.modules`` before the reference imports run.

``/root/reference`` is appended (not prepended) to ``sys.path`` so the
reference's top-level ``train.py``/``test.py``/``detect.py`` can never shadow
this repo's same-named CLI modules; only the unique names ``models`` and
``utils`` are imported from it.
"""

from __future__ import annotations

import functools
import os
import sys
import types

REF_ROOT = '/root/reference'


def _greedy_nms(boxes, scores, iou_threshold):
    """Sequential greedy NMS, semantics of torchvision.ops.boxes.nms."""
    import torch
    order = scores.argsort(descending=True)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
    keep = []
    while order.numel() > 0:
        i = int(order[0])
        keep.append(i)
        if order.numel() == 1:
            break
        rest = order[1:]
        xx1 = torch.maximum(x1[i], x1[rest])
        yy1 = torch.maximum(y1[i], y1[rest])
        xx2 = torch.minimum(x2[i], x2[rest])
        yy2 = torch.minimum(y2[i], y2[rest])
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        iou = inter / (areas[i] + areas[rest] - inter).clamp(min=1e-12)
        order = rest[iou <= iou_threshold]
    return torch.as_tensor(keep, dtype=torch.long)


def _install_terminaltables_stub():
    """prune_utils imports terminaltables.AsciiTable for pretty printing only."""
    if 'terminaltables' in sys.modules:
        return
    tt = types.ModuleType('terminaltables')

    class AsciiTable:
        def __init__(self, table_data, title=None):
            self.table_data = table_data
            self.title = title

        @property
        def table(self):
            return '\n'.join(' | '.join(str(c) for c in row)
                             for row in self.table_data)

    tt.AsciiTable = AsciiTable
    sys.modules['terminaltables'] = tt


def install_torchvision_stub():
    _install_terminaltables_stub()
    if 'torchvision' in sys.modules:
        return
    tv = types.ModuleType('torchvision')
    ops = types.ModuleType('torchvision.ops')
    boxes_mod = types.ModuleType('torchvision.ops.boxes')
    boxes_mod.nms = _greedy_nms
    ops.boxes = boxes_mod
    ops.nms = _greedy_nms
    tv.ops = ops
    tv.__version__ = '0.0.0+nms-stub'
    sys.modules['torchvision'] = tv
    sys.modules['torchvision.ops'] = ops
    sys.modules['torchvision.ops.boxes'] = boxes_mod


def _install_numpy_legacy_aliases():
    """The reference predates numpy 1.24 (np.int in utils/datasets.py:278,
    np.float elsewhere); restore the removed builtin aliases in-process."""
    import numpy as np
    for name, typ in (('int', int), ('float', float), ('bool', bool),
                      ('object', object)):
        if not hasattr(np, name):
            setattr(np, name, typ)


def _enable_cpu_cuda_shim():
    """prune_model_keep_size hard-codes .cuda() (prune_utils.py:267-269);
    make it a no-op on this CPU-only box."""
    import torch
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self


@functools.lru_cache(maxsize=1)
def load_reference():
    """Import the reference's model/utils modules; returns a namespace."""
    os.environ.setdefault('MPLBACKEND', 'Agg')
    install_torchvision_stub()
    _install_numpy_legacy_aliases()
    _enable_cpu_cuda_shim()
    if REF_ROOT not in sys.path:
        sys.path.append(REF_ROOT)
    import models as ref_models                       # noqa: E402
    from utils import utils as ref_utils              # noqa: E402
    from utils import prune_utils as ref_prune        # noqa: E402
    from utils import parse_config as ref_parse       # noqa: E402
    from utils.quantized import quantized_google      # noqa: E402
    from utils.quantized import quantized_dorefa      # noqa: E402
    ns = types.SimpleNamespace(
        models=ref_models, utils=ref_utils, prune_utils=ref_prune,
        parse_config=ref_parse, quantized_google=quantized_google,
        quantized_dorefa=quantized_dorefa)
    return ns


def randomize_reference_model(model, seed: int = 0, conv_scale: float = 1.0):
    """Seeded, magnitude-controlled re-init of every conv/BN/SE parameter so
    deep random networks stay numerically tame in eval mode (torch's default
    init with identity running stats can drift over ~100 layers).

    conv_scale: damp factor on the kaiming std — residual towers (yolov3/v4)
    double activation variance per block under unit-gain init, so ~0.6 keeps
    their head outputs O(10) and comparison tolerances meaningful."""
    import torch
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.Conv2d):
                fan_in = m.weight.shape[1] * m.weight.shape[2] * m.weight.shape[3]
                std = conv_scale * (2.0 / max(fan_in, 1)) ** 0.5
                m.weight.normal_(0.0, std, generator=g)
                if m.bias is not None:
                    m.bias.uniform_(-0.05, 0.05, generator=g)
            elif isinstance(m, torch.nn.BatchNorm2d):
                m.weight.uniform_(0.6, 1.4, generator=g)
                m.bias.normal_(0.0, 0.1, generator=g)
                m.running_mean.normal_(0.0, 0.3, generator=g)
                m.running_var.uniform_(0.5, 2.0, generator=g)
            elif isinstance(m, torch.nn.Linear):
                m.weight.normal_(0.0, 0.05, generator=g)
                if m.bias is not None:
                    m.bias.zero_()
    return model
