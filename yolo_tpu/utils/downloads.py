"""Pretrained-weight download helpers (reference utils/google_utils.py,
models.py:816-843 attempt_download).

This deployment runs with zero network egress; the helpers resolve local
files and raise with the canonical URLs when a download would be needed.
"""

from __future__ import annotations

import os
from pathlib import Path

KNOWN_WEIGHTS = {
    'yolov3-spp.weights', 'yolov3.weights', 'yolov3-tiny.weights',
    'yolov3-spp.pt', 'yolov3.pt', 'yolov3-tiny.pt',
    'darknet53.conv.74', 'yolov3-tiny.conv.15', 'yolov3-spp-ultralytics.pt',
}


def attempt_download(weights: str) -> str:
    """Return a usable local path or raise with download guidance."""
    weights = str(weights).strip().replace("'", '')
    if not weights or os.path.isfile(weights):
        return weights
    name = Path(weights).name
    hint = (f'https://pjreddie.com/media/files/{name}'
            if name in KNOWN_WEIGHTS else '(unknown file)')
    raise FileNotFoundError(
        f'{weights} missing. Network egress is disabled in this environment; '
        f'fetch it manually, e.g. from {hint}, and place it at {weights}.')
