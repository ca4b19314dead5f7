"""LR schedules and burn-in ramps (reference train.py:196-202, 356-365).

All return plain floats/arrays; they are evaluated per optimizer step on the
host (cheap scalars) and passed into the jitted train step as traced args.
"""

from __future__ import annotations

import math

import numpy as np

from .optim import GROUP_BIAS, PerGroupScalars


def cosine_lf(epoch: float, epochs: int) -> float:
    """Reference cosine schedule factor (train.py:199-200):
    ((1+cos(x*pi/epochs))/2)**1.0 * 0.95 + 0.05."""
    return ((1 + math.cos(epoch * math.pi / epochs)) / 2) * 0.95 + 0.05


def multistep_lf(epoch: float, epochs: int, gamma: float = 0.3) -> float:
    """MultiStepLR used for quantized training (train.py:197-198):
    milestones at epochs//5, epochs//2, epochs//1.25."""
    milestones = [epochs // 5, epochs // 2, int(epochs // 1.25)]
    return gamma ** sum(epoch >= m for m in milestones)


def burn_in_scalars(ni: int, n_burn: int, epoch: float, *, lr0: float,
                    momentum: float, weight_decay: float, epochs: int,
                    batch_size: int, quantized: bool = False,
                    adam: bool = False) -> tuple[PerGroupScalars, float, int]:
    """Per-step optimizer scalars + giou-ratio + accumulate count.

    Replicates reference burn-in interpolation (train.py:356-365): bias-group
    lr falls from 0.1, other groups rise from 0; weight decay ramps 0 -> wd
    on the weight group; momentum ramps 0.9 -> momentum; model.gr ramps 0->1;
    accumulate ramps 1 -> 64/bs.
    """
    lf = (multistep_lf if quantized else cosine_lf)(epoch, epochs)
    base_lr = (lr0 * 0.005 if (adam or quantized) else lr0) * lf
    lrs = np.full(4, base_lr, np.float32)
    wds = np.zeros(4, np.float32)
    wds[0] = weight_decay
    mu = momentum
    gr = 1.0
    accumulate = max(round(64 / batch_size), 1)
    if ni <= n_burn and not quantized:
        f = ni / max(n_burn, 1)
        gr = f
        accumulate = max(1, round(np.interp(ni, [0, n_burn],
                                            [1, 64 / batch_size])))
        for g in range(4):
            start = 0.1 if g == GROUP_BIAS else 0.0
            lrs[g] = np.interp(ni, [0, n_burn], [start, base_lr])
        wds[0] = np.interp(ni, [0, n_burn], [0.0, weight_decay])
        mu = np.interp(ni, [0, n_burn], [0.9, momentum])
    import jax.numpy as jnp
    return (PerGroupScalars(lr=jnp.asarray(lrs), weight_decay=jnp.asarray(wds),
                            momentum=jnp.asarray(mu, jnp.float32)),
            float(gr), int(accumulate))
