"""Activation functions (reference utils/layers.py:103-192, models.py:102-113).

All are pure jnp element-wise ops — XLA fuses them into the preceding
convolution, so there is no need for the reference's "memory-efficient"
custom-autograd variants (rematerialisation is handled by jax.checkpoint
at the train-step level instead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def leaky(x, slope: float = 0.1):
    return jax.nn.leaky_relu(x, negative_slope=slope)


def relu(x):
    return jax.nn.relu(x)


def relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def hard_swish(x):
    # x * relu6(x + 3) / 6  (reference utils/layers.py:159-164)
    return x * (jnp.clip(x + 3.0, 0.0, 6.0) / 6.0)


def hard_sigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def swish(x):
    return x * jax.nn.sigmoid(x)


def mish(x):
    # x * tanh(softplus(x)) (reference utils/layers.py:146-148)
    return x * jnp.tanh(jax.nn.softplus(x))


def logistic(x):
    # darknet name for sigmoid (efficientnetB0 zoo cfg SE gates)
    return jax.nn.sigmoid(x)


def linear(x):
    return x


_BY_NAME = {
    'leaky': leaky,
    'relu': relu,
    'relu6': relu6,
    'h_swish': hard_swish,
    'h_sigmoid': hard_sigmoid,
    'swish': swish,
    'mish': mish,
    'logistic': logistic,
    'linear': linear,
    # 'none' appears in the ghostnet cfgs; the reference's create_modules
    # only attaches an activation module on an exact name match
    # (models.py:102-117), so unmatched names are identity
    'none': linear,
    '': linear,
}


def get(name: str, maxabsscaler: bool = False):
    """Resolve an activation by cfg name.

    ``maxabsscaler`` switches leaky slope 0.1 -> 0.25 (reference models.py:103),
    used with (-1, 1) input normalisation for FPGA-friendly pow-2 arithmetic.
    """
    if name == 'leaky' and maxabsscaler:
        return lambda x: leaky(x, 0.25)
    try:
        return _BY_NAME[name]
    except KeyError:
        raise ValueError(f'Unsupported activation: {name!r}') from None
