"""Exponential moving average of params + BN state.

Reference ModelEMA (utils/torch_utils.py:141-189): decay ramps as
0.9999 * (1 - exp(-updates/2000)) and covers parameters AND buffers.
Here it is a pure pytree op living alongside the optimizer state.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    updates: jnp.ndarray   # int32 counter
    params: Any
    state: Any             # BN running stats


def ema_init(params, state) -> EMAState:
    # real copies, not aliases: the train step donates its TrainState, and
    # donation rejects the same buffer appearing twice (params + ema.params)
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
    return EMAState(updates=jnp.zeros((), jnp.int32), params=copy(params),
                    state=copy(state))


def ema_update(ema: EMAState, params, state, decay: float = 0.9999) -> EMAState:
    u = ema.updates + 1
    d = decay * (1.0 - jnp.exp(-u.astype(jnp.float32) / 2000.0))
    blend = lambda e, m: jax.tree_util.tree_map(
        lambda a, b: d * a + (1.0 - d) * b, e, m)
    return EMAState(updates=u, params=blend(ema.params, params),
                    state=blend(ema.state, state))
