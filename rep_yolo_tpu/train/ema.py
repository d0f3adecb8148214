"""Model EMA as a pure pytree op (reference utils/torch_utils.py:269-303).

decay(t) = 0.9999 * (1 - exp(-t / 2000)); applied to params AND
batch_stats (the reference EMAs the full float state_dict, which includes
BN running stats). Eval/checkpoint use the EMA weights (reference
train.py:428,467).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    updates: jax.Array   # int32 counter
    variables: Any       # {'params': ..., 'batch_stats': ...} shadow copy


def init_ema(variables) -> EMAState:
    # jnp.copy (not asarray): the shadow tree must own distinct buffers, or
    # donating a TrainState donates the same buffer twice (params and
    # ema.variables.params would alias).
    return EMAState(updates=jnp.zeros((), jnp.int32),
                    variables=jax.tree.map(jnp.copy, variables))


def update_ema(state: EMAState, variables, decay: float = 0.9999,
               tau: float = 2000.0) -> EMAState:
    updates = state.updates + 1
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))
    new = jax.tree.map(lambda e, v: e * d + (1.0 - d) * v,
                       state.variables, variables)
    return EMAState(updates=updates, variables=new)
