"""Exponential moving average of model weights.

Parity target: regda/utils/ema.py:34-65 (`ExponentialMovingAverage`;
imported by train_ssl_reg.py:26 but never instantiated in the reference —
kept for inventory). The reference mutates `param.data` in place
(register/update/apply_shadow/restore); here the shadow is an explicit
pytree threaded through the train step, so it jits and shards like any
other state.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax


class EmaState(NamedTuple):
    shadow: Any  # pytree mirroring params


def ema_register(params) -> EmaState:
    """Snapshot current params as the shadow (ema.py:41-44)."""
    return EmaState(shadow=jax.tree_util.tree_map(lambda p: p, params))


def ema_update(state: EmaState, params, decay: float) -> EmaState:
    """shadow <- decay * shadow + (1 - decay) * params (ema.py:46-51)."""
    new_shadow = jax.tree_util.tree_map(
        lambda s, p: decay * s + (1.0 - decay) * p, state.shadow, params)
    return EmaState(shadow=new_shadow)


def ema_apply_shadow(state: EmaState, params):
    """Returns (shadow_params_to_use, backup_of_current) — the functional
    analog of apply_shadow/restore (ema.py:53-65): evaluate with the first,
    continue training with the second."""
    return state.shadow, params
