"""Learning-rate schedule: linear warmup + poly decay.

Parity target: regda/utils/tools.py:191-207 (`lr_poly`, `lr_warmup`,
`adjust_learning_rate`): warmup for PREHEAT_STEPS = stop_steps/20, then
base_lr * (1 - i/NUM_STEPS)^power with NUM_STEPS = stop_steps * 1.5
(tools/train_src.py:55-56).
"""

from __future__ import annotations

import jax.numpy as jnp


def poly_warmup_lr(step, base_lr: float, stop_steps: int,
                   power: float = 0.9, warmup_frac: float = 1.0 / 20.0,
                   total_mult: float = 1.5):
    """Returns the lr for `step` (int or traced scalar)."""
    preheat = int(stop_steps * warmup_frac)
    num_steps = stop_steps * total_mult
    step = jnp.asarray(step, jnp.float32)
    warm = base_lr * step / max(preheat, 1)
    poly = base_lr * (1.0 - step / num_steps) ** power
    return jnp.where(step < preheat, warm, poly)
