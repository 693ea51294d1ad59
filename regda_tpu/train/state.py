"""Training state: one pytree threaded through a single jit'd step.

The reference's cross-step mutable state — model params + BN running stats,
SGD momentum buffers, `Aligner.prototypes` EMA (alignment.py:54-60),
`ClassBalance.freq` EMAs (balance.py:25), GHM bin histograms
(balance.py:171) and the RNG — becomes one explicit TrainState, replicated
across the mesh (batch statistics are global reductions over the sharded
batch, so every replica computes identical updates).

Optimizer parity (tools/train_src.py:106-141): SGD(lr poly+warmup,
momentum 0.9, weight_decay 5e-4) with grad-clip(norm 32) applied *before*
weight decay, matching torch's clip_grad_norm_ + SGD(weight_decay=...)
ordering.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from regda_tpu.ops.losses import ClassBalanceState, GHMState
from regda_tpu.ops.schedule import poly_warmup_lr


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    prototypes: jnp.ndarray          # (C, K)
    class_freq_s: ClassBalanceState
    class_freq_t: ClassBalanceState
    ghm: GHMState
    rng: jax.Array

    @property
    def variables(self):
        return {'params': self.params, 'batch_stats': self.batch_stats}


def make_optimizer(base_lr: float, stop_steps: int, momentum: float = 0.9,
                   weight_decay: float = 5e-4, clip_norm: float = 32.0,
                   power: float = 0.9):
    schedule = lambda count: poly_warmup_lr(count, base_lr, stop_steps,
                                            power=power)
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(schedule),
    )


def create_train_state(model, tx, rng, input_shape=(1, 512, 512, 3),
                       num_classes: int = 6, feat_dim: int = 2048,
                       variables: Optional[dict] = None) -> TrainState:
    if variables is None:
        variables = model.init({'params': rng}, jnp.zeros(input_shape),
                               train=False)
    variables = jax.tree.map(jnp.asarray, variables)
    params = variables['params']
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get('batch_stats', {}),
        opt_state=tx.init(params),
        prototypes=jnp.zeros((num_classes, feat_dim), jnp.float32),
        class_freq_s=ClassBalanceState.create(num_classes),
        class_freq_t=ClassBalanceState.create(num_classes),
        ghm=GHMState.create(),
        rng=rng,
    )
