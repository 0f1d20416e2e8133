"""TrainState: params + BN stats + optimizer state + step, as one donated pytree."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar
    ema_params: Any = None  # EMA shadow of params (model_ema_decay > 0)
    ema_batch_stats: Any = None  # EMA shadow of BN stats (ModelEmaV2 smooths buffers too)

    @classmethod
    def create(cls, params, batch_stats, tx, ema: bool = False):
        # Copy: the jitted train step DONATES the state, which would otherwise
        # invalidate the caller's (the model's) own param buffers after step 1.
        params = jax.tree_util.tree_map(jnp.array, params)
        batch_stats = jax.tree_util.tree_map(jnp.array, batch_stats)
        return cls(
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
            # the EMA shadow starts at the initial params (torch ModelEmaV2)
            ema_params=jax.tree_util.tree_map(jnp.array, params) if ema else None,
            ema_batch_stats=(jax.tree_util.tree_map(jnp.array, batch_stats)
                             if ema else None),
        )
