"""Learning-rate schedule matching the reference CosineWarmupScheduler
(beat_this/model/pl_module.py:342-369): cosine annealing over
(1 - raise_last) * max_iters steps with a multiplicative linear warmup,
optionally re-raising to `raise_to` of the base LR for the final stretch
(for stochastic weight averaging; off by default)."""

from __future__ import annotations

import jax.numpy as jnp


def cosine_warmup_schedule(
    base_lr: float,
    warmup: int,
    max_iters: int,
    raise_last: float = 0.0,
    raise_to: float = 0.5,
):
    max_num_iters = int((1 - raise_last) * max_iters)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        progress = step / max_num_iters
        factor = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        # reference quirk: warmup multiplies the cosine factor and includes
        # the step == warmup boundary (pl_module.py:364-365)
        factor = jnp.where(step <= warmup, factor * step / warmup, factor)
        late = raise_to * jnp.minimum((step - max_num_iters) / warmup, 1.0)
        factor = jnp.where(step < max_num_iters, factor, late)
        return base_lr * factor

    return schedule
