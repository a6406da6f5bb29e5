"""Training task: losses + optimizer + SPMD train/eval steps.

JAX/TPU-native counterpart of the reference PLBeatThis LightningModule
(beat_this/model/pl_module.py:21-317):
  * loss = shift-tolerant BCE for beats + downbeats; the downbeat mask is the
    padding mask ANDed with the per-piece has-downbeats flag
    (reference pl_module.py:99-114),
  * AdamW with weight decay only on >=2-D parameters, cosine schedule with
    1000-step warmup stepped per optimizer step (pl_module.py:279-306),
  * gradient accumulation over `accum_steps` microbatches inside ONE jitted
    step via `lax.scan` (replacing Lightning's accumulate_grad_batches=8,
    train.py:127): batch-norm statistics advance sequentially through the
    microbatches exactly like 8 sequential forward passes, gradients average.

The step function is pure and jitted over an explicit `Mesh`: microbatches
are sharded over the "data" axis, parameters replicated; XLA lowers the
gradient averaging to an ICI all-reduce.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from beat_this_tpu.model import BeatThisConfig, apply_beat_this
from beat_this_tpu.train.loss import make_losses
from beat_this_tpu.train.schedule import cosine_warmup_schedule


@dataclass
class TrainConfig:
    """Optimization hyperparameters (defaults = reference train.py)."""

    lr: float = 8e-4
    weight_decay: float = 0.01
    warmup_steps: int = 1000
    max_steps: int = 0  # total optimizer steps (set from epochs * steps/epoch)
    accum_steps: int = 8
    loss_type: str = "shift_tolerant_weighted_bce"
    pos_weight_beat: float = 1.0
    pos_weight_downbeat: float = 1.0
    compute_dtype: str = "float32"  # or "bfloat16"


def dropout_key(seed: int) -> jax.Array:
    """PRNG key for the training dropout streams.

    Uses the `rbg` implementation when available: the model draws hundreds
    of millions of dropout bits per microbatch at the XLA sites, and
    generating them with threefry costs ~12% of the measured train step on
    TPU. rbg keeps threefry for key derivation (split/fold_in) but produces
    the bulk random bits with the hardware-friendly generator — dropout
    needs stream independence, not cryptographic quality. Falls back to the
    default implementation where rbg is unavailable."""
    try:
        return jax.random.key(seed, impl="rbg")
    except Exception:  # pragma: no cover
        return jax.random.PRNGKey(seed)


def decay_mask(params) -> Any:
    """Weight decay only for parameters with ndim >= 2 (reference
    pl_module.py:281-296, after nanoGPT)."""
    return jax.tree_util.tree_map(lambda p: jnp.ndim(p) >= 2, params)


def make_optimizer(tc: TrainConfig):
    schedule = cosine_warmup_schedule(tc.lr, tc.warmup_steps, max(tc.max_steps, 1))
    tx = optax.adamw(
        learning_rate=schedule,
        b1=0.9,
        b2=0.999,
        eps=1e-8,
        weight_decay=tc.weight_decay,
        mask=decay_mask,
    )
    return tx, schedule


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    params: Any
    bn_state: Any
    opt_state: Any
    step: jnp.ndarray


def init_train_state(params, bn_state, tc: TrainConfig) -> TrainState:
    tx, _ = make_optimizer(tc)
    return TrainState(
        params=params,
        bn_state=bn_state,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def loss_from_outputs(tc: TrainConfig, out, batch):
    """Losses given model outputs (reference _compute_loss,
    pl_module.py:99-114)."""
    beat_loss, downbeat_loss = make_losses(
        tc.loss_type,
        {"beat": tc.pos_weight_beat, "downbeat": tc.pos_weight_downbeat},
    )
    beat_mask = batch["padding_mask"].astype(jnp.float32)
    downbeat_mask = beat_mask * batch["downbeat_mask"].astype(jnp.float32)[:, None]
    lb = beat_loss(out["beat"], batch["truth_beat"].astype(jnp.float32), beat_mask)
    ld = downbeat_loss(
        out["downbeat"], batch["truth_downbeat"].astype(jnp.float32), downbeat_mask
    )
    return {"beat": lb, "downbeat": ld, "total": lb + ld}


def compute_losses(
    model_config: BeatThisConfig,
    tc: TrainConfig,
    params,
    bn_state,
    batch,
    *,
    train: bool,
    rng: Optional[jax.Array] = None,
):
    """Forward + loss for one (micro)batch. Returns (total, (new_state, parts))."""
    dtype = jnp.bfloat16 if tc.compute_dtype == "bfloat16" else jnp.float32
    out, new_state = apply_beat_this(
        params, bn_state, batch["spect"], model_config,
        train=train, rng=rng, compute_dtype=dtype,
    )
    parts = loss_from_outputs(tc, out, batch)
    return parts["total"], (new_state, parts)


def make_train_step(model_config: BeatThisConfig, tc: TrainConfig):
    """Build the jitted SPMD train step.

    The incoming batch has shape (accum_steps, microbatch, ...) per leaf; the
    scan runs the microbatches sequentially, averaging gradients and carrying
    batch-norm state, then applies one AdamW update.
    """
    tx, _ = make_optimizer(tc)
    grad_fn = jax.value_and_grad(
        lambda p, s, b, r: compute_losses(
            model_config, tc, p, s, b, train=True, rng=r
        ),
        has_aux=True,
    )

    def train_step(ts: TrainState, batch, rng: jax.Array):
        if tc.accum_steps == 1:
            # no accumulation: skip the scan entirely — a length-1 scan
            # still round-trips the full gradient pytree through the loop
            # carry, which XLA:CPU lowers to wholesale buffer copies (~4x
            # the step time measured at small scale)
            micro_batch = jax.tree_util.tree_map(lambda x: x[0], batch)
            micro_rng = jax.random.split(rng, 1)[0]  # same key the scan uses
            (_, (bn_state, parts)), grads = grad_fn(
                ts.params, ts.bn_state, micro_batch, micro_rng
            )
            updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
            params = optax.apply_updates(ts.params, updates)
            return TrainState(params, bn_state, opt_state, ts.step + 1), parts

        def micro(carry, inp):
            grads_acc, bn_state, i = carry
            micro_batch, micro_rng = inp
            (_, (new_bn, parts)), grads = grad_fn(
                ts.params, bn_state, micro_batch, micro_rng
            )
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            return (grads_acc, new_bn, i + 1), parts

        zeros = jax.tree_util.tree_map(jnp.zeros_like, ts.params)
        rngs = jax.random.split(rng, tc.accum_steps)
        (grads, bn_state, _), parts = jax.lax.scan(
            micro, (zeros, ts.bn_state, 0), (batch, rngs)
        )
        grads = jax.tree_util.tree_map(lambda g: g / tc.accum_steps, grads)
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        new_ts = TrainState(params, bn_state, opt_state, ts.step + 1)
        mean_parts = jax.tree_util.tree_map(jnp.mean, parts)
        return new_ts, mean_parts

    return train_step


def make_eval_step(model_config: BeatThisConfig, tc: TrainConfig):
    """Jitted eval: losses + logits for a batch (no dropout, BN in eval)."""

    def eval_step(params, bn_state, batch):
        dtype = jnp.bfloat16 if tc.compute_dtype == "bfloat16" else jnp.float32
        out, _ = apply_beat_this(
            params, bn_state, batch["spect"], model_config,
            train=False, compute_dtype=dtype,
        )
        parts = loss_from_outputs(tc, out, batch)
        return out, parts

    return eval_step
