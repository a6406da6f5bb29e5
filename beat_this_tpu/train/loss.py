"""Training losses, JAX/TPU-native.

Re-implements the reference loss family (beat_this/model/loss.py): plain
masked weighted BCE and the shift-tolerant variant where predictions are
max-pooled with stride 1 over +/-tolerance frames so a positive label
rewards the strongest nearby prediction. Max-pooling maps to
`lax.reduce_window`; everything fuses into one XLA kernel.

Semantics notes (kept bit-compatible with torch):
  * BCE-with-logits means: mean over ALL elements of
    weight * (pos_weight * t * softplus(-x) + (1 - t) * softplus(x)) —
    the weight does NOT renormalize the mean.
  * `spread` pools with VALID padding, shrinking by 2*factor*tolerance;
    `crop` trims targets/mask to match (reference loss.py:65-71).
  * ignore region: frames within 2*tolerance of a positive target, except
    the positives themselves, get weight 0 (reference loss.py:83).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from beat_this_tpu.ops.pool import max_pool_1d


def bce_with_logits(
    preds: jnp.ndarray,
    targets: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    pos_weight: float = 1.0,
) -> jnp.ndarray:
    """Elementwise binary cross entropy with logits, mean-reduced, matching
    `F.binary_cross_entropy_with_logits(weight=..., pos_weight=...)`."""
    preds = preds.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    log_sig = jax.nn.log_sigmoid(preds)
    log_one_minus = jax.nn.log_sigmoid(-preds)
    loss = -(pos_weight * targets * log_sig + (1.0 - targets) * log_one_minus)
    if weight is not None:
        loss = loss * weight.astype(jnp.float32)
    return jnp.mean(loss)


class MaskedBCELoss:
    """Reference MaskedBCELoss (loss.py:9-35)."""

    def __init__(self, pos_weight: float = 1.0):
        self.pos_weight = float(pos_weight)

    def __call__(self, preds, targets, mask=None):
        return bce_with_logits(preds, targets, mask, self.pos_weight)


class ShiftTolerantBCELoss:
    """Reference ShiftTolerantBCELoss (loss.py:38-92)."""

    def __init__(self, pos_weight: float = 1.0, tolerance: int = 3):
        self.pos_weight = float(pos_weight)
        self.tolerance = int(tolerance)

    def spread(self, x, factor: int = 1):
        if self.tolerance == 0:
            return x
        return max_pool_1d(x, 1 + 2 * factor * self.tolerance, padding=0)

    def crop(self, x, factor: int = 1):
        c = factor * self.tolerance
        return x[..., c : x.shape[-1] - c]

    def __call__(self, preds, targets, mask=None):
        targets = targets.astype(jnp.float32)
        spread_preds = self.crop(self.spread(preds.astype(jnp.float32)))
        cropped_targets = self.crop(targets, factor=2)
        look_at = cropped_targets + (1.0 - self.spread(targets, factor=2))
        if mask is not None:
            look_at = look_at * self.crop(mask.astype(jnp.float32), factor=2)
        return bce_with_logits(
            spread_preds, cropped_targets, look_at, self.pos_weight
        )


class SplittedShiftTolerantBCELoss:
    """Reference SplittedShiftTolerantBCELoss (loss.py:95-160): paper-equation
    form with separate positive/negative terms; identical to
    ShiftTolerantBCELoss on binary targets."""

    def __init__(self, pos_weight: float = 1.0, tolerance: int = 3):
        self.pos_weight = float(pos_weight)
        self.spread_preds = int(tolerance)
        self.spread_targets = 2 * int(tolerance)

    def _spread(self, x, amount):
        return max_pool_1d(x, 1 + 2 * amount, padding=0) if amount else x

    def _crop(self, x, desired_length):
        amount = (x.shape[-1] - desired_length) // 2
        if amount < 0:
            raise ValueError("Desired length must be smaller than input length")
        return x[..., amount : x.shape[-1] - amount] if amount else x

    def __call__(self, preds, targets, mask):
        preds = preds.astype(jnp.float32)
        targets = targets.astype(jnp.float32)
        mask = mask.astype(jnp.float32)
        output_length = targets.shape[-1] - 2 * self.spread_targets
        spread_preds = self._spread(preds, self.spread_preds)
        cropped_preds = self._crop(spread_preds, output_length)
        cropped_targets = self._crop(targets, output_length)
        cropped_mask = self._crop(mask, output_length)
        loss_positive = bce_with_logits(
            cropped_preds, cropped_targets,
            cropped_targets * cropped_mask, self.pos_weight,
        )
        spread_targets = self._spread(targets, self.spread_targets)
        cropped_spread_targets = self._crop(spread_targets, output_length)
        loss_negative = bce_with_logits(
            cropped_preds, cropped_spread_targets,
            (1.0 - cropped_spread_targets) * cropped_mask, self.pos_weight,
        )
        return loss_positive + loss_negative


LOSSES = {
    "shift_tolerant_weighted_bce": ShiftTolerantBCELoss,
    "splitted_shift_tolerant_weighted_bce": SplittedShiftTolerantBCELoss,
    "weighted_bce": MaskedBCELoss,
    "bce": MaskedBCELoss,
}


def make_losses(loss_type: str, pos_weights: dict):
    """Build (beat_loss, downbeat_loss) per the reference's selection logic
    (beat_this/model/pl_module.py:64-91); "bce" ignores pos_weights."""
    if loss_type not in LOSSES:
        raise ValueError(
            "loss_type must be one of 'shift_tolerant_weighted_bce', "
            "'splitted_shift_tolerant_weighted_bce', 'weighted_bce', 'bce'"
        )
    cls = LOSSES[loss_type]
    if loss_type == "bce":
        return cls(), cls()
    return cls(pos_weight=pos_weights["beat"]), cls(pos_weight=pos_weights["downbeat"])
