"""1-D max pooling along the last axis via `lax.reduce_window`.

TPU-native replacement for the reference's uses of `F.max_pool1d`
(reference: beat_this/model/loss.py:68,122 and
beat_this/model/postprocessor.py:96). XLA lowers reduce_window to fused
vector ops on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def max_pool_1d(x: jnp.ndarray, window: int, padding: int = 0) -> jnp.ndarray:
    """Max-pool over the last axis with stride 1.

    With padding=0 the output shrinks by `window - 1` (torch 'VALID'
    behaviour used in the shift-tolerant loss); with padding=p the input is
    padded with -inf on both sides first (torch pads max-pool with -inf,
    used for peak picking with window=7, padding=3).
    """
    if window == 1 and padding == 0:
        return x
    # the init value must be a literal scalar so XLA recognizes the max
    # monoid (-> reduce_window_max primitive, which has a gradient rule)
    if jnp.issubdtype(x.dtype, jnp.floating):
        neg = -float("inf")
    else:
        neg = int(jnp.iinfo(x.dtype).min)
    dims = (1,) * (x.ndim - 1) + (window,)
    strides = (1,) * x.ndim
    pads = ((0, 0),) * (x.ndim - 1) + ((padding, padding),)
    return lax.reduce_window(x, neg, lax.max, dims, strides, pads)


@jax.jit
def peak_pick(logits: jnp.ndarray, valid_mask: jnp.ndarray) -> jnp.ndarray:
    """Batched strict-local-maximum peak picking over the last axis.

    Reproduces the device part of the reference minimal postprocessor
    (reference: beat_this/model/postprocessor.py:90-99): padded positions are
    forced to -1000, a frame is a peak iff it equals the max over a +/-3 frame
    (70 ms) window and its logit is > 0 (probability > 0.5).

    Args:
        logits: (..., T) float logits.
        valid_mask: (..., T) bool, False for padding.
    Returns:
        (..., T) bool peak mask.
    """
    x = jnp.where(valid_mask, logits.astype(jnp.float32), -1000.0)
    pooled = max_pool_1d(x, 7, padding=3)
    return (x == pooled) & (x > 0)
