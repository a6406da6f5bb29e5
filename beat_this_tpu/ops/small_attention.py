"""Packed attention for very short sequences (the frontend's frequency axis).

The frequency-axis partial transformers attend over only F in {32, 16, 8}
positions, but for batch*time = 24k independent items — thousands of tiny
(F x F) attention problems. Dispatched through XLA these lower to a loop of
lane-padded micro-matmuls with the probability tensor bouncing through HBM.

This Pallas kernel packs 128 // F items into one dense (128, 128) score
matrix (items are independent, so the scores are block-diagonal; off-diagonal
blocks are masked to -inf before the softmax), keeping the probabilities in
VMEM. Heads are folded into the item dimension beforehand — each head is
just another independent F-length attention problem.

Equivalent to `sdpa` on (items, F, D); exact softmax (no online recurrence
needed — everything fits in registers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _MEMORY_SPACE = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _MEMORY_SPACE = None

_PACK_ROWS = 128  # rows per packed score matrix
_PACKS_PER_PROGRAM = 16


def _small_attn_kernel(q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref, *, f,
                       scale, packs):
    from beat_this_tpu.ops.flash_attention import rope_rotate

    rows = _PACK_ROWS
    # same-item mask for the packed block-diagonal scores
    row_item = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0) // f
    col_item = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1) // f
    same = row_item == col_item
    cos = cos_ref[:, :]
    sin = sin_ref[:, :]
    for p in range(packs):
        sl = pl.ds(p * rows, rows)
        q = rope_rotate(q_ref[sl, :].astype(jnp.float32), cos, sin) * scale
        k = rope_rotate(k_ref[sl, :].astype(jnp.float32), cos, sin)
        v = v_ref[sl, :]
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(same, s, -jnp.inf)
        s = s - jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s)
        probs = e / jnp.sum(e, axis=1, keepdims=True)
        o_ref[sl, :] = jax.lax.dot_general(
            probs.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def small_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    interpret: bool = False,
    rope_cos=None,
    rope_sin=None,
) -> jnp.ndarray:
    """Attention over (items, F, D) with F in {8, 16, 32} (or any divisor of
    128) and 1/sqrt(D) scaling. Items are independent problems. Optional
    half-width RoPE tables (F, D//2) are applied to q and k in-kernel."""
    n, f, d = q.shape
    if _PACK_ROWS % f != 0:
        raise ValueError(f"sequence length {f} must divide {_PACK_ROWS}")
    scale = d**-0.5
    per_program = _PACK_ROWS * _PACKS_PER_PROGRAM
    total_rows = n * f
    padded_rows = -(-total_rows // per_program) * per_program

    if rope_cos is None:
        cosf = jnp.ones((_PACK_ROWS, d), jnp.float32)
        sinf = jnp.zeros((_PACK_ROWS, d), jnp.float32)
    else:
        cosf = jnp.tile(
            jnp.repeat(rope_cos.astype(jnp.float32), 2, axis=-1),
            (_PACK_ROWS // f, 1),
        )
        sinf = jnp.tile(
            jnp.repeat(rope_sin.astype(jnp.float32), 2, axis=-1),
            (_PACK_ROWS // f, 1),
        )

    def flat_pad(x):
        x = x.reshape(total_rows, d)
        return jnp.pad(x, ((0, padded_rows - total_rows), (0, 0)))

    qp, kp, vp = flat_pad(q), flat_pad(k), flat_pad(v)
    kwargs = {}
    if _MEMORY_SPACE is not None and not interpret:
        kwargs["memory_space"] = _MEMORY_SPACE
    spec = pl.BlockSpec((per_program, d), lambda i: (i, 0), **kwargs)
    tab_spec = pl.BlockSpec((_PACK_ROWS, d), lambda i: (0, 0), **kwargs)
    out = pl.pallas_call(
        functools.partial(
            _small_attn_kernel, f=f, scale=scale, packs=_PACKS_PER_PROGRAM
        ),
        grid=(padded_rows // per_program,),
        in_specs=[spec, spec, spec, tab_spec, tab_spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((padded_rows, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, cosf, sinf)
    return out[:total_rows].reshape(n, f, d)
