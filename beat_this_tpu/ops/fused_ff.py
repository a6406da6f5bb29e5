"""Fused pre-norm feed-forward block as a Pallas kernel.

Computes `x + W2(gelu(W1(rmsnorm(x)) + b1)) + b2` — the roformer FF residual
(reference: beat_this/model/roformer.py:38-61) — in one VMEM-resident pass
per row block. The XLA version takes ~6 memory passes over the activations
(norm read/write, two matmul boundaries, gelu, residual); here the block is
read once and written once, with the weights (a few MB even at
dim 512 x 2048) held in VMEM across the whole grid.

Used on the no-dropout (inference/eval) path; training uses the XLA version,
which autodiffs and applies dropout.
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

_BLOCK_ROWS = 512


def _erf(x):
    """float32 erf via Abramowitz & Stegun 7.1.26 (|error| <= 1.5e-7, i.e.
    float32 precision) — Mosaic has no native erf/erfc lowering."""
    sign = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-z * z))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * (2.0**-0.5)))


def _ff_kernel(x_ref, gamma_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)  # (block, c)
    c = x.shape[-1]
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    g = x / jnp.maximum(norm, 1e-12) * (c**0.5) * gamma_ref[...]
    h = jax.lax.dot_general(
        g.astype(w1_ref.dtype), w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...]
    h = _gelu_exact(h)
    y = jax.lax.dot_general(
        h.astype(w2_ref.dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...]
    o_ref[...] = (x + y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_ff(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: (..., C) -> x + FF(rmsnorm(x)); weights (C, M), (M,), (M, C), (C,)."""
    orig_shape = x.shape
    c = orig_shape[-1]
    m = w1.shape[1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, c)
    padded = -(-rows // _BLOCK_ROWS) * _BLOCK_ROWS
    x2 = jnp.pad(x2, ((0, padded - rows), (0, 0)))
    kwargs = {}
    if _MEMORY_SPACE is not None and not interpret:
        kwargs["memory_space"] = _MEMORY_SPACE
    dtype = x.dtype if x.dtype != jnp.float32 else jnp.float32
    out = pl.pallas_call(
        _ff_kernel,
        grid=(padded // _BLOCK_ROWS,),
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, c), lambda i: (i, 0), **kwargs),
            pl.BlockSpec((1, c), lambda i: (0, 0), **kwargs),
            pl.BlockSpec((c, m), lambda i: (0, 0), **kwargs),
            pl.BlockSpec((1, m), lambda i: (0, 0), **kwargs),
            pl.BlockSpec((m, c), lambda i: (0, 0), **kwargs),
            pl.BlockSpec((1, c), lambda i: (0, 0), **kwargs),
        ],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, c), lambda i: (i, 0), **kwargs),
        out_shape=jax.ShapeDtypeStruct((padded, c), dtype),
        interpret=interpret,
    )(
        x2,
        gamma.astype(jnp.float32).reshape(1, c),
        w1.astype(x.dtype if x.dtype == jnp.bfloat16 else jnp.float32),
        b1.astype(jnp.float32).reshape(1, m),
        w2.astype(x.dtype if x.dtype == jnp.bfloat16 else jnp.float32),
        b2.astype(jnp.float32).reshape(1, c),
    )
    return out[:rows].reshape(orig_shape)
