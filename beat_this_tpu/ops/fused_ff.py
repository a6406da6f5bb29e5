"""Fused pre-norm feed-forward block as a Pallas kernel.

Computes `x + dropout(W2(dropout(gelu(W1(rmsnorm(x)) + b1))) + b2)` — the
roformer FF residual (reference: beat_this/model/roformer.py:38-61) — in one
VMEM-resident pass per row block. The XLA version takes ~6 memory passes
over the activations (norm read/write, two matmul boundaries, gelu,
residual); here the block is read once and written once, with the weights
(a few MB even at dim 512 x 2048) held in VMEM across the whole grid.

`fused_ff` is the no-dropout (inference/eval) forward. `fused_ff_train` is
the training twin: in-kernel seeded dropout (pltpu.prng, torch placement —
after the GELU and after the second linear) and a custom VJP whose backward
kernel recomputes everything from `x`, so the only residuals are the inputs
themselves — no (rows, 4*dim) hidden activations or dropout masks are ever
written to HBM. Weight gradients accumulate across the sequential TPU grid
(same pattern as ops/fused_freq.py's backward).
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


# ---------------------------------------------------------------------------
# Training path: in-kernel dropout + custom VJP
# ---------------------------------------------------------------------------

# dropout sites mixed into the PRNG salt (independent streams per site)
_SITE_HID, _SITE_OUT = 0, 1


def _train_block_rows(dtype) -> int:
    """Row-block size for the training kernels. At c = 512, m = 2048 the
    float32 backward's VMEM stack is dominated by the four weight-sized
    buffers (w1, w2, dw1, dw2 = 16 MB alone), so shrinking the row block
    barely helps (measured: 17.5 MB at 128 rows, 16.8 MB at 64); those
    calls instead raise the Mosaic scoped-VMEM limit (`_vmem_params`).
    bfloat16 weights halve that footprint and 256 rows fit the default."""
    return 256 if dtype == jnp.bfloat16 else 128


def _vmem_params(dtype, interpret):
    """Raise the scoped-VMEM ceiling for the float32 training kernels: the
    default 16 MB cannot hold two f32 (512, 2048) weight matrices plus their
    gradient accumulators; bfloat16 weights fit the default."""
    from beat_this_tpu.ops.flash_attention import vmem_params

    return {} if dtype == jnp.bfloat16 else vmem_params(48, interpret)


def _ff_train_kernel(seed_ref, x_ref, gamma_ref, w1_ref, b1_ref, w2_ref,
                     b2_ref, o_ref, *, rate):
    from beat_this_tpu.ops.fused_freq import _dropmask

    pid = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    c = x.shape[-1]
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    g = x / jnp.maximum(norm, 1e-12) * (c**0.5) * gamma_ref[...]
    pre1 = jax.lax.dot_general(
        g.astype(w1_ref.dtype), w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...]
    h1 = _gelu_exact(pre1)
    if rate > 0.0:
        h1 = h1 * _dropmask(seed_ref, pid, _SITE_HID, 0, h1.shape, rate)
    y = jax.lax.dot_general(
        h1.astype(w2_ref.dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...]
    if rate > 0.0:
        y = y * _dropmask(seed_ref, pid, _SITE_OUT, 0, y.shape, rate)
    o_ref[...] = (x + y).astype(o_ref.dtype)


def _ff_train_bwd_kernel(seed_ref, x_ref, gamma_ref, w1_ref, b1_ref, w2_ref,
                         b2_ref, do_ref,
                         dx_ref, dgamma_ref, dw1_ref, db1_ref, dw2_ref,
                         db2_ref, *, rate):
    from beat_this_tpu.ops.fused_freq import (
        _dropmask,
        _gelu_grad,
        _rms_bwd,
        _rms_parts,
    )

    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _init():
        for ref in (dgamma_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
            ref[...] = jnp.zeros_like(ref)

    x32 = x_ref[...].astype(jnp.float32)
    c = x32.shape[-1]
    do32 = do_ref[...].astype(jnp.float32)
    dtype = w1_ref.dtype

    # recompute the forward block-locally
    g32, n, r = _rms_parts(x32, gamma_ref[...])
    g = g32.astype(dtype)
    pre1 = jax.lax.dot_general(
        g, w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...]
    h1 = _gelu_exact(pre1)
    if rate > 0.0:
        h1d = h1 * _dropmask(seed_ref, pid, _SITE_HID, 0, h1.shape, rate)
    else:
        h1d = h1

    # backward
    d_y = do32
    if rate > 0.0:
        d_y = d_y * _dropmask(seed_ref, pid, _SITE_OUT, 0, d_y.shape, rate)
    d_y_b = d_y.astype(dtype)
    dw2_ref[...] += jax.lax.dot_general(
        h1d.astype(dtype), d_y_b,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2_ref[...] += jnp.sum(d_y, axis=0, keepdims=True)
    d_h1 = jax.lax.dot_general(
        d_y_b, w2_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if rate > 0.0:
        d_h1 = d_h1 * _dropmask(seed_ref, pid, _SITE_HID, 0, d_h1.shape, rate)
    d_pre1 = d_h1 * _gelu_grad(pre1)
    d_pre1_b = d_pre1.astype(dtype)
    dw1_ref[...] += jax.lax.dot_general(
        g, d_pre1_b,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1_ref[...] += jnp.sum(d_pre1, axis=0, keepdims=True)
    d_g = jax.lax.dot_general(
        d_pre1_b, w1_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dgamma_ref[...] += jnp.sum(d_g * n * (c**0.5), axis=0, keepdims=True)
    dx_ref[...] = (do32 + _rms_bwd(d_g, n, r, gamma_ref[...], c)).astype(
        dx_ref.dtype
    )


def _seed_spec(interpret):
    if pltpu is not None and not interpret:
        return pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.BlockSpec((1,), lambda i: (0,))


def _train_operands(x, gamma, w1, b1, w2, b2, seed, block):
    """Common padding/casting for the training fwd/bwd pallas calls."""
    orig_shape = x.shape
    c = orig_shape[-1]
    m = w1.shape[1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    padded = -(-rows // block) * block
    x2 = jnp.pad(x.reshape(rows, c), ((0, padded - rows), (0, 0)))
    wdtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    ops = (
        seed,
        x2,
        gamma.astype(jnp.float32).reshape(1, c),
        w1.astype(wdtype),
        b1.astype(jnp.float32).reshape(1, m),
        w2.astype(wdtype),
        b2.astype(jnp.float32).reshape(1, c),
    )
    return ops, rows, padded, c, m


def _train_in_specs(block, c, m, interpret, kwargs):
    return [
        _seed_spec(interpret),
        pl.BlockSpec((block, c), lambda i: (i, 0), **kwargs),
        pl.BlockSpec((1, c), lambda i: (0, 0), **kwargs),
        pl.BlockSpec((c, m), lambda i: (0, 0), **kwargs),
        pl.BlockSpec((1, m), lambda i: (0, 0), **kwargs),
        pl.BlockSpec((m, c), lambda i: (0, 0), **kwargs),
        pl.BlockSpec((1, c), lambda i: (0, 0), **kwargs),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused_ff_train(x, gamma, w1, b1, w2, b2, seed, interpret, rate):
    if interpret and rate > 0.0:
        raise NotImplementedError(
            "in-kernel dropout (pltpu.prng) has no interpret rule; "
            "use rate=0 on CPU"
        )
    block = _train_block_rows(x.dtype)
    ops, rows, padded, c, m = _train_operands(x, gamma, w1, b1, w2, b2, seed,
                                              block)
    kwargs = {}
    if _MEMORY_SPACE is not None and not interpret:
        kwargs = {"memory_space": _MEMORY_SPACE}
    out = pl.pallas_call(
        functools.partial(_ff_train_kernel, rate=rate),
        grid=(padded // block,),
        in_specs=_train_in_specs(block, c, m, interpret, kwargs),
        out_specs=pl.BlockSpec((block, c), lambda i: (i, 0), **kwargs),
        out_shape=jax.ShapeDtypeStruct((padded, c), x.dtype),
        interpret=interpret,
        **_vmem_params(x.dtype, interpret),
    )(*ops)
    return out[:rows].reshape(x.shape)


def _fused_ff_train_fwd(x, gamma, w1, b1, w2, b2, seed, interpret, rate):
    out = _fused_ff_train(x, gamma, w1, b1, w2, b2, seed, interpret, rate)
    return out, (x, gamma, w1, b1, w2, b2, seed)


def _fused_ff_train_bwd(interpret, rate, residuals, do):
    x, gamma, w1, b1, w2, b2, seed = residuals
    block = _train_block_rows(x.dtype)
    ops, rows, padded, c, m = _train_operands(x, gamma, w1, b1, w2, b2, seed,
                                              block)
    do2 = jnp.pad(
        do.reshape(rows, c).astype(x.dtype), ((0, padded - rows), (0, 0))
    )
    kwargs = {}
    if _MEMORY_SPACE is not None and not interpret:
        kwargs = {"memory_space": _MEMORY_SPACE}
    wdtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    dx, dgamma, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_ff_train_bwd_kernel, rate=rate),
        grid=(padded // block,),
        in_specs=_train_in_specs(block, c, m, interpret, kwargs)
        + [pl.BlockSpec((block, c), lambda i: (i, 0), **kwargs)],
        out_specs=(
            pl.BlockSpec((block, c), lambda i: (i, 0), **kwargs),
            pl.BlockSpec((1, c), lambda i: (0, 0), **kwargs),
            pl.BlockSpec((c, m), lambda i: (0, 0), **kwargs),
            pl.BlockSpec((1, m), lambda i: (0, 0), **kwargs),
            pl.BlockSpec((m, c), lambda i: (0, 0), **kwargs),
            pl.BlockSpec((1, c), lambda i: (0, 0), **kwargs),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((padded, c), x.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((c, m), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
            jax.ShapeDtypeStruct((m, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        interpret=interpret,
        **_vmem_params(x.dtype, interpret),
    )(*ops, do2)
    return (
        dx[:rows].reshape(x.shape),
        dgamma.reshape(gamma.shape),
        dw1.astype(w1.dtype),
        db1.reshape(b1.shape),
        dw2.astype(w2.dtype),
        db2.reshape(b2.shape),
        None,
    )


_fused_ff_train.defvjp(_fused_ff_train_fwd, _fused_ff_train_bwd)


@functools.partial(jax.jit, static_argnames=("interpret", "dropout_rate"))
def fused_ff_train(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    dropout_rate: float = 0.0,
    seed=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable `x + dropout(FF(rmsnorm(x)))` with torch dropout
    placement (after the GELU and after the second linear). The dropout
    masks regenerate from `seed` (int32) in the backward kernel, so nothing
    beyond the inputs is saved between passes."""
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape((1,))
    return _fused_ff_train(
        x, gamma, w1, b1, w2, b2, seed, interpret, float(dropout_rate)
    )
