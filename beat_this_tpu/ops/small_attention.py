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
needed — everything fits in registers). Differentiable: a custom VJP runs a
packed backward kernel that recomputes the tiny softmax instead of storing
it, and optional attention-probability dropout is regenerated in-kernel from
a seed (same recipe as ops/flash_attention.py), so the training path for the
frequency attention never materializes probabilities or masks in HBM either.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _MEMORY_SPACE = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _MEMORY_SPACE = None

_PACK_ROWS = 128  # rows per packed score matrix
_PACKS_PER_PROGRAM = 16


def _dropout_mask(seed_ref, prog, pack, shape, rate):
    """Deterministic per-(program, pack) keep mask scaled by 1/keep; the same
    (seed, indices) regenerate the same mask in the backward kernel."""
    salt = (seed_ref[0] + prog) * 1000003 + pack
    pltpu.prng_seed(salt)
    bits = pltpu.prng_random_bits(shape)
    threshold = np.uint32(int(rate * 4294967296.0))
    keep = pltpu.bitcast(bits, jnp.uint32) >= threshold
    return keep.astype(jnp.float32) / (1.0 - rate)


def _same_item_mask(f):
    rows = _PACK_ROWS
    row_item = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0) // f
    col_item = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1) // f
    return row_item == col_item


def _packed_exp(q, k, same):
    """Unnormalized block-diagonal softmax numerator for one (128, d) pack:
    exp2(s - rowmax) and the row sums. `q` is rotated AND pre-multiplied by
    scale * log2(e) (base-2 softmax, one multiply on the (rows, d) operand
    instead of the (rows, rows) scores — the kernel is VPU-bound); `k` is
    rotated, both in the input dtype so the MXU dots run at full rate."""
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = jnp.where(same, s, -jnp.inf)
    e = jnp.exp2(s - jnp.max(s, axis=1, keepdims=True))
    return e, jnp.sum(e, axis=1, keepdims=True)


def _small_attn_kernel(seed_ref, q_ref, k_ref, v_ref, cos_ref, sin_ref,
                       o_ref, *, f, scale, packs, rate):
    from beat_this_tpu.ops.flash_attention import rope_rotate

    from beat_this_tpu.ops.flash_attention import LOG2E

    same = _same_item_mask(f)
    cos = cos_ref[:, :]
    sin = sin_ref[:, :]
    for p in range(packs):
        sl = pl.ds(p * _PACK_ROWS, _PACK_ROWS)
        dtype = q_ref.dtype
        q = (
            rope_rotate(q_ref[sl, :].astype(jnp.float32), cos, sin)
            * (scale * LOG2E)
        ).astype(dtype)
        k = rope_rotate(k_ref[sl, :].astype(jnp.float32), cos, sin).astype(dtype)
        v = v_ref[sl, :]
        e, l = _packed_exp(q, k, same)
        if rate > 0.0:
            e = e * _dropout_mask(seed_ref, pl.program_id(0), p, e.shape, rate)
        # normalization deferred past the PV dot: divides (rows, d) instead
        # of the (rows, 128) probabilities
        o_ref[sl, :] = (
            jax.lax.dot_general(
                e.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            / l
        ).astype(o_ref.dtype)


def _small_attn_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, cos_ref, sin_ref,
                           do_ref, dq_ref, dk_ref, dv_ref, *, f, scale, packs,
                           rate):
    from beat_this_tpu.ops.flash_attention import rope_rotate, rope_rotate_inv

    from beat_this_tpu.ops.flash_attention import LOG2E

    same = _same_item_mask(f)
    cos = cos_ref[:, :]
    sin = sin_ref[:, :]
    for p in range(packs):
        sl = pl.ds(p * _PACK_ROWS, _PACK_ROWS)
        dtype = q_ref.dtype
        q_rot = rope_rotate(q_ref[sl, :].astype(jnp.float32), cos, sin)
        q = q_rot.astype(dtype)  # unscaled: dk pullback operand
        q_s2 = (q_rot * (scale * LOG2E)).astype(dtype)  # scaled: for scores
        k = rope_rotate(k_ref[sl, :].astype(jnp.float32), cos, sin).astype(dtype)
        v = v_ref[sl, :]
        do = do_ref[sl, :]
        e, l = _packed_exp(q_s2, k, same)  # recomputed, never stored
        probs = e / l
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rate > 0.0:
            mask = _dropout_mask(seed_ref, pl.program_id(0), p, dp.shape, rate)
            p_dropped = probs * mask
            dp = dp * mask
        else:
            p_dropped = probs
        dv_ref[sl, :] = jax.lax.dot_general(
            p_dropped.astype(do.dtype), do,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        # softmax VJP; off-diagonal entries have probs == 0, so ds == 0 there
        delta = jnp.sum(probs * dp, axis=1, keepdims=True)
        ds = (probs * (dp - delta)).astype(dtype)
        dq_rot = jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_rot = jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # pull gradients back through the rotation (transpose = inverse);
        # s = (q_rot k_rot^T) * scale, so both pullbacks carry the scale
        dq_ref[sl, :] = (
            rope_rotate_inv(dq_rot, cos, sin) * scale
        ).astype(dq_ref.dtype)
        dk_ref[sl, :] = (
            rope_rotate_inv(dk_rot, cos, sin) * scale
        ).astype(dk_ref.dtype)


def _layout(n, f, d):
    per_program = _PACK_ROWS * _PACKS_PER_PROGRAM
    total_rows = n * f
    padded_rows = -(-total_rows // per_program) * per_program
    return per_program, total_rows, padded_rows


def _full_tables(cos, sin, f, d):
    """Half-width (f, d//2) tables -> (_PACK_ROWS, d) full-width float32."""
    cosf = jnp.tile(jnp.repeat(cos.astype(jnp.float32), 2, axis=-1),
                    (_PACK_ROWS // f, 1))
    sinf = jnp.tile(jnp.repeat(sin.astype(jnp.float32), 2, axis=-1),
                    (_PACK_ROWS // f, 1))
    return cosf, sinf


def _call_packed(kernel, n_out, q, k, v, seed, cos, sin, extra, *, f, scale,
                 interpret, rate):
    n, _, d = q.shape
    per_program, total_rows, padded_rows = _layout(n, f, d)
    cosf, sinf = _full_tables(cos, sin, f, d)

    def flat_pad(x):
        x = x.reshape(total_rows, d)
        return jnp.pad(x, ((0, padded_rows - total_rows), (0, 0)))

    kwargs = {}
    if _MEMORY_SPACE is not None and not interpret:
        kwargs["memory_space"] = _MEMORY_SPACE
    if pltpu is not None and not interpret:
        seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    else:
        seed_spec = pl.BlockSpec((1,), lambda i: (0,))
    spec = pl.BlockSpec((per_program, d), lambda i: (i, 0), **kwargs)
    tab_spec = pl.BlockSpec((_PACK_ROWS, d), lambda i: (0, 0), **kwargs)
    args = [seed, flat_pad(q), flat_pad(k), flat_pad(v), cosf, sinf]
    args += [flat_pad(x) for x in extra]
    out = pl.pallas_call(
        functools.partial(
            kernel, f=f, scale=scale, packs=_PACKS_PER_PROGRAM, rate=rate
        ),
        grid=(padded_rows // per_program,),
        in_specs=[seed_spec] + [spec] * 3 + [tab_spec, tab_spec]
        + [spec] * len(extra),
        out_specs=spec if n_out == 1 else (spec,) * n_out,
        out_shape=jax.ShapeDtypeStruct((padded_rows, d), q.dtype)
        if n_out == 1
        else tuple(
            jax.ShapeDtypeStruct((padded_rows, d), q.dtype) for _ in range(n_out)
        ),
        interpret=interpret,
    )(*args)
    if n_out == 1:
        return out[:total_rows].reshape(n, f, d)
    return tuple(o[:total_rows].reshape(n, f, d) for o in out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _small_attention(q, k, v, seed, cos, sin, interpret, rate):
    scale = q.shape[-1] ** -0.5
    return _call_packed(
        _small_attn_kernel, 1, q, k, v, seed, cos, sin, (),
        f=q.shape[1], scale=scale, interpret=interpret, rate=rate,
    )


def _small_attention_fwd(q, k, v, seed, cos, sin, interpret, rate):
    out = _small_attention(q, k, v, seed, cos, sin, interpret, rate)
    return out, (q, k, v, seed, cos, sin)


def _small_attention_bwd(interpret, rate, residuals, do):
    q, k, v, seed, cos, sin = residuals
    scale = q.shape[-1] ** -0.5
    dq, dk, dv = _call_packed(
        _small_attn_bwd_kernel, 3, q, k, v, seed, cos, sin, (do.astype(q.dtype),),
        f=q.shape[1], scale=scale, interpret=interpret, rate=rate,
    )
    return dq, dk, dv, None, None, None


_small_attention.defvjp(_small_attention_fwd, _small_attention_bwd)


@functools.partial(
    jax.jit, static_argnames=("interpret", "dropout_rate")
)
def small_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    interpret: bool = False,
    rope_cos=None,
    rope_sin=None,
    dropout_rate: float = 0.0,
    seed=None,
) -> jnp.ndarray:
    """Attention over (items, F, D) with F in {8, 16, 32} (or any divisor of
    128) and 1/sqrt(D) scaling. Items are independent problems. Optional
    half-width RoPE tables (F, D//2) are applied to q and k in-kernel.

    `dropout_rate` > 0 applies dropout to the post-softmax probabilities
    (torch semantics), regenerated from `seed` (int32) in both the forward
    and the custom-VJP backward kernel.
    """
    n, f, d = q.shape
    if _PACK_ROWS % f != 0:
        raise ValueError(f"sequence length {f} must divide {_PACK_ROWS}")
    if rope_cos is None:
        rope_cos = jnp.ones((f, d // 2), jnp.float32)
        rope_sin = jnp.zeros((f, d // 2), jnp.float32)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape((1,))
    return _small_attention(
        q, k, v, seed, rope_cos, rope_sin, interpret, float(dropout_rate)
    )
