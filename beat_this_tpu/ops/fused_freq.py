"""Fully-fused frequency-axis roformer block as one Pallas kernel.

The frontend's frequency-axis partial transformer (reference:
beat_this/model/beat_tracker.py:206-301 — attention + feed-forward across
F in {32, 16, 8} frequency bins for batch*time ~ 24k independent items) is
HBM-bound when expressed as separate ops: the (items, F, C) activations are
~50 MB per pass at inference batch 16 and the rmsnorm / qkv projection /
attention / gating / out projection / residual / feed-forward chain reads
and writes them ~12 times (~600 MB of HBM traffic per block).

This kernel performs the ENTIRE block — rmsnorm -> qkv projection -> RoPE ->
block-diagonal packed attention -> per-head sigmoid gating -> out projection
-> residual -> rmsnorm -> W1 -> exact GELU -> W2 -> residual — in one
VMEM-resident pass: each activation row is read from HBM once and written
once, with all weights (< 1 MB) held in VMEM across the grid. The attention
uses the same packing trick as ops/small_attention.py: 128 // F items share
one (128, 128) score matrix with off-diagonal blocks masked, softmax in
base 2 with the scale folded into q.

Semantics match `attention_block` + `ff_residual` (beat_this_tpu/model/
layers.py) to bfloat16 tolerance; eval path only (no dropout — training
keeps the composable kernels, which regenerate dropout in-kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from beat_this_tpu.ops.fused_ff import _gelu_exact

try:
    from jax.experimental.pallas import tpu as pltpu

    _MEMORY_SPACE = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _MEMORY_SPACE = None

_PACK_ROWS = 128  # rows per packed attention score matrix
_BLOCK_ROWS = 1024  # activation rows per grid program (8 packs)
_HEAD_DIM = 32


def _rms(x32, gamma):
    norm = jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True))
    c = x32.shape[-1]
    return x32 / jnp.maximum(norm, 1e-12) * (c**0.5) * gamma


def _fused_freq_kernel(
    x_ref, ga_ref, wqkv_ref, wg_ref, bg_ref, wout_ref,
    gf_ref, w1_ref, b1_ref, w2_ref, b2_ref, cos_ref, sin_ref, o_ref,
    *, f, heads,
):
    from beat_this_tpu.ops.flash_attention import LOG2E, rope_rotate
    from beat_this_tpu.ops.small_attention import _packed_exp, _same_item_mask

    x = x_ref[...]  # (rows, C) in the compute dtype
    rows, c = x.shape
    dtype = x.dtype
    scale = _HEAD_DIM**-0.5

    # --- attention branch: g = rmsnorm(x); qkv = g @ Wqkv ---
    g = _rms(x.astype(jnp.float32), ga_ref[...]).astype(dtype)
    qkv = jax.lax.dot_general(
        g, wqkv_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype)  # (rows, 3C), column order (qkv, head, head_dim)

    same = _same_item_mask(f)
    cos = cos_ref[...]
    sin = sin_ref[...]
    pack_outs = []
    for p in range(rows // _PACK_ROWS):
        sl = slice(p * _PACK_ROWS, (p + 1) * _PACK_ROWS)
        head_outs = []
        for h in range(heads):
            d0 = h * _HEAD_DIM
            q = (
                rope_rotate(
                    qkv[sl, d0 : d0 + _HEAD_DIM].astype(jnp.float32), cos, sin
                )
                * (scale * LOG2E)
            ).astype(dtype)
            k = rope_rotate(
                qkv[sl, c + d0 : c + d0 + _HEAD_DIM].astype(jnp.float32),
                cos, sin,
            ).astype(dtype)
            v = qkv[sl, 2 * c + d0 : 2 * c + d0 + _HEAD_DIM]
            e, l = _packed_exp(q, k, same)
            head_outs.append(
                (
                    jax.lax.dot_general(
                        e.astype(dtype), v,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    / l
                ).astype(dtype)
            )
        pack_outs.append(
            head_outs[0] if heads == 1 else jnp.concatenate(head_outs, axis=1)
        )
    o = pack_outs[0] if len(pack_outs) == 1 else jnp.concatenate(pack_outs, axis=0)

    # --- per-head sigmoid gates from the normed input ---
    # wg/bg are zero-padded to 128 lanes (heads in {1,2,4} is too narrow for
    # a TPU tile); only the first `heads` columns are used below
    gates = jax.lax.dot_general(
        g, wg_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bg_ref[...]  # (rows, 128)
    gates = jax.nn.sigmoid(gates.astype(dtype).astype(jnp.float32)).astype(dtype)
    gate_full = (
        jnp.broadcast_to(gates[:, :1], (rows, c))
        if heads == 1
        else jnp.concatenate(
            [
                jnp.broadcast_to(gates[:, h : h + 1], (rows, _HEAD_DIM))
                for h in range(heads)
            ],
            axis=1,
        )
    )
    attn = jax.lax.dot_general(
        o * gate_full, wout_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    x2 = x + attn

    # --- feed-forward branch (same math as ops/fused_ff.py) ---
    x2_32 = x2.astype(jnp.float32)
    g2 = _rms(x2_32, gf_ref[...])
    h1 = jax.lax.dot_general(
        g2.astype(dtype), w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...]
    h1 = _gelu_exact(h1)
    y = jax.lax.dot_general(
        h1.astype(dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...]
    o_ref[...] = (x2_32 + y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_freq_roformer(
    x: jnp.ndarray,
    attn_params: dict,
    ff_params: dict,
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """One frequency-axis roformer block over (items, F, C).

    Equivalent (to bfloat16 tolerance) to:
        x = x + attention_block(attn_params, x, (rope_cos, rope_sin), C // 32)
        x = ff_residual(ff_params, x)
    with F | 128 and C a multiple of 32 (head_dim). Inference only.
    """
    items, f, c = x.shape
    if 128 % f != 0:
        raise ValueError(f"frequency axis {f} must divide {_PACK_ROWS}")
    heads = c // _HEAD_DIM
    dtype = x.dtype

    rows = items * f
    padded = -(-rows // _BLOCK_ROWS) * _BLOCK_ROWS
    x2 = jnp.pad(x.reshape(rows, c), ((0, padded - rows), (0, 0)))

    # full-width (128, 32) rope tables: position = row index mod F
    cosf = jnp.tile(
        jnp.repeat(rope_cos.astype(jnp.float32), 2, axis=-1), (_PACK_ROWS // f, 1)
    )
    sinf = jnp.tile(
        jnp.repeat(rope_sin.astype(jnp.float32), 2, axis=-1), (_PACK_ROWS // f, 1)
    )

    kwargs = {}
    if _MEMORY_SPACE is not None and not interpret:
        kwargs["memory_space"] = _MEMORY_SPACE

    wdtype = dtype if dtype == jnp.bfloat16 else jnp.float32
    row_spec = pl.BlockSpec((_BLOCK_ROWS, c), lambda i: (i, 0), **kwargs)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), **kwargs)

    mult = ff_params["w1"].shape[1]
    out = pl.pallas_call(
        functools.partial(_fused_freq_kernel, f=f, heads=heads),
        grid=(padded // _BLOCK_ROWS,),
        in_specs=[
            row_spec,
            const_spec((1, c)),
            const_spec((c, 3 * c)),
            const_spec((c, _PACK_ROWS)),
            const_spec((1, _PACK_ROWS)),
            const_spec((c, c)),
            const_spec((1, c)),
            const_spec((c, mult)),
            const_spec((1, mult)),
            const_spec((mult, c)),
            const_spec((1, c)),
            const_spec((_PACK_ROWS, _HEAD_DIM)),
            const_spec((_PACK_ROWS, _HEAD_DIM)),
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((padded, c), dtype),
        interpret=interpret,
    )(
        x2,
        attn_params["norm_gamma"].astype(jnp.float32).reshape(1, c),
        attn_params["qkv_w"].astype(wdtype),
        jnp.pad(
            attn_params["gates_w"].astype(wdtype), ((0, 0), (0, _PACK_ROWS - heads))
        ),
        jnp.pad(
            attn_params["gates_b"].astype(jnp.float32).reshape(1, heads),
            ((0, 0), (0, _PACK_ROWS - heads)),
        ),
        attn_params["out_w"].astype(wdtype),
        ff_params["norm_gamma"].astype(jnp.float32).reshape(1, c),
        ff_params["w1"].astype(wdtype),
        ff_params["b1"].astype(jnp.float32).reshape(1, mult),
        ff_params["w2"].astype(wdtype),
        ff_params["b2"].astype(jnp.float32).reshape(1, c),
        cosf,
        sinf,
    )
    return out[:rows].reshape(items, f, c)
