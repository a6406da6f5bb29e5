"""Rotary position embeddings (RoPE), interleaved-pair convention.

Matches the default configuration of lucidrains' rotary-embedding-torch as
used by the reference model (reference: beat_this/model/beat_tracker.py:52,
beat_this/model/roformer.py:121-123): `RotaryEmbedding(head_dim)` with
theta=10000, language-model frequency spacing, rotation applied to the whole
head dimension, with *interleaved* pair layout — for each even/odd index pair
(2i, 2i+1) sharing angle t*theta^(-2i/d):

    out[2i]   = x[2i] * cos - x[2i+1] * sin
    out[2i+1] = x[2i+1] * cos + x[2i]  * sin

The same rotary embedding is shared by the frontend partial transformers
(sequence = frequency bins or time frames) and the main transformer blocks.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _rope_tables_cached(seq_len: int, head_dim: int, theta: float):
    import numpy as np

    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    angles = np.outer(np.arange(seq_len, dtype=np.float64), inv_freq)
    # cache host numpy (never device/tracer objects — this may be called
    # inside a jit trace, where the tables fold into the graph as constants)
    return (
        np.cos(angles).astype(np.float32),
        np.sin(angles).astype(np.float32),
    )


def rope_tables(seq_len: int, head_dim: int, theta: float = 10000.0):
    """Return (cos, sin) tables of shape (seq_len, head_dim // 2), float32.

    Computed in float64 on host and cached per (seq_len, head_dim) — these are
    constants folded into the compiled graph.
    """
    if head_dim % 2 != 0:
        raise ValueError(f"head_dim must be even, got {head_dim}")
    cos, sin = _rope_tables_cached(int(seq_len), int(head_dim), float(theta))
    return jnp.asarray(cos), jnp.asarray(sin)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate `x` of shape (..., seq_len, head_dim) by the given tables.

    `cos`/`sin` have shape (seq_len, head_dim // 2) and broadcast over leading
    dimensions. Computation runs in the dtype of `x` after the tables are cast,
    mirroring mixed-precision behaviour of the reference.
    """
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    x_even = x[..., 0::2]
    x_odd = x[..., 1::2]
    out_even = x_even * cos - x_odd * sin
    out_odd = x_odd * cos + x_even * sin
    # re-interleave: (..., n, d//2, 2) -> (..., n, d)
    return jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)
