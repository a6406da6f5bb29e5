"""Flash attention for TPU as a Pallas kernel.

The model's dominant cost is plain softmax attention at 1500 time frames —
in the main transformer (16 heads x batch) and in the frontend's time-axis
partial transformers (freq-bins x batch). The XLA fallback materializes the
(N, N) probability matrix in HBM per head; this kernel computes attention
with the online-softmax recurrence entirely in VMEM: for each query block it
streams key/value blocks, keeping running row-max/row-sum statistics, so HBM
traffic drops from O(N^2) to O(N * d).

Layout: inputs (batch*heads, seq, head_dim); grid = (batch*heads, q blocks);
each program holds one q block and the full (padded) K/V for its head in
VMEM (seq 1536 x 32 in bfloat16 = 96 KB each — far under the ~16 MB budget).
Sequence lengths are padded to the q/k block multiples with masked logits.

Matches `sdpa` (beat_this_tpu/model/layers.py) to bfloat16 accuracy; used on
the no-dropout path (inference / eval). Scale = head_dim ** -0.5.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu is unavailable when running on CPU in interpret mode
    from jax.experimental.pallas import tpu as pltpu

    _MEMORY_SPACE = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _MEMORY_SPACE = None

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len, block_k, scale):
    q = q_ref[0].astype(jnp.float32) * scale  # (block_q, d)
    block_q, d = q.shape
    kv_pad = k_ref.shape[1]
    num_kb = kv_pad // block_k

    m = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, d), jnp.float32)

    for kb in range(num_kb):
        k = k_ref[0, kb * block_k : (kb + 1) * block_k, :]
        v = v_ref[0, kb * block_k : (kb + 1) * block_k, :]
        s = jax.lax.dot_general(
            q, k.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, block_k)
        # mask padded keys
        col = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        s = jnp.where(col < kv_len, s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * corr + jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = m_new

    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jnp.ndarray:
    """Softmax attention over (bh, seq, head_dim) with 1/sqrt(d) scaling.

    Equivalent to `softmax(q k^T / sqrt(d)) v` per leading batch entry.
    """
    bh, n, d = q.shape
    scale = d**-0.5
    n_q_pad = -(-n // block_q) * block_q
    block_k = min(block_k, -(-n // 128) * 128)
    n_k_pad = -(-n // block_k) * block_k

    qp = jnp.pad(q, ((0, 0), (0, n_q_pad - n), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, n_k_pad - n), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, n_k_pad - n), (0, 0)))

    kwargs = {}
    if _MEMORY_SPACE is not None and not interpret:
        kwargs["memory_space"] = _MEMORY_SPACE

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, kv_len=n, block_k=block_k, scale=scale
        ),
        grid=(bh, n_q_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), **kwargs),
            pl.BlockSpec((1, n_k_pad, d), lambda b, i: (b, 0, 0), **kwargs),
            pl.BlockSpec((1, n_k_pad, d), lambda b, i: (b, 0, 0), **kwargs),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), **kwargs),
        out_shape=jax.ShapeDtypeStruct((bh, n_q_pad, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :n, :]


def flash_attention_available() -> bool:
    """True when running on a backend with Pallas TPU support."""
    if pltpu is None:
        return False
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:  # pragma: no cover
        return False
