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

DEFAULT_BLOCK_Q = 1536  # best of a measured sweep at 1500-frame sequences
DEFAULT_BLOCK_K = 768  # (both are clamped to the padded sequence length)

LOG2E = 1.4426950408889634  # softmax runs in base 2: one fused scale
# multiply replaces the separate 1/sqrt(d) scale and the ln->log2
# conversion inside exp (the kernel is VPU-bound at head_dim 32, so
# per-score-element ops are what count)


def _dropout_mask(seed_ref, bh, qb, kb, shape, rate):
    """Deterministic per-(head, q-block, k-block) keep mask in [0,1/keep].

    The same (seed, indices) regenerate the same mask in the backward
    kernels, so no mask tensor is ever stored.
    """
    salt = ((seed_ref[0] + bh) * 1000003 + qb) * 1009 + kb
    pltpu.prng_seed(salt)
    bits = pltpu.prng_random_bits(shape)
    threshold = np.uint32(int(rate * 4294967296.0))
    keep = pltpu.bitcast(bits, jnp.uint32) >= threshold
    return keep.astype(jnp.float32) / (1.0 - rate)


def _rswap(d):
    """Constant (d, d) matrix with x @ _rswap == rotate_half(x):
    out[2i] = -x[2i+1], out[2i+1] = x[2i] (interleaved RoPE pairs)."""
    j = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
    plus = (j % 2 == 0) & (i == j + 1)
    minus = (j % 2 == 1) & (i == j - 1)
    return plus.astype(jnp.float32) - minus.astype(jnp.float32)


def rope_rotate(x, cos, sin):
    """Apply interleaved RoPE: x * cos + rotate_half(x) * sin, with
    rotate_half as a (d, d) matmul (MXU-friendly, no lane shuffles)."""
    rotated = jax.lax.dot_general(
        x, _rswap(x.shape[-1]),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return x * cos + rotated * sin


def rope_rotate_inv(x, cos, sin):
    """Transpose (= inverse) of rope_rotate for gradient pullback."""
    rotated = jax.lax.dot_general(
        x * sin, _rswap(x.shape[-1]),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return x * cos - rotated


def _rotated(ref, cos_ref, sin_ref, sl):
    """Load a (block, d) slice, apply RoPE in float32, return in the ref's
    dtype — bfloat16 inputs stay bfloat16 so the MXU dots run at full rate
    (float32 matmuls are ~4x slower; accumulation stays float32 via
    preferred_element_type)."""
    x = ref[0, sl, :]
    return rope_rotate(
        x.astype(jnp.float32), cos_ref[0, sl, :], sin_ref[0, sl, :]
    ).astype(x.dtype)


def _masked_scores(q, k_ref, cos_ref, sin_ref, kb, block_k, kv_len):
    """Pre-scaled rotated q (block_q, d) x rotated k block -> masked
    (bq, bk) f32 scores in BASE-2 units. The scale * log2(e) factor is
    folded into q (a (bq, d)-sized multiply) instead of the (bq, bk) score
    matrix, and masking of the key padding runs only on the one block that
    contains it (static decision — the k loop is unrolled): the kernel is
    VPU-bound at head_dim 32, so per-score-element ops are what count."""
    block_q = q.shape[0]
    k = _rotated(k_ref, cos_ref, sin_ref, pl.ds(kb * block_k, block_k))
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if (kb + 1) * block_k > kv_len:  # this block contains key padding
        col = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        s = jnp.where(col < kv_len, s, -jnp.inf)
    return s


def _flash_kernel(seed_ref, q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref, *,
                  kv_len, block_k, scale, rate):
    _flash_fwd_body(seed_ref, q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref,
                    None, kv_len=kv_len, block_k=block_k, scale=scale,
                    rate=rate)


def _flash_kernel_lse(seed_ref, q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref,
                      lse_ref, *, kv_len, block_k, scale, rate):
    _flash_fwd_body(seed_ref, q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref,
                    lse_ref, kv_len=kv_len, block_k=block_k, scale=scale,
                    rate=rate)


def _q_tables(cos_ref, sin_ref, block_q):
    qb = pl.program_id(1)
    sl = pl.ds(qb * block_q, block_q)
    return cos_ref[0, sl, :], sin_ref[0, sl, :]


def _flash_fwd_body(seed_ref, q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref,
                    lse_ref, *, kv_len, block_k, scale, rate):
    q_raw = q_ref[0]  # (block_q, d)
    block_q, d = q_raw.shape
    q = (
        rope_rotate(
            q_raw.astype(jnp.float32), *_q_tables(cos_ref, sin_ref, block_q)
        )
        * (scale * LOG2E)  # folded scale: scores come out in base-2 units
    ).astype(q_raw.dtype)
    kv_pad = k_ref.shape[1]
    num_kb = kv_pad // block_k

    m = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, d), jnp.float32)

    for kb in range(num_kb):
        v = v_ref[0, kb * block_k : (kb + 1) * block_k, :]
        s = _masked_scores(q, k_ref, cos_ref, sin_ref, kb, block_k, kv_len)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp2(s - m_new)  # == exp(s_nat - m_nat): same values
        corr = jnp.exp2(m - m_new)
        # the softmax normalizer uses undropped probabilities (dropout is
        # applied after the softmax, torch semantics)
        l = l * corr + jnp.sum(p, axis=1, keepdims=True)
        if rate > 0.0:
            p = p * _dropout_mask(
                seed_ref, pl.program_id(0), pl.program_id(1), kb, p.shape, rate
            )
        acc = acc * corr + jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = m_new

    o_ref[0] = (acc / l).astype(o_ref.dtype)
    if lse_ref is not None:
        # base-2 log-sum-exp (the backward kernels recompute p as
        # exp2(s - lse)); layout (bh, n_pad, 1): trailing singleton keeps
        # the block shape legal for the TPU tiling rules
        lse_ref[0, :, 0] = (m + jnp.log2(l))[:, 0]


def _flash_dq_kernel(seed_ref, q_ref, k_ref, v_ref, cos_ref, sin_ref,
                     do_ref, lse_ref, delta_ref, dq_ref, *, kv_len, block_k,
                     scale, rate):
    q_raw = q_ref[0]
    block_q, d = q_raw.shape
    q_cos, q_sin = _q_tables(cos_ref, sin_ref, block_q)
    q = (
        rope_rotate(q_raw.astype(jnp.float32), q_cos, q_sin)
        * (scale * LOG2E)  # folded scale, matching the forward's s units
    ).astype(q_raw.dtype)
    do = do_ref[0]
    lse = lse_ref[0, :, :]  # (block_q, 1)
    delta = delta_ref[0, :, :]
    num_kb = k_ref.shape[1] // block_k
    dq = jnp.zeros((block_q, d), jnp.float32)
    for kb in range(num_kb):
        ksl = pl.ds(kb * block_k, block_k)
        k = _rotated(k_ref, cos_ref, sin_ref, ksl)
        v = v_ref[0, ksl, :]
        s = _masked_scores(q, k_ref, cos_ref, sin_ref, kb, block_k, kv_len)
        p = jnp.exp2(s - lse)  # masked cols -> exp2(-inf) = 0
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rate > 0.0:
            dp = dp * _dropout_mask(
                seed_ref, pl.program_id(0), pl.program_id(1), kb, dp.shape, rate
            )
        ds = p * (dp - delta)
        dq = dq + jax.lax.dot_general(
            ds.astype(q.dtype), k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # pull the gradient back through the rotation (transpose = inverse)
    dq_ref[0] = (rope_rotate_inv(dq, q_cos, q_sin) * scale).astype(dq_ref.dtype)


def _flash_dkv_kernel(seed_ref, q_ref, k_ref, v_ref, cos_ref, sin_ref,
                      do_ref, lse_ref, delta_ref, dk_ref, dv_ref, *, q_len,
                      block_q, scale, rate):
    block_k, d = k_ref.shape[1], k_ref.shape[2]
    kb = pl.program_id(1)
    k_cos = cos_ref[0, pl.ds(kb * block_k, block_k), :]
    k_sin = sin_ref[0, pl.ds(kb * block_k, block_k), :]
    k_raw = k_ref[0]
    # the scale * log2(e) factor is folded into THIS kernel's k (so q stays
    # unscaled for the dk pullback below); scores match the forward's units
    k = (
        rope_rotate(k_raw.astype(jnp.float32), k_cos, k_sin) * (scale * LOG2E)
    ).astype(k_raw.dtype)
    v = v_ref[0]
    num_qb = q_ref.shape[1] // block_q
    dk = jnp.zeros((block_k, d), jnp.float32)
    dv = jnp.zeros((block_k, d), jnp.float32)
    for qb in range(num_qb):
        qsl = pl.ds(qb * block_q, block_q)
        q = _rotated(q_ref, cos_ref, sin_ref, qsl)
        do = do_ref[0, qsl, :]
        lse = lse_ref[0, qsl, :]
        delta = delta_ref[0, qsl, :]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, block_k), base-2 units like lse (scale folded into k)
        # padded q rows have do == 0 and delta == 0, so they contribute 0;
        # padded k rows produce dk/dv that are sliced away by the caller
        p = jnp.exp2(s - lse)
        if rate > 0.0:
            mask = _dropout_mask(
                seed_ref, pl.program_id(0), qb, pl.program_id(1),
                (p.shape[0], p.shape[1]), rate,
            )
            p_dropped = p * mask
        else:
            p_dropped = p
        dv = dv + jax.lax.dot_general(
            p_dropped.astype(do.dtype), do,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rate > 0.0:
            dp = dp * mask
        ds = p * (dp - delta)
        dk = dk + jax.lax.dot_general(
            ds.astype(q.dtype), q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dk_ref[0] = (rope_rotate_inv(dk, k_cos, k_sin) * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _specs(interpret):
    kwargs = {}
    if _MEMORY_SPACE is not None and not interpret:
        kwargs["memory_space"] = _MEMORY_SPACE
    return kwargs


def vmem_params(limit_mb, interpret):
    """pallas_call kwargs raising the Mosaic scoped-VMEM ceiling to
    `limit_mb` MiB (no-op in interpret mode / off-TPU). The default 16 MiB
    scoped budget is far below the physical VMEM (128 MiB on v5e); the
    fused kernels' float32 score/weight transients routinely need more."""
    if interpret or pltpu is None:
        return {}
    return {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=limit_mb * 1024 * 1024
        )
    }


def _train_vmem_params(interpret):
    """Ceiling for the training-path kernels (lse forward + both
    backwards). Mosaic stack-allocates each unrolled k/q-block iteration's
    (block_q, block_k) float32 score transients without cross-iteration
    reuse, so blocks above 512 overflow the 16 MB default (measured:
    16.59 MB at block 1024 lse-forward, 23.54 MB at the dkv kernel)."""
    return vmem_params(64, interpret)


def _pad_seq(x, n_pad):
    return jnp.pad(x, ((0, 0), (0, n_pad - x.shape[1]), (0, 0)))


def _pad_tables(cos, sin, n, d, n_tab):
    """Expand half-width tables to (1, n_tab, d) full-width float32; identity
    (cos=1, sin=0) when no rotation is requested."""
    if cos is None:
        cosf = jnp.ones((1, n_tab, d), jnp.float32)
        sinf = jnp.zeros((1, n_tab, d), jnp.float32)
        return cosf, sinf
    cosf = jnp.repeat(cos.astype(jnp.float32), 2, axis=-1)[None]
    sinf = jnp.repeat(sin.astype(jnp.float32), 2, axis=-1)[None]
    pad = ((0, 0), (0, n_tab - cosf.shape[1]), (0, 0))
    # padded positions get identity rotation (their values are masked anyway)
    return (
        jnp.pad(cosf, pad, constant_values=1.0),
        jnp.pad(sinf, pad, constant_values=0.0),
    )


def _train_block_cap() -> int:
    """Block cap shared by the residual-saving (training) forward and BOTH
    backward kernels. They must tile identically: the in-kernel dropout
    masks are salted by (head, q-block, k-block) INDEX and shaped per
    block, so any geometry mismatch makes the backward regenerate different
    masks than the forward applied — silently corrupting gradients.

    Default 1536: one whole-sequence block at the model's n=1500 shapes.
    Measured on the v5e (full train step, bs 8 x accum 8): 512 -> 1.251 s,
    1024 -> 1.357 s (q pads 1500 -> 2048, 27% wasted rows), 1536 -> 1.168 s.
    Blocks above 512 need the raised scoped-VMEM ceiling from
    _train_vmem_params (the f32 score transients overflow the 16 MB
    default). Overridable for sweeps via BEAT_THIS_FLASH_BWD_CAP (clear jit
    caches when changing it mid-process: jit keys only on static args, so
    stale executables built with the old cap are otherwise reused
    silently)."""
    import os

    cap = int(os.environ.get("BEAT_THIS_FLASH_BWD_CAP", "1536"))
    if cap < 128 or cap % 128:
        raise ValueError(
            f"BEAT_THIS_FLASH_BWD_CAP={cap} invalid: must be a multiple of "
            "128 and >= 128 (Mosaic tiling requirement)"
        )
    return cap


def _flash_forward(q, k, v, seed, cos, sin, block_q, block_k, interpret, rate,
                   need_lse):
    bh, n, d = q.shape
    scale = d**-0.5
    if need_lse or rate > 0.0:
        # tile exactly like the backward (see _train_block_cap) whenever the
        # lse output is live (scoped-VMEM: the eval blocks measured 16.59 MB
        # with lse) AND whenever dropout is on — the mask is salted by block
        # index, so a primal-only call (no value_and_grad) must realize the
        # same dropout pattern as the custom-VJP forward for the same seed
        cap = _train_block_cap()
        block_q = min(block_q, cap)
        block_k = min(block_k, cap)
    block_q = min(block_q, -(-n // 128) * 128)
    n_q_pad = -(-n // block_q) * block_q
    block_k = min(block_k, -(-n // 128) * 128)
    n_k_pad = -(-n // block_k) * block_k
    n_tab = max(n_q_pad, n_k_pad)
    kwargs = _specs(interpret)
    seed_spec = _seed_spec(interpret)
    tab_spec = pl.BlockSpec((1, n_tab, d), lambda b, i: (0, 0, 0), **kwargs)
    cosf, sinf = _pad_tables(cos, sin, n, d, n_tab)
    in_specs = [
        seed_spec,
        pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), **kwargs),
        pl.BlockSpec((1, n_k_pad, d), lambda b, i: (b, 0, 0), **kwargs),
        pl.BlockSpec((1, n_k_pad, d), lambda b, i: (b, 0, 0), **kwargs),
        tab_spec,
        tab_spec,
    ]
    args = (seed, _pad_seq(q, n_q_pad), _pad_seq(k, n_k_pad),
            _pad_seq(v, n_k_pad), cosf, sinf)
    grid = (bh, n_q_pad // block_q)
    common = dict(kv_len=n, block_k=block_k, scale=scale, rate=rate)
    if not need_lse:
        out = pl.pallas_call(
            functools.partial(_flash_kernel, **common),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                                   **kwargs),
            out_shape=jax.ShapeDtypeStruct((bh, n_q_pad, d), q.dtype),
            interpret=interpret,
        )(*args)
        return out[:, :n, :], None
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel_lse, **common),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), **kwargs),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0), **kwargs),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, n_q_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n_q_pad, 1), jnp.float32),
        ),
        interpret=interpret,
        **_train_vmem_params(interpret),
    )(*args)
    return out[:, :n, :], lse


def _seed_spec(interpret):
    if pltpu is not None and not interpret:
        return pl.BlockSpec(memory_space=pltpu.SMEM)
    # grid-rank-agnostic index map: this helper serves 1-D and 2-D grids
    return pl.BlockSpec((1,), lambda *_: (0,))


def _flash_backward(q, k, v, o, lse_pad, do, seed, cos, sin, block_q,
                    block_k, interpret, rate):
    bh, n, d = q.shape
    scale = d**-0.5
    # identical tiling to the training forward — see _train_block_cap for
    # why (dropout mask regeneration) and for the VMEM constraint
    cap = _train_block_cap()
    block_q = min(block_q, cap, -(-n // 128) * 128)
    block_k = min(block_k, cap, -(-n // 128) * 128)
    n_q_pad = -(-n // block_q) * block_q
    n_k_pad = -(-n // block_k) * block_k
    n_tab = max(n_q_pad, n_k_pad)
    kwargs = _specs(interpret)
    seed_spec = _seed_spec(interpret)
    tab_spec = pl.BlockSpec((1, n_tab, d), lambda b, i: (0, 0, 0), **kwargs)
    cosf, sinf = _pad_tables(cos, sin, n, d, n_tab)
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )  # (bh, n)
    qp, kp, vp = _pad_seq(q, n_q_pad), _pad_seq(k, n_k_pad), _pad_seq(v, n_k_pad)
    dop = _pad_seq(do.astype(q.dtype), n_q_pad)
    deltap = jnp.pad(delta, ((0, 0), (0, n_q_pad - n)))[..., None]
    # the training forward shares this cap, so its q padding matches and this
    # re-pad is a no-op kept as a cheap shape-safety net
    lse_pad = _pad_seq(lse_pad[:, :n, :], n_q_pad)

    q_spec = pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), **kwargs)
    q_full = pl.BlockSpec((1, n_q_pad, d), lambda b, i: (b, 0, 0), **kwargs)
    k_full = pl.BlockSpec((1, n_k_pad, d), lambda b, i: (b, 0, 0), **kwargs)
    k_spec = pl.BlockSpec((1, block_k, d), lambda b, i: (b, i, 0), **kwargs)
    row_spec = pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0), **kwargs)
    row_full = pl.BlockSpec((1, n_q_pad, 1), lambda b, i: (b, 0, 0), **kwargs)

    dq = pl.pallas_call(
        functools.partial(
            _flash_dq_kernel, kv_len=n, block_k=block_k, scale=scale, rate=rate
        ),
        grid=(bh, n_q_pad // block_q),
        in_specs=[seed_spec, q_spec, k_full, k_full, tab_spec, tab_spec,
                  q_spec, row_spec, row_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((bh, n_q_pad, d), q.dtype),
        interpret=interpret,
        **_train_vmem_params(interpret),
    )(seed, qp, kp, vp, cosf, sinf, dop, lse_pad, deltap)

    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_dkv_kernel, q_len=n, block_q=block_q, scale=scale, rate=rate
        ),
        grid=(bh, n_k_pad // block_k),
        in_specs=[seed_spec, q_full, k_spec, k_spec, tab_spec, tab_spec,
                  q_full, row_full, row_full],
        out_specs=(k_spec, k_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bh, n_k_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n_k_pad, d), q.dtype),
        ),
        interpret=interpret,
        **_train_vmem_params(interpret),
    )(seed, qp, kp, vp, cosf, sinf, dop, lse_pad, deltap)
    return dq[:, :n, :], dk[:, :n, :], dv[:, :n, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _flash_attention(q, k, v, seed, cos, sin, block_q, block_k, interpret,
                     rate):
    out, _ = _flash_forward(
        q, k, v, seed, cos, sin, block_q, block_k, interpret, rate,
        need_lse=False,
    )
    return out


def _flash_attention_fwd(q, k, v, seed, cos, sin, block_q, block_k, interpret,
                         rate):
    out, lse = _flash_forward(
        q, k, v, seed, cos, sin, block_q, block_k, interpret, rate,
        need_lse=True,
    )
    return out, (q, k, v, seed, cos, sin, out, lse)


def _flash_attention_bwd(block_q, block_k, interpret, rate, residuals, do):
    q, k, v, seed, cos, sin, o, lse = residuals
    dq, dk, dv = _flash_backward(
        q, k, v, o, lse, do, seed, cos, sin, block_q, block_k, interpret, rate
    )
    return dq, dk, dv, None, None, None


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_k", "interpret", "dropout_rate"),
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
    dropout_rate: float = 0.0,
    seed=None,
    rope_cos=None,
    rope_sin=None,
) -> jnp.ndarray:
    """Softmax attention over (bh, seq, head_dim) with 1/sqrt(d) scaling.

    Equivalent to `softmax(q k^T / sqrt(d)) v` per leading batch entry, with
    optional dropout on the (post-softmax) attention probabilities seeded by
    `seed` (an int32 scalar/array; required when dropout_rate > 0).
    Differentiable: the backward pass runs flash-style Pallas kernels too
    (O(N) memory) and regenerates the dropout mask from the seed, so the
    training path never materializes the probability matrix either.
    """
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape((1,))
    return _flash_attention(
        q, k, v, seed, rope_cos, rope_sin, block_q, block_k, interpret,
        float(dropout_rate),
    )


def flash_attention_available() -> bool:
    """True when running on a backend with Pallas TPU support."""
    if pltpu is None:
        return False
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:  # pragma: no cover
        return False
