"""Fully-fused frequency-axis roformer block as one Pallas kernel.

The frontend's frequency-axis partial transformer (reference:
beat_this/model/beat_tracker.py:206-301 — attention + feed-forward across
F in {32, 16, 8} frequency bins for batch*time ~ 24k independent items) is
HBM-bound when expressed as separate ops: the (items, F, C) activations are
~50 MB per pass at inference batch 16 and the rmsnorm / qkv projection /
attention / gating / out projection / residual / feed-forward chain reads
and writes them ~12 times (~600 MB of HBM traffic per block).

The forward kernel performs the ENTIRE block — rmsnorm -> qkv projection ->
RoPE -> block-diagonal packed attention -> per-head sigmoid gating -> out
projection -> residual -> rmsnorm -> W1 -> exact GELU -> W2 -> residual —
in one VMEM-resident pass: each activation row is read from HBM once and
written once, with all weights (< 1 MB) held in VMEM across the grid. The
attention uses the same packing trick as ops/small_attention.py: 128 // F
items share one (128, 128) score matrix with off-diagonal blocks masked,
softmax in base 2 with the scale folded into q.

Training runs through a custom VJP: all four dropout sites (attention
probabilities, attention output, FF hidden, FF output) are regenerated
in-kernel from a seed (never stored), and one backward kernel recomputes the
forward quantities block-by-block and produces the input gradient plus every
parameter gradient, accumulated across the grid in VMEM-resident output
refs. Nothing quadratic or mask-shaped ever touches HBM.

Semantics match `attention_block` + `ff_residual` (beat_this_tpu/model/
layers.py) to bfloat16 tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from beat_this_tpu.ops.fused_ff import _erf, _gelu_exact

try:
    from jax.experimental.pallas import tpu as pltpu

    _MEMORY_SPACE = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _MEMORY_SPACE = None

_PACK_ROWS = 128  # rows per packed attention score matrix
_BLOCK_ROWS = 1024  # activation rows per forward grid program
_BLOCK_ROWS_BWD = 512  # smaller: the backward holds many more live buffers
_HEAD_DIM = 32
# Eval-only score-tile width: the no-dropout forward computes block-diagonal
# scores in (_SCORE_ROWS_EVAL, _SCORE_ROWS_EVAL) tiles instead of per-pack
# (128, 128) ones. The off-diagonal area is masked waste, but one
# (512, 32) x (32, 512) MXU dot beats four serial (128, 32) x (32, 128)
# dots on the Mosaic pipeline when the per-head loop multiplies the dot
# count (measured ~13% at C=128/4 heads, ~2% at C=64/2 heads, no win at
# C=32/1 head — see tools/bench_fused_freq_rows.py --score-rows; the
# heads > 1 gate below). Training keeps 128-row packs: the attention-
# dropout masks are salted per (pack, head) and must regenerate
# identically in the backward kernel.
_SCORE_ROWS_EVAL = 512

# dropout site ids (mixed into the PRNG salt)
_SITE_ATTN, _SITE_ATTN_OUT, _SITE_FF_HID, _SITE_FF_OUT = 0, 1, 2, 3


def _rms(x32, gamma):
    norm = jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True))
    c = x32.shape[-1]
    return x32 / jnp.maximum(norm, 1e-12) * (c**0.5) * gamma


def _rms_parts(x32, gamma):
    """Return (g32, n, r): normalized output, unit-direction rows, norms —
    the quantities the backward needs."""
    r = jnp.maximum(
        jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True)), 1e-12
    )
    n = x32 / r
    c = x32.shape[-1]
    return n * (c**0.5) * gamma, n, r


def _rms_bwd(dg32, n, r, gamma, c):
    """VJP of `_rms` w.r.t. x: (I - n n^T)/r applied to dg * gamma * sqrt(C)."""
    w = dg32 * gamma * (c**0.5)
    return (w - n * jnp.sum(n * w, axis=-1, keepdims=True)) / r


def _gelu_grad(z):
    """d/dz of the exact-erf GELU (matches jax.nn.gelu approximate=False)."""
    phi = jnp.exp(-0.5 * z * z) * (1.0 / np.sqrt(2.0 * np.pi))
    cdf = 0.5 * (1.0 + _erf(z * (2.0**-0.5)))
    return cdf + z * phi


def _dropmask(seed_ref, pid, site, sub, shape, rate):
    """Deterministic keep mask scaled by 1/keep; identical bits regenerate
    for the same (seed, program, site, sub) in forward and backward."""
    salt = ((seed_ref[0] + pid * 7919) * 4 + site) * 1000003 + sub
    pltpu.prng_seed(salt)
    bits = pltpu.prng_random_bits(shape)
    threshold = np.uint32(int(rate * 4294967296.0))
    keep = pltpu.bitcast(bits, jnp.uint32) >= threshold
    return keep.astype(jnp.float32) / (1.0 - rate)


def _qkv_of(g, wqkv_ref):
    return jax.lax.dot_general(
        g, wqkv_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(g.dtype)  # (rows, 3C), column order (qkv, head, head_dim)


def _head_qkv(qkv, sl, h, c, cos, sin, dtype):
    """Rotated (q*scale*log2e, k, v, q_unscaled) for one pack and head."""
    from beat_this_tpu.ops.flash_attention import LOG2E, rope_rotate

    scale = _HEAD_DIM**-0.5
    d0 = h * _HEAD_DIM
    q_rot = rope_rotate(
        qkv[sl, d0 : d0 + _HEAD_DIM].astype(jnp.float32), cos, sin
    )
    q = (q_rot * (scale * LOG2E)).astype(dtype)
    k = rope_rotate(
        qkv[sl, c + d0 : c + d0 + _HEAD_DIM].astype(jnp.float32), cos, sin
    ).astype(dtype)
    v = qkv[sl, 2 * c + d0 : 2 * c + d0 + _HEAD_DIM]
    return q, k, v, q_rot.astype(dtype)


def _attention(qkv, c, heads, f, cos, sin, same, seed_ref, rate, dtype,
               want_stash=False):
    """Packed block-diagonal attention over all packs and heads.

    Returns o (rows, C) in `dtype`; with `want_stash` also returns the
    per-(pack, head) forward quantities (q_scaled, k, v, q_unscaled,
    pre-dropout e, l) so the backward can reuse them instead of recomputing
    the whole rope + score + exp pass (all of it stays in VMEM: ~1 MB at
    C=128 and 512 rows)."""
    from beat_this_tpu.ops.small_attention import _packed_exp

    rows = qkv.shape[0]
    if (
        rate == 0.0
        and not want_stash
        and heads > 1  # measured: no win at heads == 1 (C = 32)
        and _SCORE_ROWS_EVAL > _PACK_ROWS
        and rows % min(_SCORE_ROWS_EVAL, rows) == 0  # no silent tail drop
    ):
        return _attention_wide(qkv, c, heads, f, cos, sin, dtype)
    pack_outs = []
    stash = []
    for p in range(rows // _PACK_ROWS):
        sl = slice(p * _PACK_ROWS, (p + 1) * _PACK_ROWS)
        head_outs = []
        for h in range(heads):
            q, k, v, q_unscaled = _head_qkv(qkv, sl, h, c, cos, sin, dtype)
            e, l = _packed_exp(q, k, same)
            if want_stash:
                stash.append((q, k, v, q_unscaled, e, l))
            ed = e
            if rate > 0.0:
                ed = e * _dropmask(
                    seed_ref, pl.program_id(0), _SITE_ATTN, p * heads + h,
                    e.shape, rate,
                )
            head_outs.append(
                (
                    jax.lax.dot_general(
                        ed.astype(dtype), v,
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
    return (o, stash) if want_stash else o


def _attention_wide(qkv, c, heads, f, cos, sin, dtype):
    """Eval-only packed attention over (_SCORE_ROWS_EVAL,)-row score tiles.

    Mathematically identical to the per-pack path: cross-item score entries
    are masked to -inf before the softmax, so they contribute exp2(-inf)=0
    to both the numerator and the row sums. Computing the wasted
    off-diagonal area is still a net win — the kernel's serial tiny dots
    are pipeline-latency bound, not FLOPs bound (tools/bench_fused_freq_rows.py).
    """
    from beat_this_tpu.ops.flash_attention import LOG2E, rope_rotate

    rows = qkv.shape[0]
    sr = min(_SCORE_ROWS_EVAL, rows)
    reps = sr // _PACK_ROWS
    cos_w = jnp.tile(cos, (reps, 1))  # tables repeat every 128 packed rows
    sin_w = jnp.tile(sin, (reps, 1))
    same = (
        jax.lax.broadcasted_iota(jnp.int32, (sr, sr), 0) // f
        == jax.lax.broadcasted_iota(jnp.int32, (sr, sr), 1) // f
    )
    scale = _HEAD_DIM**-0.5
    tile_outs = []
    for sb in range(rows // sr):
        sl = slice(sb * sr, (sb + 1) * sr)
        head_outs = []
        for h in range(heads):
            d0 = h * _HEAD_DIM
            q = (
                rope_rotate(
                    qkv[sl, d0 : d0 + _HEAD_DIM].astype(jnp.float32),
                    cos_w, sin_w,
                )
                * (scale * LOG2E)
            ).astype(dtype)
            k = rope_rotate(
                qkv[sl, c + d0 : c + d0 + _HEAD_DIM].astype(jnp.float32),
                cos_w, sin_w,
            ).astype(dtype)
            v = qkv[sl, 2 * c + d0 : 2 * c + d0 + _HEAD_DIM]
            s = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = jnp.where(same, s, -jnp.inf)
            e = jnp.exp2(s - jnp.max(s, axis=1, keepdims=True))
            l = jnp.sum(e, axis=1, keepdims=True)
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
        tile_outs.append(
            head_outs[0] if heads == 1 else jnp.concatenate(head_outs, axis=1)
        )
    return tile_outs[0] if len(tile_outs) == 1 else jnp.concatenate(tile_outs, axis=0)


def _gates_sig(g, wg_ref, bg_ref):
    """(rows, 128) sigmoid gates in float32; wg/bg are zero-padded to 128
    lanes (heads in {1,2,4} is too narrow for a TPU tile)."""
    pre = jax.lax.dot_general(
        g, wg_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bg_ref[...]
    return jax.nn.sigmoid(pre)


def _gate_full(sig32, rows, c, heads, dtype):
    if heads == 1:
        return jnp.broadcast_to(sig32[:, :1], (rows, c)).astype(dtype)
    return jnp.concatenate(
        [
            jnp.broadcast_to(sig32[:, h : h + 1], (rows, _HEAD_DIM))
            for h in range(heads)
        ],
        axis=1,
    ).astype(dtype)


def _fused_freq_kernel(
    seed_ref, x_ref, ga_ref, wqkv_ref, wg_ref, bg_ref, wout_ref,
    gf_ref, w1_ref, b1_ref, w2_ref, b2_ref, cos_ref, sin_ref, o_ref,
    *, f, heads, rate,
):
    from beat_this_tpu.ops.small_attention import _same_item_mask

    x = x_ref[...]  # (rows, C) in the compute dtype
    rows, c = x.shape
    dtype = x.dtype
    pid = pl.program_id(0)

    # --- attention branch ---
    g = _rms(x.astype(jnp.float32), ga_ref[...]).astype(dtype)
    qkv = _qkv_of(g, wqkv_ref)
    same = _same_item_mask(f)
    o = _attention(
        qkv, c, heads, f, cos_ref[...], sin_ref[...], same, seed_ref, rate,
        dtype,
    )
    sig32 = _gates_sig(g, wg_ref, bg_ref)
    attn = jax.lax.dot_general(
        o * _gate_full(sig32, rows, c, heads, dtype), wout_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if rate > 0.0:
        attn = attn * _dropmask(
            seed_ref, pid, _SITE_ATTN_OUT, 0, attn.shape, rate
        )
    x2_32 = x.astype(jnp.float32) + attn
    x2 = x2_32.astype(dtype)

    # --- feed-forward branch (same math as ops/fused_ff.py) ---
    g2 = _rms(x2_32, gf_ref[...])
    h1 = jax.lax.dot_general(
        g2.astype(dtype), w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...]
    h1 = _gelu_exact(h1)
    if rate > 0.0:
        h1 = h1 * _dropmask(seed_ref, pid, _SITE_FF_HID, 0, h1.shape, rate)
    y = jax.lax.dot_general(
        h1.astype(dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...]
    if rate > 0.0:
        y = y * _dropmask(seed_ref, pid, _SITE_FF_OUT, 0, y.shape, rate)
    o_ref[...] = (x2_32 + y).astype(o_ref.dtype)


def _fused_freq_bwd_kernel(
    seed_ref, x_ref, ga_ref, wqkv_ref, wg_ref, bg_ref, wout_ref,
    gf_ref, w1_ref, b1_ref, w2_ref, b2_ref, cos_ref, sin_ref, do_ref,
    dx_ref, dga_ref, dwqkv_ref, dwg_ref, dbg_ref, dwout_ref,
    dgf_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    *, f, heads, rate,
):
    from beat_this_tpu.ops.small_attention import _same_item_mask

    x = x_ref[...]
    do32 = do_ref[...].astype(jnp.float32)
    rows, c = x.shape
    dtype = x.dtype
    pid = pl.program_id(0)
    scale = _HEAD_DIM**-0.5
    cos = cos_ref[...]
    sin = sin_ref[...]
    same = _same_item_mask(f)

    @pl.when(pid == 0)
    def _init():
        for ref in (dga_ref, dwqkv_ref, dwg_ref, dbg_ref, dwout_ref,
                    dgf_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
            ref[...] = jnp.zeros_like(ref)

    # --- recompute the forward (block-local, all in VMEM) ---
    x32 = x.astype(jnp.float32)
    ga = ga_ref[...]
    g32, n1, r1 = _rms_parts(x32, ga)
    g = g32.astype(dtype)
    qkv = _qkv_of(g, wqkv_ref)
    o, stash = _attention(
        qkv, c, heads, f, cos, sin, same, seed_ref, rate, dtype,
        want_stash=True,
    )
    sig32 = _gates_sig(g, wg_ref, bg_ref)
    gate_full = _gate_full(sig32, rows, c, heads, dtype)
    og = o * gate_full
    attn = jax.lax.dot_general(
        og, wout_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if rate > 0.0:
        attn = attn * _dropmask(
            seed_ref, pid, _SITE_ATTN_OUT, 0, attn.shape, rate
        )
    x2_32 = x32 + attn
    gf = gf_ref[...]
    g2_32, n2, r2 = _rms_parts(x2_32, gf)
    g2 = g2_32.astype(dtype)
    pre1 = jax.lax.dot_general(
        g2, w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...]
    h1 = _gelu_exact(pre1)
    if rate > 0.0:
        h1d = h1 * _dropmask(seed_ref, pid, _SITE_FF_HID, 0, h1.shape, rate)
    else:
        h1d = h1
    h1d_b = h1d.astype(dtype)

    # --- backward: out = x2 + dropout(W2 gelu(W1 g2) + b2) ---
    d_y = do32
    if rate > 0.0:
        d_y = d_y * _dropmask(seed_ref, pid, _SITE_FF_OUT, 0, d_y.shape, rate)
    d_y_b = d_y.astype(dtype)
    dw2_ref[...] += jax.lax.dot_general(
        h1d_b, d_y_b,
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
        d_h1 = d_h1 * _dropmask(
            seed_ref, pid, _SITE_FF_HID, 0, d_h1.shape, rate
        )
    d_pre1 = d_h1 * _gelu_grad(pre1)
    d_pre1_b = d_pre1.astype(dtype)
    dw1_ref[...] += jax.lax.dot_general(
        g2, d_pre1_b,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1_ref[...] += jnp.sum(d_pre1, axis=0, keepdims=True)
    d_g2 = jax.lax.dot_general(
        d_pre1_b, w1_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dgf_ref[...] += jnp.sum(d_g2 * n2 * (c**0.5), axis=0, keepdims=True)
    # gradient flowing into x2: the residual plus the FF norm pullback
    d_x2 = do32 + _rms_bwd(d_g2, n2, r2, gf, c)

    # --- attention output chain ---
    d_attn = d_x2
    if rate > 0.0:
        d_attn = d_attn * _dropmask(
            seed_ref, pid, _SITE_ATTN_OUT, 0, d_attn.shape, rate
        )
    d_attn_b = d_attn.astype(dtype)
    dwout_ref[...] += jax.lax.dot_general(
        og, d_attn_b,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d_og = jax.lax.dot_general(
        d_attn_b, wout_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d_o = (d_og * gate_full.astype(jnp.float32)).astype(dtype)
    d_gatef = d_og * o.astype(jnp.float32)  # (rows, C) f32

    # per-head gate gradient: sum each head's 32 lanes, then sigmoid VJP;
    # assemble a (rows, 128) tensor whose padded columns are zero
    cols = []
    for h in range(heads):
        d_sig_h = jnp.sum(
            d_gatef[:, h * _HEAD_DIM : (h + 1) * _HEAD_DIM],
            axis=1, keepdims=True,
        )
        s_h = sig32[:, h : h + 1]
        cols.append(d_sig_h * s_h * (1.0 - s_h))
    if heads < _PACK_ROWS:
        cols.append(jnp.zeros((rows, _PACK_ROWS - heads), jnp.float32))
    d_pregate = jnp.concatenate(cols, axis=1)  # (rows, 128)
    d_pregate_b = d_pregate.astype(dtype)
    dwg_ref[...] += jax.lax.dot_general(
        g, d_pregate_b,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbg_ref[...] += jnp.sum(d_pregate, axis=0, keepdims=True)
    d_g = jax.lax.dot_general(
        d_pregate_b, wg_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # --- attention backward per pack and head (forward quantities reused
    # from the stash; only the dropout masks regenerate) ---
    from beat_this_tpu.ops.flash_attention import rope_rotate_inv

    pack_dqkv = []
    for p in range(rows // _PACK_ROWS):
        sl = slice(p * _PACK_ROWS, (p + 1) * _PACK_ROWS)
        dq_cols, dk_cols, dv_cols = [], [], []
        for h in range(heads):
            q, k, v, q_unscaled, e, l = stash[p * heads + h]
            probs = e / l
            d_o_h = d_o[sl, h * _HEAD_DIM : (h + 1) * _HEAD_DIM]
            dp = jax.lax.dot_general(
                d_o_h, v,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if rate > 0.0:
                mask = _dropmask(
                    seed_ref, pid, _SITE_ATTN, p * heads + h, dp.shape, rate
                )
                p_dropped = probs * mask
                dp = dp * mask
            else:
                p_dropped = probs
            dv_cols.append(
                jax.lax.dot_general(
                    p_dropped.astype(dtype), d_o_h,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dtype)
            )
            delta = jnp.sum(probs * dp, axis=1, keepdims=True)
            ds = (probs * (dp - delta)).astype(dtype)
            dq_rot = jax.lax.dot_general(
                ds, k,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dk_rot = jax.lax.dot_general(
                ds, q_unscaled,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dq_cols.append(
                (rope_rotate_inv(dq_rot, cos, sin) * scale).astype(dtype)
            )
            dk_cols.append(
                (rope_rotate_inv(dk_rot, cos, sin) * scale).astype(dtype)
            )
        pack_dqkv.append(jnp.concatenate(dq_cols + dk_cols + dv_cols, axis=1))
    d_qkv = (
        pack_dqkv[0] if len(pack_dqkv) == 1 else jnp.concatenate(pack_dqkv, axis=0)
    )  # (rows, 3C) in dtype, column order (qkv, head, head_dim)

    dwqkv_ref[...] += jax.lax.dot_general(
        g, d_qkv,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d_g = d_g + jax.lax.dot_general(
        d_qkv, wqkv_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dga_ref[...] += jnp.sum(d_g * n1 * (c**0.5), axis=0, keepdims=True)
    dx_ref[...] = (d_x2 + _rms_bwd(d_g, n1, r1, ga, c)).astype(dx_ref.dtype)


# block-spec and rope-table helpers are shared with the sibling kernels
from beat_this_tpu.ops.flash_attention import _seed_spec, _specs  # noqa: E402


def _rope_full_tables(rope_cos, rope_sin, f):
    """Half-width (f, 16) tables -> (_PACK_ROWS, 32) full-width float32
    (same layout as ops/small_attention._full_tables)."""
    from beat_this_tpu.ops.small_attention import _full_tables

    return _full_tables(rope_cos, rope_sin, f, _HEAD_DIM)


def _pad_rows(x2, padded, rows):
    return jnp.pad(x2, ((0, padded - rows), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16, 17))
def _fused_freq(
    x2, ga, wqkv, wg, bg, wout, gf, w1, b1, w2, b2, cosf, sinf, seed,
    f, heads, rate, interpret,
):
    """Flat-tensor core: x2 is (rows, C) already padded to _BLOCK_ROWS."""
    return _fused_freq_fwd_call(
        x2, ga, wqkv, wg, bg, wout, gf, w1, b1, w2, b2, cosf, sinf, seed,
        f, heads, rate, interpret,
    )


def _fused_freq_fwd_call(
    x2, ga, wqkv, wg, bg, wout, gf, w1, b1, w2, b2, cosf, sinf, seed,
    f, heads, rate, interpret,
):
    padded, c = x2.shape
    kwargs = _specs(interpret)
    # with dropout the forward must use the SAME row blocks as the backward:
    # the row-shaped dropout masks are salted by program id, and a block-size
    # mismatch would regenerate different masks in the two passes
    block = _BLOCK_ROWS_TRAIN if rate > 0.0 else _BLOCK_ROWS
    row_spec = pl.BlockSpec((block, c), lambda i: (i, 0), **kwargs)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), **kwargs)

    mult = w1.shape[1]
    return pl.pallas_call(
        functools.partial(_fused_freq_kernel, f=f, heads=heads, rate=rate),
        grid=(padded // block,),
        in_specs=[
            _seed_spec(interpret),
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
        out_shape=jax.ShapeDtypeStruct((padded, c), x2.dtype),
        interpret=interpret,
    )(seed, x2, ga, wqkv, wg, bg, wout, gf, w1, b1, w2, b2, cosf, sinf)


def _fused_freq_fwd(
    x2, ga, wqkv, wg, bg, wout, gf, w1, b1, w2, b2, cosf, sinf, seed,
    f, heads, rate, interpret,
):
    out = _fused_freq_fwd_call(
        x2, ga, wqkv, wg, bg, wout, gf, w1, b1, w2, b2, cosf, sinf, seed,
        f, heads, rate, interpret,
    )
    return out, (x2, ga, wqkv, wg, bg, wout, gf, w1, b1, w2, b2, cosf, sinf,
                 seed)


def _fused_freq_bwd(f, heads, rate, interpret, residuals, do):
    (x2, ga, wqkv, wg, bg, wout, gf, w1, b1, w2, b2, cosf, sinf, seed) = residuals
    padded, c = x2.shape
    mult = w1.shape[1]
    kwargs = _specs(interpret)
    # backward uses smaller row blocks (it holds many more live buffers);
    # _BLOCK_ROWS is a multiple of _BLOCK_ROWS_BWD so the padding still fits
    row_spec = pl.BlockSpec((_BLOCK_ROWS_BWD, c), lambda i: (i, 0), **kwargs)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), **kwargs)

    out_specs = (
        row_spec,  # dx
        const_spec((1, c)),  # dga
        const_spec((c, 3 * c)),  # dwqkv
        const_spec((c, _PACK_ROWS)),  # dwg
        const_spec((1, _PACK_ROWS)),  # dbg
        const_spec((c, c)),  # dwout
        const_spec((1, c)),  # dgf
        const_spec((c, mult)),  # dw1
        const_spec((1, mult)),  # db1
        const_spec((mult, c)),  # dw2
        const_spec((1, c)),  # db2
    )
    out_shapes = (
        jax.ShapeDtypeStruct((padded, c), x2.dtype),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),
        jax.ShapeDtypeStruct((c, _PACK_ROWS), jnp.float32),
        jax.ShapeDtypeStruct((1, _PACK_ROWS), jnp.float32),
        jax.ShapeDtypeStruct((c, c), jnp.float32),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((c, mult), jnp.float32),
        jax.ShapeDtypeStruct((1, mult), jnp.float32),
        jax.ShapeDtypeStruct((mult, c), jnp.float32),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
    )
    outs = pl.pallas_call(
        functools.partial(_fused_freq_bwd_kernel, f=f, heads=heads, rate=rate),
        grid=(padded // _BLOCK_ROWS_BWD,),
        in_specs=[
            _seed_spec(interpret),
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
            row_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(seed, x2, ga, wqkv, wg, bg, wout, gf, w1, b1, w2, b2, cosf, sinf,
      do.astype(x2.dtype))
    (dx, dga, dwqkv, dwg, dbg, dwout, dgf, dw1, db1, dw2, db2) = outs
    return (
        dx,
        dga.astype(ga.dtype),
        dwqkv.astype(wqkv.dtype),
        dwg.astype(wg.dtype),
        dbg.astype(bg.dtype),
        dwout.astype(wout.dtype),
        dgf.astype(gf.dtype),
        dw1.astype(w1.dtype),
        db1.astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.astype(b2.dtype),
        None,  # cosf
        None,  # sinf
        None,  # seed
    )


_fused_freq.defvjp(_fused_freq_fwd, _fused_freq_bwd)


# the dropout salts depend on the program id, and the backward runs with
# smaller row blocks than the forward — the row-shaped dropout sites
# (attention-out, FF) would regenerate DIFFERENT masks. To keep forward and
# backward masks identical, training pins both passes to the same block size.
_BLOCK_ROWS_TRAIN = _BLOCK_ROWS_BWD


@functools.partial(
    jax.jit, static_argnames=("interpret", "dropout_rate")
)
def fused_freq_roformer(
    x: jnp.ndarray,
    attn_params: dict,
    ff_params: dict,
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    interpret: bool = False,
    dropout_rate: float = 0.0,
    seed=None,
) -> jnp.ndarray:
    """One frequency-axis roformer block over (items, F, C).

    Equivalent (to bfloat16 tolerance) to:
        x = x + attention_block(attn_params, x, (rope_cos, rope_sin), C // 32)
        x = ff_residual(ff_params, x)
    with F | 128 and C a multiple of 32 (head_dim). Differentiable: a custom
    VJP runs one backward kernel producing the input gradient and every
    parameter gradient. `dropout_rate` > 0 applies dropout at the four torch
    sites (attention probabilities, attention output, FF hidden, FF output),
    regenerated in-kernel from `seed` (int32) in both passes.
    """
    items, f, c = x.shape
    if 128 % f != 0:
        raise ValueError(f"frequency axis {f} must divide {_PACK_ROWS}")
    heads = c // _HEAD_DIM
    dtype = x.dtype
    rate = float(dropout_rate)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape((1,))

    rows = items * f
    block = _BLOCK_ROWS_TRAIN if rate > 0.0 else _BLOCK_ROWS
    padded = -(-rows // block) * block
    x2 = _pad_rows(x.reshape(rows, c), padded, rows)
    cosf, sinf = _rope_full_tables(rope_cos, rope_sin, f)

    wdtype = dtype if dtype == jnp.bfloat16 else jnp.float32
    out = _fused_freq(
        x2,
        attn_params["norm_gamma"].astype(jnp.float32).reshape(1, c),
        attn_params["qkv_w"].astype(wdtype),
        jnp.pad(
            attn_params["gates_w"].astype(wdtype),
            ((0, 0), (0, _PACK_ROWS - heads)),
        ),
        jnp.pad(
            attn_params["gates_b"].astype(jnp.float32).reshape(1, heads),
            ((0, 0), (0, _PACK_ROWS - heads)),
        ),
        attn_params["out_w"].astype(wdtype),
        ff_params["norm_gamma"].astype(jnp.float32).reshape(1, c),
        ff_params["w1"].astype(wdtype),
        ff_params["b1"].astype(jnp.float32).reshape(1, -1),
        ff_params["w2"].astype(wdtype),
        ff_params["b2"].astype(jnp.float32).reshape(1, c),
        cosf,
        sinf,
        seed,
        f,
        heads,
        rate,
        interpret,
    )
    return out[:rows].reshape(items, f, c)
