"""Functional building blocks for the BeatThis model, JAX/TPU-native.

Pure functions over explicit parameter pytrees (no module framework): RMSNorm,
gated RoPE attention, feed-forward, batch norm, and 2-D convolutions in a
time-major NHWC layout. Semantics track the reference roformer
(reference: beat_this/model/roformer.py) and frontend
(reference: beat_this/model/beat_tracker.py:108-168) but the data layout is
redesigned for TPU: activations are (batch, time, freq, channels) so that the
frequency-axis attention needs no transpose at all, and convolutions run as
NHWC/HWIO which XLA maps directly onto the MXU.

Parameter conventions (differing from torch on purpose — documented in
beat_this_tpu/io/torch_ckpt.py, which performs the layout conversion):
  * linear weights are stored (in_features, out_features) for `x @ w`,
  * conv kernels are stored (k_time, k_freq, in_ch, out_ch) i.e. HWIO with
    H = time, W = freq,
  * batch-norm state is {"gamma", "beta", "mean", "var"} in float32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from beat_this_tpu.ops.rotary import apply_rope

BN_EPS = 1e-5  # torch BatchNorm default
BN_MOMENTUM = 0.1  # torch BatchNorm default

# sequences at least this long route through the Pallas flash-attention
# kernel on TPU (forward and custom-VJP backward; attention-probability
# dropout is regenerated in-kernel from a seed in both passes)
FLASH_MIN_SEQ = 512


@functools.lru_cache(maxsize=1)
def _flash_enabled() -> bool:
    import os

    if os.environ.get("BEAT_THIS_NO_FLASH"):
        return False
    from beat_this_tpu.ops.flash_attention import flash_attention_available

    return flash_attention_available()


def _kernel_seed(
    rng: Optional[jax.Array], rate: float
) -> Optional[jax.Array]:
    """Derive the (1,) int32 seed the Pallas kernels regenerate their
    in-kernel dropout masks from (forward and backward alike); None when
    dropout is off."""
    if rng is None or rate <= 0.0:
        return None
    return jax.random.randint(rng, (1,), 0, 2**31 - 1, dtype=jnp.int32)


def rms_norm(x: jnp.ndarray, gamma: jnp.ndarray) -> jnp.ndarray:
    """L2-normalize over the last axis, scale by sqrt(dim) * gamma.

    Matches reference roformer.RMSNorm (beat_this/model/roformer.py:22-32):
    `F.normalize(x, dim=-1) * size**0.5 * gamma`, where F.normalize clamps the
    norm at 1e-12. The norm is accumulated in float32 for stability.
    """
    dim = x.shape[-1]
    x32 = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True))
    normed = x32 / jnp.maximum(norm, 1e-12)
    out = normed * (dim**0.5) * gamma.astype(jnp.float32)
    return out.astype(x.dtype)


def _dropout(x: jnp.ndarray, rate: float, rng: Optional[jax.Array]) -> jnp.ndarray:
    if rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    key_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention over (..., heads, seq, head_dim).

    Equivalent to `F.scaled_dot_product_attention` (reference:
    beat_this/model/roformer.py:78-80): scale 1/sqrt(head_dim), softmax in
    float32, optional dropout on the attention probabilities (training only).

    `key_mask`: optional (batch, seq) bool; False keys get probability zero
    (exactly: their logits become -inf before the float32 softmax), making the
    result bit-equal to running the attention on only the True-key prefix.
    """
    head_dim = q.shape[-1]
    scale = head_dim**-0.5
    logits = jnp.einsum(
        "...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if key_mask is not None:
        neg_inf = jnp.asarray(-jnp.inf, logits.dtype)
        logits = jnp.where(key_mask[:, None, None, :], logits, neg_inf)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = _dropout(probs, dropout_rate, rng)
    return jnp.einsum(
        "...qk,...kd->...qd", probs.astype(q.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


def attention_block(
    params: dict,
    x: jnp.ndarray,
    rope: tuple[jnp.ndarray, jnp.ndarray],
    heads: int,
    *,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    key_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Pre-norm gated rotary attention (reference roformer.Attention,
    beat_this/model/roformer.py:83-132). Returns the residual branch only.

    params: {"norm_gamma", "qkv_w" (d, 3*inner), "gates_w" (d, heads),
             "gates_b" (heads,), "out_w" (inner, d)}
    key_mask: optional (b, n) bool marking valid key positions; used by the
    inference engine to run sequences shorter than the compiled bucket length
    with exact short-sequence semantics (masked batches take the XLA path).
    """
    b, n, d = x.shape
    g = rms_norm(x, params["norm_gamma"])
    qkv = g @ params["qkv_w"].astype(g.dtype)  # (b, n, 3 * inner)
    inner = qkv.shape[-1] // 3
    head_dim = inner // heads
    # torch layout "(qkv h d)": qkv slowest, then head, then head_dim
    qkv = qkv.reshape(b, n, 3, heads, head_dim)
    qkv = jnp.moveaxis(qkv, 2, 0)  # (3, b, n, heads, head_dim)
    q, k, v = (jnp.swapaxes(t, 1, 2) for t in qkv)  # (b, heads, n, head_dim)
    cos, sin = rope
    rng_attn = rng_out = None
    if rng is not None:
        rng_attn, rng_out = jax.random.split(rng)
    # flash path (forward + custom-VJP backward); RoPE is folded into the
    # kernels (saving two full memory passes over q and k) and attention-
    # probability dropout is regenerated in-kernel from a seed
    if key_mask is None and n >= FLASH_MIN_SEQ and _flash_enabled():
        from beat_this_tpu.ops.flash_attention import flash_attention

        rate = dropout_rate if rng_attn is not None else 0.0
        seed = _kernel_seed(rng_attn, rate)
        out = flash_attention(
            q.reshape(b * heads, n, head_dim),
            k.reshape(b * heads, n, head_dim),
            v.reshape(b * heads, n, head_dim),
            dropout_rate=rate,
            seed=seed,
            rope_cos=cos,
            rope_sin=sin,
        ).reshape(b, heads, n, head_dim)
    elif key_mask is None and n <= 32 and 128 % n == 0 and _flash_enabled():
        # frequency-axis attention: thousands of tiny independent problems;
        # the packed block-diagonal kernel keeps probabilities in VMEM
        # (training too: custom VJP + in-kernel seeded dropout)
        from beat_this_tpu.ops.small_attention import small_attention

        rate = dropout_rate if rng_attn is not None else 0.0
        seed = _kernel_seed(rng_attn, rate)
        out = small_attention(
            q.reshape(b * heads, n, head_dim),
            k.reshape(b * heads, n, head_dim),
            v.reshape(b * heads, n, head_dim),
            rope_cos=cos,
            rope_sin=sin,
            dropout_rate=rate,
            seed=seed,
        ).reshape(b, heads, n, head_dim)
    else:
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        out = sdpa(
            q, k, v, dropout_rate=dropout_rate, rng=rng_attn, key_mask=key_mask
        )
    # per-head sigmoid gates computed from the normed input
    gates = g @ params["gates_w"].astype(g.dtype) + params["gates_b"].astype(g.dtype)
    out = out * jax.nn.sigmoid(jnp.swapaxes(gates, 1, 2))[..., None]
    out = jnp.swapaxes(out, 1, 2).reshape(b, n, inner)
    out = out @ params["out_w"].astype(out.dtype)
    return _dropout(out, dropout_rate, rng_out)


def feed_forward(
    params: dict,
    x: jnp.ndarray,
    *,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Pre-norm MLP with exact-erf GELU (reference roformer.FeedForward,
    beat_this/model/roformer.py:38-61). Returns the residual branch only.

    params: {"norm_gamma", "w1" (d, mult*d), "b1", "w2" (mult*d, d), "b2"}
    """
    rng1 = rng2 = None
    if rng is not None:
        rng1, rng2 = jax.random.split(rng)
    g = rms_norm(x, params["norm_gamma"])
    h = g @ params["w1"].astype(g.dtype) + params["b1"].astype(g.dtype)
    h = jax.nn.gelu(h, approximate=False)
    h = _dropout(h, dropout_rate, rng1)
    h = h @ params["w2"].astype(h.dtype) + params["b2"].astype(h.dtype)
    return _dropout(h, dropout_rate, rng2)


def ff_residual(
    params: dict,
    x: jnp.ndarray,
    *,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """`x + feed_forward(x)`, fused into one Pallas kernel.

    Eval (`rng is None`) uses the forward-only kernel; training uses the
    custom-VJP twin with in-kernel seeded dropout, whose backward recomputes
    the block from `x` — no hidden (n, 4*dim) activations or dropout masks
    are saved to HBM between passes."""
    if _flash_enabled():
        if rng is None:
            from beat_this_tpu.ops.fused_ff import fused_ff

            return fused_ff(
                x, params["norm_gamma"], params["w1"], params["b1"],
                params["w2"], params["b2"],
            )
        from beat_this_tpu.ops.fused_ff import fused_ff_train

        rate = float(dropout_rate)
        seed = _kernel_seed(rng, rate)
        return fused_ff_train(
            x, params["norm_gamma"], params["w1"], params["b1"],
            params["w2"], params["b2"], dropout_rate=rate, seed=seed,
        )
    return x + feed_forward(params, x, dropout_rate=dropout_rate, rng=rng)


def freq_roformer(
    attn_params: dict,
    ff_params: dict,
    x: jnp.ndarray,
    rope: tuple[jnp.ndarray, jnp.ndarray],
    heads: int,
    *,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """One frequency-axis roformer block on (items, F, C):
    `x + attention; + feed_forward`. On the no-dropout TPU path the whole
    block (norm, qkv, RoPE, packed attention, gates, out projection,
    residual, FF) runs as ONE Pallas kernel (`ops/fused_freq.py`) — the
    frequency path is HBM-bound, and the fusion reads/writes each activation
    row once instead of ~12 times."""
    f = x.shape[1]
    # the fused kernel hardcodes head_dim 32 (the model's only head size);
    # any other head_dim falls through to the composable path
    if (
        f <= 32
        and 128 % f == 0
        and x.shape[-1] == heads * 32
        and _flash_enabled()
    ):
        from beat_this_tpu.ops.fused_freq import fused_freq_roformer

        rate = dropout_rate if rng is not None else 0.0
        seed = _kernel_seed(rng, rate)
        return fused_freq_roformer(
            x, attn_params, ff_params, rope[0], rope[1],
            dropout_rate=rate, seed=seed,
        )
    rng_a = rng_f = None
    if rng is not None:
        rng_a, rng_f = jax.random.split(rng)
    x = x + attention_block(
        attn_params, x, rope, heads, dropout_rate=dropout_rate, rng=rng_a
    )
    return ff_residual(ff_params, x, dropout_rate=dropout_rate, rng=rng_f)


@functools.lru_cache(maxsize=1)
def _fused_time_enabled() -> bool:
    import os

    return not os.environ.get("BEAT_THIS_NO_FUSED_TIME")


@functools.lru_cache(maxsize=1)
def _fused_time_train_enabled() -> bool:
    import os

    return not os.environ.get("BEAT_THIS_NO_FUSED_TIME_TRAIN")


# Round 4 re-gridded the fused TRAINING kernels over (items, head_groups)
# — the eval kernel's geometry — so per-program VMEM is bounded by the
# <= 4 heads each group owns and every head count the model uses compiles
# on real hardware (round 3's all-heads-per-program version needed
# 126.86 MB scoped VMEM at heads=16 vs the v5e's 110 MB ceiling). The cap
# remains as an escape hatch for future geometries and for the router
# test; 16 covers the whole model (frontend 1/2/4, main transformer 16).
FUSED_TIME_TRAIN_MAX_HEADS = 16


def time_attention_train(
    attn_params: dict,
    x: jnp.ndarray,
    rope: tuple[jnp.ndarray, jnp.ndarray],
    heads: int,
    *,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Training-time time-axis attention residual BRANCH (caller adds x).

    On TPU the whole branch — norm, fused qkv, in-kernel RoPE, whole-
    sequence attention with in-kernel seeded dropout, per-head gating, out
    projection, out dropout — is ONE Pallas kernel with a custom VJP whose
    backward recomputes the branch from `x` (`ops/fused_time.py`). Compared
    to the flash path it stops paying HBM round trips for the norm, the
    (n, 3C) qkv tensor, the per-head split, and the gate/out-proj chain in
    BOTH passes. Falls back to `attention_block` off-TPU, when disabled
    via BEAT_THIS_NO_FUSED_TIME_TRAIN, above FUSED_TIME_TRAIN_MAX_HEADS,
    or at head counts the (items, head_groups) grid cannot tile
    (heads > 2 and not a multiple of 4)."""
    if (
        x.shape[1] >= FLASH_MIN_SEQ
        and x.shape[-1] == heads * 32
        and (heads <= 2 or heads % 4 == 0)
        and heads <= FUSED_TIME_TRAIN_MAX_HEADS
        and _flash_enabled()
        and _fused_time_train_enabled()
    ):
        from beat_this_tpu.ops.fused_time import fused_time_attention_train

        rate = float(dropout_rate) if rng is not None else 0.0
        seed = _kernel_seed(rng, rate)
        return fused_time_attention_train(
            x, attn_params, rope[0], rope[1], heads,
            dropout_rate=rate, seed=seed,
        )
    return attention_block(
        attn_params, x, rope, heads, dropout_rate=dropout_rate, rng=rng
    )


def time_roformer(
    attn_params: dict,
    ff_params: dict,
    x: jnp.ndarray,
    rope: tuple[jnp.ndarray, jnp.ndarray],
    heads: int,
) -> jnp.ndarray:
    """One time-axis roformer block on (items, T, C) at eval (no dropout):
    `x + attention; + feed_forward`. On TPU the whole block — norm, qkv,
    RoPE, whole-sequence attention, gates, out projection, residual, FF —
    runs as ONE Pallas kernel (`ops/fused_time.py`): the chain is HBM-bound,
    and the fusion reads/writes each sequence once instead of ~8 times.
    Training and masked (short-piece) batches keep the composable path."""
    if (
        x.shape[1] >= FLASH_MIN_SEQ
        and x.shape[-1] == heads * 32
        and (heads <= 2 or heads % 4 == 0)
        and _flash_enabled()
        and _fused_time_enabled()
    ):
        from beat_this_tpu.ops.fused_time import fused_time_roformer

        return fused_time_roformer(
            x, attn_params, ff_params, rope[0], rope[1], heads
        )
    x = x + attention_block(attn_params, x, rope, heads)
    return ff_residual(ff_params, x)


def batch_norm_apply(
    params: dict,
    x: jnp.ndarray,
    *,
    axis: int = -1,
    train: bool = False,
):
    """Batch normalization over all axes except `axis`.

    Eval mode folds running stats into a single scale/shift (XLA fuses this
    into the neighbouring conv). Train mode normalizes with biased batch
    variance and returns running stats updated with unbiased variance at
    momentum 0.1, matching torch BatchNorm1d/2d semantics used in the
    reference stem and frontend convs (beat_this/model/beat_tracker.py:113-125).

    Returns (y, new_stats) where new_stats == params' stats in eval mode.
    """
    gamma = params["gamma"].astype(jnp.float32)
    beta = params["beta"].astype(jnp.float32)
    axis = axis % x.ndim
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]
    reduce_axes = tuple(i for i in range(x.ndim) if i != axis)
    if not train:
        mean = params["mean"].astype(jnp.float32)
        var = params["var"].astype(jnp.float32)
        scale = gamma * lax.rsqrt(var + BN_EPS)
        shift = beta - mean * scale
        y = x.astype(jnp.float32) * scale.reshape(shape) + shift.reshape(shape)
        return y.astype(x.dtype), {"mean": params["mean"], "var": params["var"]}
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=reduce_axes)
    var = jnp.mean(jnp.square(x32), axis=reduce_axes) - jnp.square(mean)
    count = 1
    for i in reduce_axes:
        count *= x.shape[i]
    unbiased = var * (count / max(count - 1, 1))
    new_stats = {
        "mean": (1 - BN_MOMENTUM) * params["mean"] + BN_MOMENTUM * mean,
        "var": (1 - BN_MOMENTUM) * params["var"] + BN_MOMENTUM * unbiased,
    }
    scale = gamma * lax.rsqrt(var + BN_EPS)
    shift = beta - mean * scale
    y = x32 * scale.reshape(shape) + shift.reshape(shape)
    return y.astype(x.dtype), new_stats


def partial_roformer(
    params: dict,
    x: jnp.ndarray,
    direction: str,
    head_dim: int,
    *,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Single-direction partial roformer on (batch, time, freq, channels):
    attention + feed-forward across only the frequency axis ("f") or only the
    time axis ("t"). Equivalent of the reference's PartialRoformer
    (beat_this/model/beat_tracker.py:206-248), which the stock BeatThis model
    does not use but exposes for ablations.

    params: {"attn": attention params, "ff": feed-forward params}
    """
    from beat_this_tpu.ops.rotary import rope_tables

    direction = direction[0].lower()
    if direction not in "ft":
        raise ValueError(f"direction must be F or T, got {direction}")
    b, t, f, c = x.shape
    heads = c // head_dim
    rng_a = rng_f = None
    if rng is not None:
        rng_a, rng_f = jax.random.split(rng)
    if direction == "f":
        h = x.reshape(b * t, f, c)
        rope = rope_tables(f, head_dim)
    else:
        h = x.transpose(0, 2, 1, 3).reshape(b * f, t, c)
        rope = rope_tables(t, head_dim)
    h = h + attention_block(
        params["attn"], h, rope, heads, dropout_rate=dropout_rate, rng=rng_a
    )
    h = h + feed_forward(params["ff"], h, dropout_rate=dropout_rate, rng=rng_f)
    if direction == "f":
        return h.reshape(b, t, f, c)
    return h.reshape(b, f, t, c).transpose(0, 2, 1, 3)


def conv2d_tf(
    w: jnp.ndarray,
    x: jnp.ndarray,
    *,
    stride_freq: int,
    pad_time: int,
) -> jnp.ndarray:
    """2-D convolution over (batch, time, freq, channels), no bias.

    Kernel `w` is (k_time, k_freq, in_ch, out_ch); stride over time is always
    1 and over frequency `stride_freq`; time is zero-padded by `pad_time` on
    both sides, frequency is VALID. This realizes the reference's
    Conv2d(kernel=(freq_k, 3), stride=(freq_s, 1), padding=(0, 1))
    (beat_this/model/beat_tracker.py:115-122,155-162) in a layout where time
    is the image height — NHWC/HWIO, native for the TPU MXU.
    """
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, stride_freq),
        padding=((pad_time, pad_time), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
