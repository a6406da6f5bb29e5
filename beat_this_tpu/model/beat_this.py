"""The BeatThis model as a pure JAX function over an explicit parameter pytree.

Architecture (reference: beat_this/model/beat_tracker.py:18-203):
  stem:        (B,T,128) -> BN over mel bins -> conv (freq 4, time 3) stride
               (4,1) -> BN -> GELU -> (B,T,32,32)  [layout (B, time, freq, ch)]
  3 frontend blocks: partial F/T roformer (attention over freq bins, then over
               time) + conv (freq 2, time 3) stride (2,1) + BN + GELU;
               channels 32->64->128->256, freqs 32->16->8->4
  projection:  (B,T,4,256) -> (B,T,1024) in (channel, freq) order -> Linear 512
  main transformer: 6 pre-norm gated RoPE blocks, dim 512, 16 heads, final
               RMSNorm (reference: beat_this/model/roformer.py:138-181)
  head:        Linear 512->2; SumHead adds downbeat logits to beat logits in
               float32 (reference: beat_this/model/beat_tracker.py:304-330)

TPU-first design notes: activations are (batch, time, freq, channels) so the
frequency attention is a pure reshape; all matmuls/convs are NHWC/HWIO for the
MXU; a `compute_dtype` of bfloat16 gives mixed-precision inference/training
with float32 softmax, norms and head (mirroring the reference's fp16 autocast
with fp32 SumHead escape hatch).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from beat_this_tpu.model.layers import (
    attention_block,
    batch_norm_apply,
    conv2d_tf,
    feed_forward,
    ff_residual,
    freq_roformer,
    rms_norm,
    time_attention_train,
    time_roformer,
)
from beat_this_tpu.ops.rotary import rope_tables


def _kernels_on() -> bool:
    """True when the Pallas kernel path (flash / packed attention with
    custom VJPs) is active — see layers._flash_enabled."""
    from beat_this_tpu.model.layers import _flash_enabled

    return _flash_enabled()


@dataclass(frozen=True)
class BeatThisConfig:
    """Hyperparameters, defaults as the reference
    (beat_this/model/beat_tracker.py:38-49)."""

    spect_dim: int = 128
    transformer_dim: int = 512
    ff_mult: int = 4
    n_layers: int = 6
    head_dim: int = 32
    stem_dim: int = 32
    dropout_frontend: float = 0.1
    dropout_transformer: float = 0.2
    sum_head: bool = True
    partial_transformers: bool = True

    @classmethod
    def from_hparams(cls, hparams: dict) -> "BeatThisConfig":
        """Build from a reference checkpoint's `hyper_parameters` dict,
        keeping only keys the model understands (mirrors the signature
        filtering in reference beat_this/inference.py:72-78)."""
        kwargs: dict[str, Any] = {}
        for key in (
            "spect_dim",
            "transformer_dim",
            "ff_mult",
            "n_layers",
            "head_dim",
            "stem_dim",
            "sum_head",
            "partial_transformers",
        ):
            if key in hparams:
                kwargs[key] = hparams[key]
        dropout = hparams.get("dropout")
        if isinstance(dropout, dict):
            kwargs["dropout_frontend"] = dropout.get("frontend", 0.1)
            kwargs["dropout_transformer"] = dropout.get("transformer", 0.2)
        return cls(**kwargs)

    @property
    def frontend_dims(self) -> list[int]:
        return [self.stem_dim * (2**i) for i in range(3)]  # 32, 64, 128


# ---------------------------------------------------------------------------
# Initialization (reference beat_this/model/beat_tracker.py:170-186)
# ---------------------------------------------------------------------------


def _linear_init(rng, fan_in, fan_out, bias=True):
    p = {"w": jnp.asarray(0.02 * rng.standard_normal((fan_in, fan_out)), jnp.float32)}
    if bias:
        p["b"] = jnp.zeros((fan_out,), jnp.float32)
    return p


def _conv_init(rng, k_t, k_f, c_in, c_out):
    # kaiming normal, fan_out mode, relu gain (reference beat_tracker.py:176-179)
    fan_out = c_out * k_t * k_f
    std = float(np.sqrt(2.0 / fan_out))
    return {
        "w": jnp.asarray(
            std * rng.standard_normal((k_t, k_f, c_in, c_out)), jnp.float32
        )
    }


def _attention_init(rng, dim, heads, head_dim):
    inner = heads * head_dim
    return {
        "norm_gamma": jnp.ones((dim,), jnp.float32),
        "qkv_w": jnp.asarray(
            0.02 * rng.standard_normal((dim, 3 * inner)), jnp.float32
        ),
        "gates_w": jnp.asarray(0.02 * rng.standard_normal((dim, heads)), jnp.float32),
        "gates_b": jnp.zeros((heads,), jnp.float32),
        "out_w": jnp.asarray(0.02 * rng.standard_normal((inner, dim)), jnp.float32),
    }


def _ff_init(rng, dim, mult):
    inner = dim * mult
    return {
        "norm_gamma": jnp.ones((dim,), jnp.float32),
        "w1": jnp.asarray(0.02 * rng.standard_normal((dim, inner)), jnp.float32),
        "b1": jnp.zeros((inner,), jnp.float32),
        "w2": jnp.asarray(0.02 * rng.standard_normal((inner, dim)), jnp.float32),
        "b2": jnp.zeros((dim,), jnp.float32),
    }


def init_beat_this(rng, config: BeatThisConfig = BeatThisConfig()):
    """Initialize (params, state) pytrees. `state` holds batch-norm running
    statistics; `params` everything trained by gradient descent.

    `rng` may be an int seed or a jax PRNGKey (its raw bits seed a host-side
    numpy generator; parameter initialization follows the reference's
    distributions — beat_this/model/beat_tracker.py:170-186 — but not its
    bit-exact random stream).
    """
    c = config
    if isinstance(rng, (int, np.integer)):
        seed = int(rng)
    else:
        seed = int(np.asarray(jax.random.key_data(rng)).ravel()[-1])
    gen = np.random.default_rng(seed)

    class _Keys:
        def __iter__(self):
            return self

        def __next__(self):
            return gen

    keys = iter(_Keys())
    params: dict[str, Any] = {}
    state: dict[str, Any] = {}

    params["stem"] = {
        "bn1d": {"gamma": jnp.ones((c.spect_dim,)), "beta": jnp.zeros((c.spect_dim,))},
        "conv": _conv_init(next(keys), 3, 4, 1, c.stem_dim),
        "bn2d": {"gamma": jnp.ones((c.stem_dim,)), "beta": jnp.zeros((c.stem_dim,))},
    }
    state["stem"] = {
        "bn1d": {"mean": jnp.zeros((c.spect_dim,)), "var": jnp.ones((c.spect_dim,))},
        "bn2d": {"mean": jnp.zeros((c.stem_dim,)), "var": jnp.ones((c.stem_dim,))},
    }

    blocks = []
    blocks_state = []
    for dim in c.frontend_dims:
        heads = dim // c.head_dim
        block: dict[str, Any] = {}
        if c.partial_transformers:
            block["partial"] = {
                "attnF": _attention_init(next(keys), dim, heads, c.head_dim),
                "ffF": _ff_init(next(keys), dim, 4),
                "attnT": _attention_init(next(keys), dim, heads, c.head_dim),
                "ffT": _ff_init(next(keys), dim, 4),
            }
        block["conv"] = _conv_init(next(keys), 3, 2, dim, dim * 2)
        block["bn"] = {"gamma": jnp.ones((dim * 2,)), "beta": jnp.zeros((dim * 2,))}
        blocks.append(block)
        blocks_state.append(
            {"bn": {"mean": jnp.zeros((dim * 2,)), "var": jnp.ones((dim * 2,))}}
        )
    params["blocks"] = blocks
    state["blocks"] = blocks_state

    final_freqs = c.spect_dim // 32  # 128 -> 4 after strides 4,2,2,2
    concat_dim = c.stem_dim * 8 * final_freqs  # 256 * 4 = 1024
    params["linear"] = _linear_init(next(keys), concat_dim, c.transformer_dim)

    heads = c.transformer_dim // c.head_dim
    params["transformer"] = {
        "layers": [
            {
                "attn": _attention_init(next(keys), c.transformer_dim, heads, c.head_dim),
                "ff": _ff_init(next(keys), c.transformer_dim, c.ff_mult),
            }
            for _ in range(c.n_layers)
        ],
        "norm_gamma": jnp.ones((c.transformer_dim,), jnp.float32),
    }
    params["head"] = _linear_init(next(keys), c.transformer_dim, 2)
    return params, state


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------


def _merged_bn(params_bn: dict, state_bn: dict) -> dict:
    return {**params_bn, **state_bn}


def apply_beat_this(
    params: dict,
    state: dict,
    x: jnp.ndarray,
    config: BeatThisConfig = BeatThisConfig(),
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    valid_lengths: Optional[jnp.ndarray] = None,
):
    """Run the model.

    Args:
        x: (batch, time, spect_dim) log-mel input.
        train: enables dropout (requires `rng`) and batch-stat updates.
        compute_dtype: jnp.float32 or jnp.bfloat16 for the heavy compute.
        valid_lengths: optional (batch,) int32. When given, each sample's
            forward is made exactly equal to running the model on only its
            first `valid_lengths[i]` frames (the tail is re-zeroed before
            every time convolution so the conv sees the implicit zero padding
            a shorter input would have, and attention keys past the valid
            length are masked out of the float32 softmax). This is how the
            inference engine runs pieces shorter than a compiled bucket
            length with the reference's shorter-single-chunk semantics
            (reference beat_this/inference.py:111-135) while keeping shapes
            static. Eval only.
    Returns:
        ({"beat": (B,T) float32 logits, "downbeat": (B,T) float32 logits},
         new_state)
    """
    c = config
    b, t, f = x.shape
    if f != c.spect_dim:
        raise ValueError(f"expected {c.spect_dim} mel bins, got {f}")
    if valid_lengths is not None and train:
        raise ValueError("valid_lengths is an inference-only mechanism")
    tmask = None
    if valid_lengths is not None:
        tmask = (
            jnp.arange(t, dtype=jnp.int32)[None, :]
            < valid_lengths.astype(jnp.int32)[:, None]
        )  # (B, T)

    def zero_tail(h):
        """Zero time positions past each sample's valid length; h is
        (B, T, ...)."""
        if tmask is None:
            return h
        mask = tmask.reshape(tmask.shape + (1,) * (h.ndim - 2))
        return jnp.where(mask, h, jnp.zeros((), h.dtype))
    new_state: dict[str, Any] = {"stem": {}, "blocks": [{} for _ in range(3)]}
    drop_f = c.dropout_frontend if train else 0.0
    drop_t = c.dropout_transformer if train else 0.0

    def next_rng(i):
        return None if rng is None or not train else jax.random.fold_in(rng, i)

    if train and not _kernels_on():
        # XLA-fallback training (CPU tests): rematerialize each residual
        # branch in the backward pass — the 1500-frame attention probability
        # matrices (O(N^2) per head) would otherwise be saved as residuals
        # and overflow HBM at batch 8
        def attention_fn(p, x, rope, heads, *, dropout_rate, rng):
            wrapped = jax.checkpoint(
                lambda p_, x_, rope_, rng_: attention_block(
                    p_, x_, rope_, heads, dropout_rate=dropout_rate, rng=rng_
                )
            )
            return wrapped(p, x, rope, rng)

        def ff_res(p, x, *, dropout_rate, rng):
            wrapped = jax.checkpoint(
                lambda p_, x_, rng_: x_ + feed_forward(
                    p_, x_, dropout_rate=dropout_rate, rng=rng_
                )
            )
            return wrapped(p, x, rng)
    elif train:
        # TPU kernel path: the flash / packed-attention / fused-FF custom
        # VJPs carry O(N*d) residuals (inputs, lse) and regenerate dropout
        # from seeds, so nothing quadratic — and no FF hidden activations —
        # is ever saved; skipping remat avoids recomputing every branch
        # forward in the backward pass (~25% of the step). Peak activation
        # memory at the reference batch (8 crops of 1500 frames per
        # microbatch) is a few GB, well within HBM. On this path attention_fn
        # only ever sees time-axis sequences (the freq blocks route through
        # freq_roformer), so it takes the fused whole-branch time kernel.
        attention_fn = time_attention_train
        ff_res = ff_residual
    else:
        attention_fn = attention_block
        ff_res = ff_residual

    # --- stem ---
    h, new_state["stem"]["bn1d"] = batch_norm_apply(
        _merged_bn(params["stem"]["bn1d"], state["stem"]["bn1d"]),
        x, axis=-1, train=train,
    )
    h = zero_tail(h.astype(compute_dtype))[..., None]  # (B, T, F, 1)
    h = conv2d_tf(params["stem"]["conv"]["w"], h, stride_freq=4, pad_time=1)
    h, new_state["stem"]["bn2d"] = batch_norm_apply(
        _merged_bn(params["stem"]["bn2d"], state["stem"]["bn2d"]),
        h, axis=-1, train=train,
    )
    h = jax.nn.gelu(h, approximate=False)  # (B, T, 32, 32)

    # --- frontend blocks ---
    rope_time = rope_tables(t, c.head_dim)
    rng_i = 0
    for i, block in enumerate(params["blocks"]):
        dim = h.shape[-1]
        heads = dim // c.head_dim
        n_freq = h.shape[2]
        if c.partial_transformers:
            p = block["partial"]
            rope_freq = rope_tables(n_freq, c.head_dim)
            # frequency-axis roformer: (B, T, F, C) -> (B*T, F, C), no transpose
            hf = h.reshape(b * t, n_freq, dim)
            if not train or _kernels_on():
                # the whole freq block is one fused Pallas kernel on TPU
                # (forward-only at eval; forward + custom-VJP backward with
                # in-kernel dropout when training)
                hf = freq_roformer(
                    p["attnF"], p["ffF"], hf, rope_freq, heads,
                    dropout_rate=drop_f if train else 0.0,
                    rng=next_rng(rng_i := rng_i + 1) if train else None,
                )
            else:
                hf = hf + attention_fn(
                    p["attnF"], hf, rope_freq, heads,
                    dropout_rate=drop_f, rng=next_rng(rng_i := rng_i + 1),
                )
                hf = ff_res(
                    p["ffF"], hf, dropout_rate=drop_f,
                    rng=next_rng(rng_i := rng_i + 1),
                )
            # time-axis roformer: -> (B*F, T, C)
            ht = hf.reshape(b, t, n_freq, dim).transpose(0, 2, 1, 3)
            ht = ht.reshape(b * n_freq, t, dim)
            if tmask is None and not train:
                # eval: the whole time block is one fused Pallas kernel on
                # TPU (ops/fused_time.py); composable fallback elsewhere
                ht = time_roformer(p["attnT"], p["ffT"], ht, rope_time, heads)
            else:
                if tmask is None:
                    ht = ht + attention_fn(
                        p["attnT"], ht, rope_time, heads,
                        dropout_rate=drop_f, rng=next_rng(rng_i := rng_i + 1),
                    )
                else:
                    ht = ht + attention_block(
                        p["attnT"], ht, rope_time, heads,
                        key_mask=jnp.repeat(tmask, n_freq, axis=0),
                    )
                ht = ff_res(
                    p["ffT"], ht, dropout_rate=drop_f,
                    rng=next_rng(rng_i := rng_i + 1),
                )
            h = ht.reshape(b, n_freq, t, dim).transpose(0, 2, 1, 3)
        h = zero_tail(h)
        h = conv2d_tf(block["conv"]["w"], h, stride_freq=2, pad_time=1)
        h, new_state["blocks"][i]["bn"] = batch_norm_apply(
            _merged_bn(block["bn"], state["blocks"][i]["bn"]), h, axis=-1, train=train
        )
        h = jax.nn.gelu(h, approximate=False)

    # --- projection: (B, T, F=4, C=256) -> (B, T, (C, F)) -> transformer dim
    # reference concatenates in (channel, freq) order
    # (beat_this/model/beat_tracker.py:76-77: "b c f t -> b t (c f)")
    h = jnp.swapaxes(h, 2, 3).reshape(b, t, -1)
    h = h @ params["linear"]["w"].astype(h.dtype) + params["linear"]["b"].astype(h.dtype)

    # --- main transformer ---
    for layer in params["transformer"]["layers"]:
        if tmask is None and not train:
            h = time_roformer(
                layer["attn"], layer["ff"], h, rope_time,
                c.transformer_dim // c.head_dim,
            )
        else:
            if tmask is None:
                h = h + attention_fn(
                    layer["attn"], h, rope_time,
                    c.transformer_dim // c.head_dim,
                    dropout_rate=drop_t, rng=next_rng(rng_i := rng_i + 1),
                )
            else:
                h = h + attention_block(
                    layer["attn"], h, rope_time,
                    c.transformer_dim // c.head_dim,
                    key_mask=tmask,
                )
            h = ff_res(
                layer["ff"], h, dropout_rate=drop_t,
                rng=next_rng(rng_i := rng_i + 1),
            )
    h = rms_norm(h, params["transformer"]["norm_gamma"])

    # --- heads (float32, reference beat_this/model/beat_tracker.py:315-330) ---
    h32 = h.astype(jnp.float32)
    y = h32 @ params["head"]["w"] + params["head"]["b"]
    beat, downbeat = y[..., 0], y[..., 1]
    if c.sum_head:
        beat = beat + downbeat
    return {"beat": beat, "downbeat": downbeat}, new_state
