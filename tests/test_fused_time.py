"""Parity tests for the fused time-axis roformer block kernel
(beat_this_tpu/ops/fused_time.py), run in Pallas interpret mode on CPU.

The kernel must match the composable XLA path (layers.attention_block +
layers.feed_forward residuals) that the TPU gate's eval_logit_parity check
also compares against on real hardware."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from beat_this_tpu.model.layers import attention_block, feed_forward
from beat_this_tpu.ops.fused_time import fused_time_roformer
from beat_this_tpu.ops.rotary import rope_tables


def _params(rng, c, heads):
    m = 4 * c
    attn = {
        "norm_gamma": jnp.asarray(rng.randn(c) * 0.1 + 1, jnp.float32),
        "qkv_w": jnp.asarray(rng.randn(c, 3 * c) / np.sqrt(c), jnp.float32),
        "gates_w": jnp.asarray(rng.randn(c, heads) / np.sqrt(c), jnp.float32),
        "gates_b": jnp.asarray(rng.randn(heads) * 0.3, jnp.float32),
        "out_w": jnp.asarray(rng.randn(c, c) / np.sqrt(c), jnp.float32),
    }
    ff = {
        "norm_gamma": jnp.asarray(rng.randn(c) * 0.1 + 1, jnp.float32),
        "w1": jnp.asarray(rng.randn(c, m) / np.sqrt(c), jnp.float32),
        "b1": jnp.asarray(rng.randn(m) * 0.1, jnp.float32),
        "w2": jnp.asarray(rng.randn(m, c) / np.sqrt(m), jnp.float32),
        "b2": jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
    }
    return attn, ff


def _reference(attn, ff, x, rope, heads):
    y = x + attention_block(attn, x, rope, heads)
    return y + feed_forward(ff, y)


@pytest.mark.parametrize(
    "heads,n,items",
    [
        (1, 160, 3),  # frontend block 1 (C=32), padded length
        (2, 128, 2),  # frontend block 2 (C=64), exact tile multiple
        (4, 130, 2),  # frontend block 3 (C=128), heavy padding
        (8, 140, 2),  # multi-group accumulation (2 groups of 4 heads)
        (16, 96, 1),  # production head count (4 groups; the gate-bias
                      # operand spans multiple (8, 128) sublane tiles)
    ],
)
def test_matches_composable_path(heads, n, items):
    rng = np.random.RandomState(heads * 100 + n)
    c = heads * 32
    attn, ff = _params(rng, c, heads)
    x = jnp.asarray(rng.randn(items, n, c), jnp.float32)
    rope = rope_tables(n, 32)
    want = _reference(attn, ff, x, rope, heads)
    got = fused_time_roformer(x, attn, ff, rope[0], rope[1], heads,
                              interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0, atol=2e-5
    )


def test_bfloat16(
):
    """bfloat16 inputs: weights cast to bfloat16 in-kernel like the XLA
    mixed-precision path; compare against the float32 oracle loosely."""
    rng = np.random.RandomState(7)
    heads, n, items = 4, 192, 2
    c = heads * 32
    attn, ff = _params(rng, c, heads)
    x32 = jnp.asarray(rng.randn(items, n, c), jnp.float32)
    rope = rope_tables(n, 32)
    want = _reference(attn, ff, x32, rope, heads)
    got = fused_time_roformer(
        x32.astype(jnp.bfloat16), attn, ff, rope[0], rope[1], heads,
        interpret=True,
    ).astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(want)))
    assert float(jnp.max(jnp.abs(got - want))) / scale < 0.03


@pytest.mark.parametrize("wscale", [25.0, 1e-3])
def test_extreme_score_magnitudes(wscale):
    """Exactness contract at extreme weight scales. The kernel subtracts
    the EXACT softmax row max; a norm-BOUND surrogate (|q| * max|k|) was
    tried and reverted because with huge qkv weights the bound's slack
    exceeds exp2's float32 underflow range (every probability flushes to
    zero, 0/0 = NaN), and with tiny ones everything sits denormal-adjacent.
    This test pins both regimes: finite outputs matching the exact softmax
    oracle — any regression to a bound-based shortcut fails here first."""
    rng = np.random.RandomState(11)
    heads, n, items = 2, 150, 2  # padded to 256: mask row active too
    c = heads * 32
    attn, ff = _params(rng, c, heads)
    attn["qkv_w"] = attn["qkv_w"] * wscale
    x = jnp.asarray(rng.randn(items, n, c), jnp.float32)
    rope = rope_tables(n, 32)
    want = _reference(attn, ff, x, rope, heads)
    got = fused_time_roformer(x, attn, ff, rope[0], rope[1], heads,
                              interpret=True)
    assert bool(jnp.all(jnp.isfinite(got)))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0,
        atol=2e-5 * max(1.0, float(jnp.max(jnp.abs(want)))),
    )


def test_rejects_bad_head_geometry():
    rng = np.random.RandomState(1)
    attn, ff = _params(rng, 96, 3)
    x = jnp.asarray(rng.randn(1, 64, 96), jnp.float32)
    rope = rope_tables(64, 32)
    with pytest.raises(ValueError):
        fused_time_roformer(x, attn, ff, rope[0], rope[1], 3, interpret=True)


# --- training twin: whole attention branch with a custom VJP ---------------


@pytest.mark.parametrize(
    "heads,n,items",
    [(1, 140, 2), (2, 136, 2), (4, 130, 2), (8, 140, 2), (16, 129, 1)],
)
def test_train_forward_and_grads_match_composable(heads, n, items):
    """The custom-VJP training kernel (rate=0 on CPU: pltpu.prng has no
    interpret rule; the dropout path is gradchecked by the TPU gate) must
    match attention_block's forward AND every gradient."""
    from beat_this_tpu.ops.fused_time import fused_time_attention_train

    rng = np.random.RandomState(heads * 7 + n)
    c = heads * 32
    attn, _ = _params(rng, c, heads)
    x = jnp.asarray(rng.randn(items, n, c), jnp.float32)
    rope = rope_tables(n, 32)
    co = jnp.asarray(rng.randn(items, n, c), jnp.float32)

    def loss_ref(x, attn):
        return jnp.sum(attention_block(attn, x, rope, heads) * co)

    def loss_fused(x, attn):
        return jnp.sum(
            fused_time_attention_train(
                x, attn, rope[0], rope[1], heads, 0.0, None, True
            )
            * co
        )

    f_r, g_r = jax.value_and_grad(loss_ref, argnums=(0, 1))(x, attn)
    f_f, g_f = jax.value_and_grad(loss_fused, argnums=(0, 1))(x, attn)
    assert abs(float(f_r - f_f)) / abs(float(f_r)) < 1e-4
    for want, got in [(g_r[0], g_f[0])] + [
        (g_r[1][k], g_f[1][k]) for k in attn
    ]:
        scale = float(jnp.max(jnp.abs(want))) + 1e-30
        assert float(jnp.max(jnp.abs(want - got))) / scale < 1e-4


def test_train_grads_bfloat16():
    """bfloat16 inputs (the trainer's compute dtype): gradients must track
    the float32 composable oracle to mixed-precision accuracy."""
    from beat_this_tpu.ops.fused_time import fused_time_attention_train

    rng = np.random.RandomState(11)
    heads, n, items = 4, 140, 2
    c = heads * 32
    attn, _ = _params(rng, c, heads)
    x32 = jnp.asarray(rng.randn(items, n, c), jnp.float32)
    rope = rope_tables(n, 32)
    co = jnp.asarray(rng.randn(items, n, c), jnp.float32)

    def loss_ref(x):
        return jnp.sum(attention_block(attn, x, rope, heads) * co)

    def loss_fused(x):
        return jnp.sum(
            fused_time_attention_train(
                x.astype(jnp.bfloat16), attn, rope[0], rope[1], heads,
                0.0, None, True,
            ).astype(jnp.float32)
            * co
        )

    g_r = jax.grad(loss_ref)(x32)
    g_f = jax.grad(loss_fused)(x32)
    scale = float(jnp.max(jnp.abs(g_r)))
    assert float(jnp.max(jnp.abs(g_r - g_f))) / scale < 0.05


def test_train_rejects_dropout_in_interpret_mode():
    from beat_this_tpu.ops.fused_time import fused_time_attention_train

    rng = np.random.RandomState(3)
    attn, _ = _params(rng, 64, 2)
    x = jnp.asarray(rng.randn(1, 64, 64), jnp.float32)
    rope = rope_tables(64, 32)
    with pytest.raises(NotImplementedError):
        fused_time_attention_train(
            x, attn, rope[0], rope[1], 2, dropout_rate=0.1,
            seed=jnp.zeros((1,), jnp.int32), interpret=True,
        )


def test_train_router_head_geometry(monkeypatch):
    """layers.time_attention_train must route every head count the model
    uses (frontend 1/2/4, main transformer 16) to the fused training
    kernel — the round-4 (items, head_groups) re-grid lifted the old
    heads<=4 VMEM cap — while head counts the grid cannot tile (heads > 2
    and not a multiple of 4) and heads above FUSED_TIME_TRAIN_MAX_HEADS
    fall back to the composable path."""
    from beat_this_tpu.model import layers
    from beat_this_tpu.ops import fused_time

    calls = []

    def fake_kernel(x, attn_params, rope_cos, rope_sin, heads, **kw):
        calls.append(heads)
        return jnp.zeros_like(x)

    fallbacks = []

    def fake_composable(attn_params, x, rope, heads, **kw):
        fallbacks.append(heads)
        return jnp.zeros_like(x)

    monkeypatch.setattr(
        fused_time, "fused_time_attention_train", fake_kernel
    )
    monkeypatch.setattr(layers, "attention_block", fake_composable)
    monkeypatch.setattr(layers, "_flash_enabled", lambda: True)
    monkeypatch.setattr(layers, "_fused_time_train_enabled", lambda: True)
    monkeypatch.setattr(layers, "FUSED_TIME_TRAIN_MAX_HEADS", 16)

    n = layers.FLASH_MIN_SEQ
    rng = np.random.RandomState(0)
    rope = rope_tables(n, 32)
    for heads in (1, 2, 4, 6, 16, 32):
        attn, _ = _params(rng, heads * 32, heads)
        x = jnp.asarray(rng.randn(1, n, heads * 32), jnp.float32)
        out = layers.time_attention_train(attn, x, rope, heads)
        assert out.shape == x.shape
    assert calls == [1, 2, 4, 16] and fallbacks == [6, 32], (
        "fused kernel must serve 1/2/4/16; 6 (untileable) and 32 (above "
        "the cap) fall back"
    )
