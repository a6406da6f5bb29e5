"""Fused frequency-roformer kernel vs the XLA composition (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from beat_this_tpu.model.layers import attention_block, feed_forward
from beat_this_tpu.ops.fused_freq import fused_freq_roformer
from beat_this_tpu.ops.rotary import rope_tables


def _params(rng, c, heads, mult=4):
    attn = {
        "norm_gamma": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
        "qkv_w": jnp.asarray(0.1 * rng.randn(c, 3 * c), jnp.float32),
        "gates_w": jnp.asarray(0.1 * rng.randn(c, heads), jnp.float32),
        "gates_b": jnp.asarray(0.1 * rng.randn(heads), jnp.float32),
        "out_w": jnp.asarray(0.1 * rng.randn(c, c), jnp.float32),
    }
    ff = {
        "norm_gamma": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
        "w1": jnp.asarray(0.1 * rng.randn(c, mult * c), jnp.float32),
        "b1": jnp.asarray(0.1 * rng.randn(mult * c), jnp.float32),
        "w2": jnp.asarray(0.1 * rng.randn(mult * c, c), jnp.float32),
        "b2": jnp.asarray(0.1 * rng.randn(c), jnp.float32),
    }
    return attn, ff


def _reference(attn, ff, x, cos, sin, heads):
    h = x + attention_block(attn, x, (cos, sin), heads)
    return h + feed_forward(ff, h)


# the three frontend block shapes: (F, C) with F * C = 1024
@pytest.mark.parametrize("f,c", [(32, 32), (16, 64), (8, 128)])
def test_matches_xla_composition(f, c):
    heads = c // 32
    rng = np.random.RandomState(f)
    # items chosen so rows = items * f is NOT a multiple of the kernel's
    # block size (exercises row padding)
    items = 70
    x = jnp.asarray(rng.randn(items, f, c), jnp.float32)
    cos, sin = rope_tables(f, 32)
    attn, ff = _params(rng, c, heads)
    ref = _reference(attn, ff, x, cos, sin, heads)
    out = fused_freq_roformer(x, attn, ff, cos, sin, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_bfloat16_close():
    f, c = 16, 64
    heads = 2
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(40, f, c), jnp.bfloat16)
    cos, sin = rope_tables(f, 32)
    attn, ff = _params(rng, c, heads)
    ref = _reference(attn, ff, x, cos, sin, heads)
    out = fused_freq_roformer(x, attn, ff, cos, sin, interpret=True)
    assert out.dtype == jnp.bfloat16
    diff = np.max(np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)))
    assert diff < 0.15


@pytest.mark.parametrize("f,c", [(32, 32), (8, 128)])
def test_grad_matches_xla_composition(f, c):
    import jax

    heads = c // 32
    rng = np.random.RandomState(f + 1)
    items = 40
    x = jnp.asarray(rng.randn(items, f, c), jnp.float32)
    cos, sin = rope_tables(f, 32)
    attn, ff = _params(rng, c, heads)

    def loss_ref(attn, ff, x):
        out = _reference(attn, ff, x, cos, sin, heads)
        return jnp.sum(out**2)

    def loss_fused(attn, ff, x):
        out = fused_freq_roformer(x, attn, ff, cos, sin, interpret=True)
        return jnp.sum(out**2)

    ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2))(attn, ff, x)
    fused_grads = jax.grad(loss_fused, argnums=(0, 1, 2))(attn, ff, x)
    flat_r, _ = jax.tree_util.tree_flatten(ref_grads)
    flat_f, treedef = jax.tree_util.tree_flatten(fused_grads)
    paths = [str(p) for p, _ in
             jax.tree_util.tree_flatten_with_path(fused_grads)[0]]
    for name, r, g in zip(paths, flat_r, flat_f):
        scale = max(1.0, float(np.max(np.abs(np.asarray(r)))))
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=2e-4 * scale,
            err_msg=f"gradient mismatch for {name}",
        )


def test_dropout_deterministic_and_finite_on_tpu():
    """In-kernel dropout (Mosaic PRNG has no interpret rule, so this runs
    only on a real TPU backend)."""
    import jax

    if jax.devices()[0].platform == "cpu":
        pytest.skip("needs a TPU backend for pltpu.prng_*")
    f, c = 16, 64
    heads = 2
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(30, f, c), jnp.float32)
    cos, sin = rope_tables(f, 32)
    attn, ff = _params(rng, c, heads)
    seed = jnp.asarray([123], jnp.int32)
    out1 = fused_freq_roformer(
        x, attn, ff, cos, sin, dropout_rate=0.25, seed=seed
    )
    out2 = fused_freq_roformer(
        x, attn, ff, cos, sin, dropout_rate=0.25, seed=seed
    )
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # a different seed must change the result
    out3 = fused_freq_roformer(
        x, attn, ff, cos, sin, dropout_rate=0.25,
        seed=jnp.asarray([124], jnp.int32),
    )
    assert np.any(np.asarray(out1) != np.asarray(out3))

    def loss(attn, ff, x):
        out = fused_freq_roformer(
            x, attn, ff, cos, sin, dropout_rate=0.25, seed=seed
        )
        return jnp.sum(out**2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(attn, ff, x)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_rejects_bad_freq():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 12, 64), jnp.float32)
    cos, sin = rope_tables(12, 32)
    attn, ff = _params(rng, 64, 2)
    with pytest.raises(ValueError):
        fused_freq_roformer(x, attn, ff, cos, sin, interpret=True)
