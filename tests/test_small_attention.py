"""Packed short-sequence attention kernel vs plain sdpa (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from beat_this_tpu.model.layers import sdpa
from beat_this_tpu.ops.small_attention import small_attention


@pytest.mark.parametrize("f", [8, 16, 32])
@pytest.mark.parametrize("n", [7, 64, 130])
def test_matches_sdpa(f, n):
    rng = np.random.RandomState(f * 100 + n)
    q = jnp.asarray(rng.randn(n, f, 32), jnp.float32)
    k = jnp.asarray(rng.randn(n, f, 32), jnp.float32)
    v = jnp.asarray(rng.randn(n, f, 32), jnp.float32)
    ref = sdpa(q, k, v)
    out = small_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("f", [8, 32])
def test_rope_folding(f):
    from beat_this_tpu.ops.rotary import apply_rope, rope_tables

    rng = np.random.RandomState(f)
    n = 33
    q = jnp.asarray(rng.randn(n, f, 32), jnp.float32)
    k = jnp.asarray(rng.randn(n, f, 32), jnp.float32)
    v = jnp.asarray(rng.randn(n, f, 32), jnp.float32)
    cos, sin = rope_tables(f, 32)
    ref = sdpa(apply_rope(q, cos, sin), apply_rope(k, cos, sin), v)
    out = small_attention(q, k, v, interpret=True, rope_cos=cos, rope_sin=sin)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_bad_seq_length():
    q = jnp.zeros((4, 24, 32))
    with pytest.raises(ValueError):
        small_attention(q, q, q, interpret=True)


@pytest.mark.parametrize("f", [8, 32])
def test_grad_matches_sdpa(f):
    """Custom-VJP backward kernel vs autodiff through the XLA path."""
    import jax

    from beat_this_tpu.ops.rotary import apply_rope, rope_tables

    rng = np.random.RandomState(f + 7)
    n = 9
    q = jnp.asarray(rng.randn(n, f, 32), jnp.float32)
    k = jnp.asarray(rng.randn(n, f, 32), jnp.float32)
    v = jnp.asarray(rng.randn(n, f, 32), jnp.float32)
    cos, sin = rope_tables(f, 32)
    # weight the output so the cotangent isn't uniform
    w = jnp.asarray(rng.randn(n, f, 32), jnp.float32)

    def loss_ref(q, k, v):
        out = sdpa(apply_rope(q, cos, sin), apply_rope(k, cos, sin), v)
        return jnp.sum(out * w)

    def loss_kernel(q, k, v):
        out = small_attention(
            q, k, v, interpret=True, rope_cos=cos, rope_sin=sin
        )
        return jnp.sum(out * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ker = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ker, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_dropout_stats_on_tpu():
    """In-kernel dropout keep-rate and scaling (Mosaic PRNG has no interpret
    rule, so this runs only on a real TPU backend)."""
    import jax

    if jax.devices()[0].platform == "cpu":
        pytest.skip("needs a TPU backend for pltpu.prng_*")
    rng = np.random.RandomState(0)
    n, f, d = 64, 16, 32
    q = jnp.asarray(rng.randn(n, f, d), jnp.float32)
    k = jnp.asarray(rng.randn(n, f, d), jnp.float32)
    v = jnp.ones((n, f, d), jnp.float32)
    rate = 0.5
    # with v == 1 every undropped output equals the (scaled) row sum of kept
    # probabilities; the mean over many rows approaches 1
    out = np.asarray(small_attention(q, k, v, dropout_rate=rate, seed=123))
    assert np.isfinite(out).all()
    assert abs(out.mean() - 1.0) < 0.1
    # deterministic for a fixed seed, different for another
    out2 = np.asarray(small_attention(q, k, v, dropout_rate=rate, seed=123))
    out3 = np.asarray(small_attention(q, k, v, dropout_rate=rate, seed=456))
    np.testing.assert_array_equal(out, out2)
    assert np.abs(out - out3).max() > 1e-6
