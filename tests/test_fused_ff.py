"""Fused feed-forward kernel vs the XLA composition (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from beat_this_tpu.model.layers import feed_forward, rms_norm
from beat_this_tpu.ops.fused_ff import fused_ff


@pytest.mark.parametrize("shape,c,m", [((3, 100), 64, 256), ((700,), 128, 512)])
def test_matches_xla_ff(shape, c, m):
    rng = np.random.RandomState(c)
    x = jnp.asarray(rng.randn(*shape, c), jnp.float32)
    params = {
        "norm_gamma": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
        "w1": jnp.asarray(0.1 * rng.randn(c, m), jnp.float32),
        "b1": jnp.asarray(0.1 * rng.randn(m), jnp.float32),
        "w2": jnp.asarray(0.1 * rng.randn(m, c), jnp.float32),
        "b2": jnp.asarray(0.1 * rng.randn(c), jnp.float32),
    }
    ref = x + feed_forward(params, x.reshape(-1, 1, c)).reshape(x.shape)
    out = fused_ff(
        x, params["norm_gamma"], params["w1"], params["b1"],
        params["w2"], params["b2"], interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_bfloat16_close():
    rng = np.random.RandomState(0)
    c, m = 64, 256
    x = jnp.asarray(rng.randn(300, c), jnp.bfloat16)
    gamma = jnp.ones(c)
    w1 = jnp.asarray(0.1 * rng.randn(c, m), jnp.float32)
    b1 = jnp.zeros(m)
    w2 = jnp.asarray(0.1 * rng.randn(m, c), jnp.float32)
    b2 = jnp.zeros(c)
    out = fused_ff(x, gamma, w1, b1, w2, b2, interpret=True)
    assert out.dtype == jnp.bfloat16
    params = {"norm_gamma": gamma, "w1": w1, "b1": b1, "w2": w2, "b2": b2}
    ref = x + feed_forward(params, x[:, None, :]).reshape(x.shape)
    diff = np.max(np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)))
    assert diff < 0.1
