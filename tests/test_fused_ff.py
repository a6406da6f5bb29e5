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


@pytest.mark.parametrize("shape,c,m", [((3, 100), 64, 256), ((300,), 128, 512)])
def test_train_kernel_value_and_grads_match_xla(shape, c, m):
    """fused_ff_train (rate 0, interpret) vs XLA autodiff: output and every
    gradient (x, gamma, w1, b1, w2, b2)."""
    import jax

    from beat_this_tpu.ops.fused_ff import fused_ff_train

    rng = np.random.RandomState(m)
    x = jnp.asarray(rng.randn(*shape, c), jnp.float32)
    params = {
        "norm_gamma": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
        "w1": jnp.asarray(0.1 * rng.randn(c, m), jnp.float32),
        "b1": jnp.asarray(0.1 * rng.randn(m), jnp.float32),
        "w2": jnp.asarray(0.1 * rng.randn(m, c), jnp.float32),
        "b2": jnp.asarray(0.1 * rng.randn(c), jnp.float32),
    }
    cot = jnp.asarray(rng.randn(*shape, c), jnp.float32)

    def loss_kernel(x, p):
        out = fused_ff_train(
            x, p["norm_gamma"], p["w1"], p["b1"], p["w2"], p["b2"],
            interpret=True,
        )
        return jnp.vdot(out, cot)

    def loss_ref(x, p):
        out = x + feed_forward(p, x.reshape(-1, 1, c)).reshape(x.shape)
        return jnp.vdot(out, cot)

    (vk, (gx_k, gp_k)) = jax.value_and_grad(loss_kernel, argnums=(0, 1))(x, params)
    (vr, (gx_r, gp_r)) = jax.value_and_grad(loss_ref, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(float(vk), float(vr), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r), atol=3e-4)
    for key in gp_r:
        np.testing.assert_allclose(
            np.asarray(gp_k[key]), np.asarray(gp_r[key]), atol=3e-4,
            err_msg=key,
        )


def test_train_kernel_dropout_needs_tpu():
    from beat_this_tpu.ops.fused_ff import fused_ff_train

    x = jnp.zeros((4, 64), jnp.float32)
    z = jnp.zeros((64,), jnp.float32)
    with pytest.raises(NotImplementedError):
        fused_ff_train(
            x, jnp.ones((64,)), jnp.zeros((64, 128)), jnp.zeros((128,)),
            jnp.zeros((128, 64)), z, dropout_rate=0.1, seed=3, interpret=True,
        )


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
