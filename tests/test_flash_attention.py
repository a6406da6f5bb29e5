"""Flash-attention kernel vs the plain XLA sdpa (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from beat_this_tpu.model.layers import sdpa
from beat_this_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize("n", [96, 256, 300, 1500])
def test_matches_sdpa(n):
    rng = np.random.RandomState(n)
    bh, d = 4, 32
    q = jnp.asarray(rng.randn(bh, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(bh, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(bh, n, d), jnp.float32)
    ref = sdpa(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gradients_match_sdpa(n=300):
    import jax

    rng = np.random.RandomState(7)
    bh, d = 2, 32
    q = jnp.asarray(rng.randn(bh, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(bh, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(bh, n, d), jnp.float32)
    cot = jnp.asarray(rng.randn(bh, n, d), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
            * cot
        )

    def loss_ref(q, k, v):
        return jnp.sum(sdpa(q, k, v) * cot)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_rope_folding_matches_external_rope(n=300):
    import jax

    from beat_this_tpu.ops.rotary import apply_rope, rope_tables

    rng = np.random.RandomState(11)
    bh, d = 3, 32
    q = jnp.asarray(rng.randn(bh, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(bh, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(bh, n, d), jnp.float32)
    cos, sin = rope_tables(n, d)

    ref = sdpa(apply_rope(q, cos, sin), apply_rope(k, cos, sin), v)
    out = flash_attention(
        q, k, v, block_q=128, block_k=128, interpret=True,
        rope_cos=cos, rope_sin=sin,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    # gradients (incl. the inverse rotation in the backward kernels)
    cot = jnp.asarray(rng.randn(bh, n, d), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, block_q=128, block_k=128, interpret=True,
                            rope_cos=cos, rope_sin=sin) * cot
        )

    def loss_ref(q, k, v):
        return jnp.sum(
            sdpa(apply_rope(q, cos, sin), apply_rope(k, cos, sin), v) * cot
        )

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3,
            err_msg=f"rope grad mismatch for {name}",
        )


def test_bfloat16(n=200):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, n, 32), jnp.bfloat16)
    k = jnp.asarray(rng.randn(2, n, 32), jnp.bfloat16)
    v = jnp.asarray(rng.randn(2, n, 32), jnp.bfloat16)
    ref = sdpa(q, k, v).astype(jnp.float32)
    out = flash_attention(q, k, v, block_q=128, block_k=128,
                          interpret=True).astype(jnp.float32)
    diff = np.max(np.abs(np.asarray(out) - np.asarray(ref)))
    assert diff < 0.05


def test_default_blocks_grad_at_awkward_length():
    """Gradients at n=768 with the default (large) block sizes: since the
    shared _train_block_cap, the training forward and backward tile
    identically (both capped), so this checks the capped-vs-uncapped
    (primal vs VJP-forward) block routing still produces correct grads at a
    length that is not a multiple of the cap."""
    import jax

    rng = np.random.RandomState(3)
    n = 768
    q = jnp.asarray(rng.randn(1, n, 32), jnp.float32)
    k = jnp.asarray(rng.randn(1, n, 32), jnp.float32)
    v = jnp.asarray(rng.randn(1, n, 32), jnp.float32)
    cot = jnp.asarray(rng.randn(1, n, 32), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, interpret=True) * cot)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa(q, k, v) * cot)

    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(sdpa(q, k, v)), atol=2e-5
    )
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3,
            err_msg=f"grad mismatch for {name}",
        )
