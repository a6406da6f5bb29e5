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
