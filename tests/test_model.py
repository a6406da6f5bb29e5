"""Shape, dtype, and behavioural tests for the BeatThis JAX model."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beat_this_tpu.model import BeatThisConfig, apply_beat_this, init_beat_this


@functools.lru_cache(maxsize=8)
def jitted(cfg, train=False, compute_dtype=jnp.float32):
    return jax.jit(
        lambda p, s, x, rng=None: apply_beat_this(
            p, s, x, cfg, train=train, rng=rng, compute_dtype=compute_dtype
        )
    )


@pytest.fixture(scope="session")
def small_cfg():
    return BeatThisConfig(transformer_dim=128, n_layers=2)


@pytest.fixture(scope="session")
def small_model(small_cfg):
    return init_beat_this(0, small_cfg)


@pytest.fixture(scope="session")
def x64():
    return jnp.asarray(np.random.RandomState(0).randn(2, 64, 128), jnp.float32)


def test_output_shapes(small_cfg, small_model, x64):
    params, state = small_model
    out, new_state = jitted(small_cfg)(params, state, x64)
    assert out["beat"].shape == (2, 64)
    assert out["downbeat"].shape == (2, 64)
    assert out["beat"].dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out["beat"])))
    # eval mode must not change the BN state
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), state, new_state
    )


def test_sum_head_is_beat_plus_downbeat(small_model, x64):
    cfg_sum = BeatThisConfig(transformer_dim=128, n_layers=2, sum_head=True)
    cfg_plain = BeatThisConfig(transformer_dim=128, n_layers=2, sum_head=False)
    params, state = small_model
    out_sum, _ = jitted(cfg_sum)(params, state, x64)
    out_plain, _ = jitted(cfg_plain)(params, state, x64)
    np.testing.assert_allclose(
        np.asarray(out_sum["beat"]),
        np.asarray(out_plain["beat"] + out_plain["downbeat"]),
        rtol=1e-5,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_sum["downbeat"]), np.asarray(out_plain["downbeat"])
    )


def test_no_partial_transformers(x64):
    cfg = BeatThisConfig(transformer_dim=128, n_layers=1, partial_transformers=False)
    params, state = init_beat_this(1, cfg)
    assert "partial" not in params["blocks"][0]
    out, _ = jitted(cfg)(params, state, x64)
    assert out["beat"].shape == (2, 64)


def test_bfloat16_close_to_float32(small_cfg, small_model, x64):
    params, state = small_model
    out32, _ = jitted(small_cfg)(params, state, x64)
    out16, _ = jitted(small_cfg, compute_dtype=jnp.bfloat16)(params, state, x64)
    diff = np.max(np.abs(np.asarray(out32["beat"]) - np.asarray(out16["beat"])))
    scale = np.max(np.abs(np.asarray(out32["beat"]))) + 1e-6
    assert diff / scale < 0.15


def test_partial_roformer_directions(small_model):
    import jax

    from beat_this_tpu.model.beat_this import _attention_init, _ff_init
    from beat_this_tpu.model.layers import partial_roformer

    import numpy as np_

    gen = np_.random.default_rng(0)
    params = {"attn": _attention_init(gen, 64, 2, 32), "ff": _ff_init(gen, 64, 4)}
    x = jnp.asarray(np_.random.RandomState(0).randn(2, 20, 8, 64), jnp.float32)
    for direction in ("f", "t", "F", "time"):
        out = jax.jit(
            lambda p, x: partial_roformer(p, x, direction, 32)
        )(params, x)
        assert out.shape == x.shape
        assert not np_.allclose(np_.asarray(out), np_.asarray(x))
    with pytest.raises(ValueError):
        partial_roformer(params, x, "x", 32)


def test_train_mode_updates_bn_and_is_stochastic(small_cfg, small_model, x64):
    params, state = small_model
    fn = jitted(small_cfg, train=True)
    out1, new_state = fn(params, state, x64, jax.random.PRNGKey(0))
    out2, _ = fn(params, state, x64, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(out1["beat"]), np.asarray(out2["beat"]))
    assert not np.allclose(
        np.asarray(new_state["stem"]["bn1d"]["mean"]),
        np.asarray(state["stem"]["bn1d"]["mean"]),
    )
    # same rng must be deterministic
    out3, _ = fn(params, state, x64, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out1["beat"]), np.asarray(out3["beat"]))


def test_valid_lengths_equals_exact_length_run(small_cfg, small_model):
    """apply_beat_this on a padded batch with `valid_lengths` reproduces a
    run at each sample's exact length (the mechanism behind reference-exact
    short-piece inference)."""
    params, state = small_model
    # non-trivial BN stats so eval BN's affine actually moves the zero tail
    rng = np.random.RandomState(1)
    state = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.uniform(0.5, 1.5, np.shape(a)).astype(np.float32)),
        state,
    )
    lengths = [37, 64, 50]
    padded_t = 64
    xs = [rng.randn(t, 128).astype(np.float32) for t in lengths]
    batch = np.zeros((len(xs), padded_t, 128), np.float32)
    for i, x in enumerate(xs):
        batch[i, : len(x)] = x
    out_masked, _ = jax.jit(
        lambda p, s, b, v: apply_beat_this(p, s, b, small_cfg, valid_lengths=v)
    )(params, state, jnp.asarray(batch), jnp.asarray(lengths, jnp.int32))
    for i, x in enumerate(xs):
        out_exact, _ = apply_beat_this(
            params, state, jnp.asarray(x[None]), small_cfg
        )
        for key in ("beat", "downbeat"):
            np.testing.assert_allclose(
                np.asarray(out_masked[key])[i, : len(x)],
                np.asarray(out_exact[key])[0],
                atol=2e-5,
                err_msg=f"sample {i} ({len(x)} frames), {key}",
            )


def test_valid_lengths_rejects_train_mode(small_cfg, small_model):
    params, state = small_model
    x = jnp.zeros((1, 32, 128), jnp.float32)
    with pytest.raises(ValueError):
        apply_beat_this(
            params, state, x, small_cfg, train=True,
            rng=jax.random.PRNGKey(0),
            valid_lengths=jnp.asarray([16], jnp.int32),
        )
