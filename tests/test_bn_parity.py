"""Batch-norm train-mode parity vs torch (batch stats, running-stat update)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from beat_this_tpu.model.layers import batch_norm_apply


def test_train_mode_matches_torch_batchnorm():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 50, 16).astype(np.float32) * 3 + 1
    gamma = rng.rand(16).astype(np.float32) + 0.5
    beta = rng.randn(16).astype(np.float32)
    mean0 = rng.randn(16).astype(np.float32)
    var0 = rng.rand(16).astype(np.float32) + 0.5

    params = {
        "gamma": jnp.asarray(gamma), "beta": jnp.asarray(beta),
        "mean": jnp.asarray(mean0), "var": jnp.asarray(var0),
    }
    y, new_stats = batch_norm_apply(params, jnp.asarray(x), axis=-1, train=True)

    rm = torch.from_numpy(mean0.copy())
    rv = torch.from_numpy(var0.copy())
    # torch BatchNorm1d layout: (N, C, L) with channels second
    xt = torch.from_numpy(x).permute(0, 2, 1)
    yt = torch.nn.functional.batch_norm(
        xt, rm, rv, torch.from_numpy(gamma), torch.from_numpy(beta),
        training=True, momentum=0.1, eps=1e-5,
    ).permute(0, 2, 1)

    np.testing.assert_allclose(np.asarray(y), yt.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(new_stats["mean"]), rm.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_stats["var"]), rv.numpy(), rtol=1e-4
    )


def test_eval_mode_matches_torch_batchnorm():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 30, 8).astype(np.float32)
    params = {
        "gamma": jnp.asarray(rng.rand(8).astype(np.float32)),
        "beta": jnp.asarray(rng.randn(8).astype(np.float32)),
        "mean": jnp.asarray(rng.randn(8).astype(np.float32)),
        "var": jnp.asarray(rng.rand(8).astype(np.float32) + 0.3),
    }
    y, _ = batch_norm_apply(params, jnp.asarray(x), axis=-1, train=False)
    yt = torch.nn.functional.batch_norm(
        torch.from_numpy(x).permute(0, 2, 1),
        torch.as_tensor(np.asarray(params["mean"])),
        torch.as_tensor(np.asarray(params["var"])),
        torch.as_tensor(np.asarray(params["gamma"])),
        torch.as_tensor(np.asarray(params["beta"])),
        training=False, eps=1e-5,
    ).permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(y), yt.numpy(), atol=1e-5)
