"""Cross-framework parity: JAX model vs an independent torch oracle, and the
torch-checkpoint bridge round trip (read real torch .ckpt zips without torch).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from beat_this_tpu.io.torch_ckpt import (
    load_torch_checkpoint,
    pytree_to_torch_state_dict,
    torch_state_dict_to_pytree,
)
from beat_this_tpu.model import BeatThisConfig, apply_beat_this, init_beat_this
from tests import torch_oracle


@pytest.fixture(scope="module")
def cfg():
    return BeatThisConfig(transformer_dim=128, n_layers=2)


@pytest.fixture(scope="module")
def model(cfg):
    # non-trivial BN stats so the parity test exercises them
    params, state = init_beat_this(jax.random.PRNGKey(42), cfg)
    rng = np.random.RandomState(0)
    state = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            rng.uniform(0.5, 1.5, np.shape(a)).astype(np.float32)
        ),
        state,
    )
    return params, state


def test_logit_parity_vs_torch_oracle(cfg, model):
    params, state = model
    sd = pytree_to_torch_state_dict(params, state)
    x = np.random.RandomState(3).randn(2, 100, 128).astype(np.float32) * 2.0

    out_jax, _ = apply_beat_this(params, state, jnp.asarray(x), cfg)
    with torch.no_grad():
        out_torch = torch_oracle.forward(
            sd, torch.from_numpy(x), n_layers=cfg.n_layers, head_dim=cfg.head_dim
        )

    for key in ("beat", "downbeat"):
        a = np.asarray(out_jax[key])
        b = out_torch[key].numpy()
        np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3)


def test_logit_parity_full_size_config():
    """The flagship configuration (transformer_dim=512, 6 layers, 16 heads)
    against the torch oracle — catches head/dim-specific mapping bugs the
    small-config test cannot."""
    full_cfg = BeatThisConfig()
    params, state = init_beat_this(7, full_cfg)
    rng = np.random.RandomState(0)
    state = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            rng.uniform(0.5, 1.5, np.shape(a)).astype(np.float32)
        ),
        state,
    )
    sd = pytree_to_torch_state_dict(params, state)
    x = rng.randn(1, 64, 128).astype(np.float32)
    out, _ = jax.jit(
        lambda p, s, x: apply_beat_this(p, s, x, full_cfg)
    )(params, state, jnp.asarray(x))
    with torch.no_grad():
        out_torch = torch_oracle.forward(sd, torch.from_numpy(x))
    for key in ("beat", "downbeat"):
        np.testing.assert_allclose(
            np.asarray(out[key]), out_torch[key].numpy(), atol=1e-4
        )


def test_torch_ckpt_loader_roundtrip(tmp_path, cfg, model):
    """Write a Lightning-style .ckpt with torch.save, read it back with the
    torch-free loader, convert to pytrees, and compare every leaf."""
    params, state = model
    sd = pytree_to_torch_state_dict(params, state)
    ckpt = {
        "state_dict": {
            "model." + k: torch.as_tensor(np.ascontiguousarray(v)) for k, v in sd.items()
        },
        "hyper_parameters": {
            "transformer_dim": 128,
            "n_layers": 2,
            "dropout": {"frontend": 0.1, "transformer": 0.2},
            "lr": 8e-4,
            "loss_type": "shift_tolerant_weighted_bce",
        },
        "datamodule_hyper_parameters": {"batch_size": 8, "train_length": 1500},
        "pytorch-lightning_version": "2.0.0",
    }
    path = tmp_path / "test.ckpt"
    torch.save(ckpt, path)

    loaded = load_torch_checkpoint(path)
    assert loaded["hyper_parameters"]["transformer_dim"] == 128
    assert loaded["hyper_parameters"]["dropout"]["transformer"] == 0.2

    cfg2 = BeatThisConfig.from_hparams(loaded["hyper_parameters"])
    assert cfg2.transformer_dim == 128 and cfg2.n_layers == 2

    params2, state2 = torch_state_dict_to_pytree(loaded["state_dict"], cfg2)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-7
        ),
        params,
        params2,
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-7
        ),
        state,
        state2,
    )


def test_loader_handles_noncontiguous_and_half(tmp_path):
    t = torch.arange(24, dtype=torch.float32).reshape(4, 6).t()  # non-contiguous
    h = torch.arange(5, dtype=torch.float16)
    torch.save({"a": t, "b": h, "s": torch.tensor(3.5)}, tmp_path / "x.ckpt")
    loaded = load_torch_checkpoint(tmp_path / "x.ckpt")
    np.testing.assert_array_equal(loaded["a"], t.numpy())
    np.testing.assert_array_equal(loaded["b"], h.numpy())
    assert float(loaded["s"]) == 3.5
