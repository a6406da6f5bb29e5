"""SPMD train-step tests on a virtual 8-device CPU mesh: loss decreases,
BN state advances, grad accumulation equivalence, schedule values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from beat_this_tpu.model import BeatThisConfig, init_beat_this
from beat_this_tpu.parallel import make_mesh
from beat_this_tpu.train.schedule import cosine_warmup_schedule
from beat_this_tpu.train.task import (
    TrainConfig,
    init_train_state,
    make_eval_step,
    make_train_step,
)

CFG = BeatThisConfig(transformer_dim=64, n_layers=1)


def synthetic_batch(accum, micro, t=64, seed=0):
    rng = np.random.RandomState(seed)
    spect = rng.randn(accum, micro, t, 128).astype(np.float32)
    truth_beat = np.zeros((accum, micro, t), np.float32)
    truth_beat[..., ::10] = 1.0
    truth_downbeat = np.zeros((accum, micro, t), np.float32)
    truth_downbeat[..., ::40] = 1.0
    return {
        "spect": spect,
        "truth_beat": truth_beat,
        "truth_downbeat": truth_downbeat,
        "padding_mask": np.ones((accum, micro, t), np.float32),
        "downbeat_mask": np.ones((accum, micro), np.float32),
    }


def test_schedule_matches_reference_formula():
    sched = cosine_warmup_schedule(0.0008, warmup=10, max_iters=100)
    # step 0 -> 0; warmup multiplies cosine
    assert float(sched(0)) == 0.0
    s5 = 0.0008 * 0.5 * (1 + np.cos(np.pi * 5 / 100)) * (5 / 10)
    np.testing.assert_allclose(float(sched(5)), s5, rtol=1e-6)
    s50 = 0.0008 * 0.5 * (1 + np.cos(np.pi * 0.5))
    np.testing.assert_allclose(float(sched(50)), s50, rtol=1e-5, atol=1e-12)
    # past max_iters with raise_last=0: drops to raise branch
    assert float(sched(100)) == 0.0


@pytest.fixture(scope="module")
def train_setup():
    tc = TrainConfig(max_steps=50, accum_steps=2, warmup_steps=5)
    params, bn_state = init_beat_this(0, CFG)
    ts = init_train_state(params, bn_state, tc)
    return tc, ts


def test_train_step_decreases_loss(train_setup):
    tc, ts = train_setup
    step = jax.jit(make_train_step(CFG, tc))
    batch = synthetic_batch(tc.accum_steps, 4)
    losses = []
    for i in range(5):
        ts, parts = step(ts, batch, jax.random.PRNGKey(i))
        losses.append(float(parts["total"]))
    assert losses[-1] < losses[0]
    assert int(ts.step) == 5
    # BN state advanced
    assert not np.allclose(
        np.asarray(ts.bn_state["stem"]["bn1d"]["mean"]), 0.0
    )


def test_train_step_on_mesh(train_setup):
    tc, ts = train_setup
    mesh = make_mesh()
    assert mesh.devices.size == 8
    batch = synthetic_batch(tc.accum_steps, 8, seed=1)
    batch_sharding = NamedSharding(mesh, P(None, "data"))
    repl = NamedSharding(mesh, P())
    sharded_batch = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding), batch
    )
    ts_repl = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), ts)
    step = jax.jit(make_train_step(CFG, tc))
    new_ts, parts = step(ts_repl, sharded_batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(parts["total"]))
    # single-device run must agree with the 8-way sharded run
    new_ts_local, parts_local = step(ts, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        float(parts["total"]), float(parts_local["total"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_ts.params["head"]["b"]),
        np.asarray(new_ts_local.params["head"]["b"]),
        atol=1e-5,
    )


def test_eval_step(train_setup):
    tc, ts = train_setup
    eval_step = jax.jit(make_eval_step(CFG, tc))
    batch = synthetic_batch(1, 4)
    micro = {k: v[0] for k, v in batch.items()}
    out, parts = eval_step(ts.params, ts.bn_state, micro)
    assert out["beat"].shape == (4, 64)
    assert np.isfinite(float(parts["total"]))
