"""Trainer smoke tests on a synthetic corpus: fit a tiny model for a few
steps, checkpoint, resume, validate, test — and ensure the resulting ckpt is
loadable by the public inference path."""

import numpy as np
import pytest

from beat_this_tpu.data import BeatDataModule
from beat_this_tpu.model import BeatThisConfig
from beat_this_tpu.train.task import TrainConfig
from beat_this_tpu.train.trainer import Trainer

from tests.test_dataset import AUGS, make_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_corpus(root, n_pieces=6, frames=260, use_npz=True, dataset="alpha")
    make_corpus(root, n_pieces=3, frames=260, use_npz=True, dataset="gtzan",
                augmentations={})
    return root


@pytest.fixture(scope="module")
def trainer(corpus, tmp_path_factory):
    dm = BeatDataModule(
        corpus, batch_size=2, train_length=128, augmentations=AUGS,
        test_dataset="gtzan", seed=0,
    )
    model_config = BeatThisConfig(transformer_dim=64, n_layers=1)
    tc = TrainConfig(accum_steps=2, warmup_steps=2, compute_dtype="float32")
    return Trainer(
        model_config, tc, dm, max_epochs=2, val_frequency=1,
        checkpoint_dir=tmp_path_factory.mktemp("ckpts"), name="smoke", seed=0,
        use_mesh=False,
    )


def test_fit_validate_test_and_resume(trainer):
    ts = trainer.fit()
    assert int(np.asarray(ts.step)) > 0
    # losses logged per epoch
    train_records = [r for r in trainer.history if "train_loss_total" in r]
    assert len(train_records) == 2
    val_records = [r for r in trainer.history if "val_loss_total" in r]
    assert len(val_records) == 2
    assert "val_F-measure_beat" in val_records[0]

    # checkpoint exists and can resume
    ckpt_path = trainer.checkpoint_dir / "smoke-S0.ckpt"
    assert ckpt_path.exists()
    ts2, epoch = trainer.load_checkpoint(ckpt_path)
    assert epoch == 2
    np.testing.assert_allclose(
        np.asarray(ts2.params["head"]["b"]), np.asarray(ts.params["head"]["b"]),
        atol=1e-7,
    )
    # optimizer state restored (adam mu non-zero after steps)
    leaves = [np.asarray(x) for x in
              __import__("jax").tree_util.tree_leaves(ts2.opt_state)]
    assert any(np.abs(leaf).sum() > 0 for leaf in leaves if leaf.ndim > 0)

    # test pass produces metrics
    record, piece_metrics, datasets = trainer.test(ts)
    assert "test_F-measure_beat" in record
    assert len(piece_metrics) == 3


def test_checkpoint_loadable_by_inference(trainer, corpus):
    from beat_this_tpu.inference import Spect2Frames

    ckpt_path = trainer.checkpoint_dir / "smoke-S0.ckpt"
    s2f = Spect2Frames(str(ckpt_path), chunk_size=96, border_size=6)
    spect = np.random.RandomState(0).randn(200, 128).astype(np.float32)
    beat, downbeat = s2f(spect)
    assert beat.shape == (200,)
    assert np.all(np.isfinite(beat))


def test_eval_step_is_cached_across_validations(trainer):
    """A second validation epoch must not rebuild or recompile the eval step
    (the jitted callable is constructed once and reused)."""
    step_a = trainer.eval_step
    step_b = trainer.eval_step
    assert step_a is step_b
    ts = trainer.fit(max_steps_override=1)
    trainer.validate(ts, epoch=98)
    n_compiles = step_a._cache_size()
    assert n_compiles > 0
    trainer.validate(ts, epoch=99)
    assert step_a._cache_size() == n_compiles
