"""End-to-end learning proof: the REAL Trainer.fit on a synthetic
click-track corpus must drive train-set F-measure to ~1.0 through the full
pipeline — data loading, augmentation-free crops, the jitted train step
(value_and_grad through the whole model), BN state accumulation, cosine
schedule, checkpointing — and the full inference + postprocessing path
(ChunkedPredictor -> peak picking -> F-measure).

This is the test that would catch a subtly wrong gradient anywhere in the
training stack: a broken backward cannot reach F=1.0 on beats AND downbeats.
(The Pallas custom-VJP kernels are CPU-unreachable here; the same check runs
on TPU via launch_scripts/overfit_smoke.py, artifact OVERFIT_r*.json.)

Reference behavior being reproduced: training convergence of
launch_scripts/train.py:118-132 / pl_module.py:199-222.
"""

import numpy as np
import pytest

from beat_this_tpu.data import BeatDataModule
from beat_this_tpu.data.dataset import BeatTrackingDataset
from beat_this_tpu.data.synth import write_click_corpus
from beat_this_tpu.model import BeatThisConfig
from beat_this_tpu.train.task import TrainConfig
from beat_this_tpu.train.trainer import Trainer


@pytest.mark.slow
def test_trainer_overfits_click_corpus_to_f_measure_one(tmp_path):
    train_items = write_click_corpus(
        tmp_path, n_pieces=4, n_val_pieces=1, frames=520, beat_gain=6.0
    )
    dm = BeatDataModule(
        tmp_path, batch_size=4, train_length=192, augmentations={},
        test_dataset=None, seed=0,
    )
    dm.setup("fit")
    pos_weights = dm.get_train_positive_weights(widen_target_mask=3)
    assert pos_weights["beat"] > 1 and pos_weights["downbeat"] > 1

    config = BeatThisConfig(transformer_dim=64, n_layers=1)
    tc = TrainConfig(
        accum_steps=1, warmup_steps=5, lr=1e-3, compute_dtype="float32",
        pos_weight_beat=pos_weights["beat"],
        pos_weight_downbeat=pos_weights["downbeat"],
    )
    trainer = Trainer(
        config, tc, dm, max_epochs=45, val_frequency=1000,
        checkpoint_dir=tmp_path / "ckpts", name="overfit", seed=0,
        use_mesh=False,
    )
    ts = trainer.fit()

    # loss must have collapsed from its ~2.0 start
    first = next(r for r in trainer.history if "train_loss_total" in r)
    last = [r for r in trainer.history if "train_loss_total" in r][-1]
    assert last["train_loss_total"] < first["train_loss_total"] * 0.5

    # full-piece prediction through the public inference + postprocessing
    # path; full pieces (10.4 s) so eval_trim_beats=5 leaves beats to score
    import jax

    from beat_this_tpu.inference import ChunkedPredictor, LoadedModel
    from beat_this_tpu.metrics import Metrics
    from beat_this_tpu.postprocessing import Postprocessor

    predictor = ChunkedPredictor(
        LoadedModel(config, jax.device_get(ts.params), jax.device_get(ts.bn_state))
    )
    postp = Postprocessor("minimal", fps=50)
    metrics = Metrics(eval_trim_beats=5)
    full = BeatTrackingDataset(
        train_items, tmp_path, train_length=None, augmentations={},
        deterministic=True,
    )
    items = [full[i] for i in range(len(full))]
    results = predictor.predict_many([it["spect"] for it in items])
    f_beat, f_down = [], []
    for item, (beat_logits, down_logits) in zip(items, results):
        beat, down = postp(beat_logits, down_logits)
        f_beat.append(
            metrics(item["truth_orig_beat"], beat, step="val")["F-measure"]
        )
        f_down.append(
            metrics(item["truth_orig_downbeat"], down, step="val")["F-measure"]
        )
    assert np.mean(f_beat) >= 0.95, f_beat
    assert np.mean(f_down) >= 0.90, f_down
