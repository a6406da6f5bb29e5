"""Subprocess worker for the multi-host data-parallel test.

Usage: python tests/multihost_worker.py <corpus_root> <out_json>

Environment decides the topology: BEAT_THIS_COORDINATOR /
BEAT_THIS_NUM_PROCESSES / BEAT_THIS_PROCESS_ID for a multi-process run
(plus XLA_FLAGS=--xla_force_host_platform_device_count=N for N local CPU
devices); unset for a single-process run. Trains 2 optimizer steps of a tiny
model over the global mesh and writes the per-epoch losses as JSON.
"""

import json
import sys
from pathlib import Path


def main():
    root, out = Path(sys.argv[1]), Path(sys.argv[2])
    from beat_this_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()
    import jax
    import numpy as np

    from beat_this_tpu.data import BeatDataModule
    from beat_this_tpu.model import BeatThisConfig
    from beat_this_tpu.train.task import TrainConfig
    from beat_this_tpu.train.trainer import Trainer

    dm = BeatDataModule(
        root, batch_size=8, train_length=128, augmentations={},
        test_dataset=None, seed=0,
    )
    config = BeatThisConfig(transformer_dim=32, n_layers=1)
    tc = TrainConfig(
        accum_steps=1, warmup_steps=2, lr=1e-3, compute_dtype="float32",
        pos_weight_beat=10, pos_weight_downbeat=40,
    )
    trainer = Trainer(
        config, tc, dm, max_epochs=2, val_frequency=1000,
        checkpoint_dir=root / f"ckpts{jax.process_index()}", name="mh",
        seed=0, use_mesh=True,
    )
    ts = trainer.fit()
    losses = [
        r["train_loss_total"] for r in trainer.history
        if "train_loss_total" in r
    ]
    out.write_text(json.dumps({
        "process": jax.process_index(),
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "losses": losses,
        "step": int(np.asarray(jax.device_get(ts.step))),
    }))


if __name__ == "__main__":
    main()
