#!/usr/bin/env python3
"""Trainer learning proof on real hardware: overfit a synthetic click-track
corpus with the REAL Trainer.fit and score the training pieces through the
full inference + postprocessing path.

On TPU this exercises the Pallas custom-VJP training kernels (flash
attention, fused frequency roformer) plus in-kernel dropout — exactly the
code the CPU test suite cannot reach (tests/test_overfit.py is the CPU/XLA
twin). A broken backward cannot reach F-measure ~1.0 on beats AND downbeats.

Writes a JSON artifact (default OVERFIT.json) with the loss curve and the
final F-measures so every round records a pass/fail trace.

Reference behavior being reproduced: training convergence of
launch_scripts/train.py:118-132 / pl_module.py:199-222.

Example (TPU, ~5 min):
    python launch_scripts/overfit_smoke.py --out OVERFIT_r03.json
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(args):
    import os

    import jax
    import numpy as np

    from beat_this_tpu.profiler import maybe_enable_compilation_cache

    maybe_enable_compilation_cache(
        default_dir=os.path.expanduser("~/.cache/beat_this_tpu/xla-cache")
    )

    from beat_this_tpu.data import BeatDataModule
    from beat_this_tpu.data.dataset import BeatTrackingDataset
    from beat_this_tpu.data.synth import write_click_corpus
    from beat_this_tpu.inference import ChunkedPredictor, LoadedModel
    from beat_this_tpu.metrics import Metrics
    from beat_this_tpu.model import BeatThisConfig
    from beat_this_tpu.ops.flash_attention import flash_attention_available
    from beat_this_tpu.postprocessing import Postprocessor
    from beat_this_tpu.train.task import TrainConfig
    from beat_this_tpu.train.trainer import Trainer

    platform = jax.devices()[0].platform
    kernels = flash_attention_available()
    print(f"platform={platform} pallas_kernels={kernels}")

    # pieces must be longer than the crop; crops >= 512 frames route the main
    # transformer through the Pallas flash kernel (model/layers.py:37)
    root = Path(args.workdir or tempfile.mkdtemp(prefix="beat_this_overfit_"))
    train_items = write_click_corpus(
        root, n_pieces=4, n_val_pieces=1,
        frames=max(700, args.train_length + 100), beat_gain=6.0,
    )
    dm = BeatDataModule(
        root, batch_size=4, train_length=args.train_length, augmentations={},
        test_dataset=None, seed=0,
    )
    dm.setup("fit")
    pos_weights = dm.get_train_positive_weights(widen_target_mask=3)
    print("pos weights:", pos_weights)

    config = BeatThisConfig(
        transformer_dim=args.transformer_dim, n_layers=args.n_layers
    )
    tc = TrainConfig(
        accum_steps=1, warmup_steps=5, lr=args.lr,
        compute_dtype=args.compute_dtype,
        pos_weight_beat=pos_weights["beat"],
        pos_weight_downbeat=pos_weights["downbeat"],
    )
    trainer = Trainer(
        config, tc, dm, max_epochs=args.epochs, val_frequency=10**9,
        checkpoint_dir=root / "ckpts", name="overfit", seed=0, use_mesh=False,
    )
    t0 = time.time()
    ts = trainer.fit()
    fit_s = time.time() - t0

    predictor = ChunkedPredictor(
        LoadedModel(
            config, jax.device_get(ts.params), jax.device_get(ts.bn_state)
        )
    )
    postp = Postprocessor("minimal", fps=50)
    metrics = Metrics(eval_trim_beats=5)
    full = BeatTrackingDataset(
        train_items, root, train_length=None, augmentations={},
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

    curve = [
        {k: r[k] for k in ("epoch", "train_loss_total")}
        for r in trainer.history
        if "train_loss_total" in r
    ]
    report = {
        "platform": platform,
        "pallas_kernels": bool(kernels),
        "compute_dtype": args.compute_dtype,
        "transformer_dim": args.transformer_dim,
        "n_layers": args.n_layers,
        "epochs": args.epochs,
        "fit_s": round(fit_s, 1),
        "loss_first": curve[0]["train_loss_total"],
        "loss_last": curve[-1]["train_loss_total"],
        "f_measure_beat": [round(float(f), 4) for f in f_beat],
        "f_measure_downbeat": [round(float(f), 4) for f in f_down],
        "mean_f_beat": round(float(np.mean(f_beat)), 4),
        "mean_f_downbeat": round(float(np.mean(f_down)), 4),
        "ok": bool(np.mean(f_beat) >= 0.95 and np.mean(f_down) >= 0.90),
        "curve": curve,
    }
    Path(args.out).write_text(json.dumps(report, indent=1) + "\n")
    print(
        f"fit {fit_s:.0f}s, mean F beat={report['mean_f_beat']} "
        f"downbeat={report['mean_f_downbeat']} -> ok={report['ok']} "
        f"({args.out})"
    )
    return 0 if report["ok"] else 1


def get_parser():
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--epochs", type=int, default=45)
    parser.add_argument("--transformer-dim", type=int, default=64)
    parser.add_argument("--n-layers", type=int, default=1)
    parser.add_argument("--train-length", type=int, default=512)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument(
        "--compute-dtype", default="float32", choices=["float32", "bfloat16"]
    )
    parser.add_argument("--out", default="OVERFIT.json")
    parser.add_argument(
        "--workdir", default=None,
        help="reuse a directory for the synthetic corpus (default: mkdtemp)",
    )
    return parser


if __name__ == "__main__":
    sys.exit(main(get_parser().parse_args()))
