#!/usr/bin/env python3
"""Wall-clock the FULL evaluation protocol on the TPU — not the model
forward (bench.py covers that) but everything compute_paper_metrics.py
does per piece: predict-datamodule iteration, bucketed batched chunked
inference with stitching, batched postprocessing, and per-piece metrics.

Builds a synthetic GTZAN-layout corpus of multi-chunk CLICK pieces (bursts
at the annotated beats) and — by default — a checkpoint TRAINED on that
click structure (tools/check_all_tpu._flagship_trained: 30 real optimizer
steps of the flagship geometry with every Pallas VJP active), then times
the second full pass (the first pays any cold per-bucket compiles).
Reports pieces/s and audio-seconds/s through the whole protocol, the unit
a user running the paper evaluation experiences, alongside a mean beat
F-measure that must be near 1.0 — making the timing artifact double as a
protocol-correctness artifact (VERDICT r4 #4). `--random-weights` restores
the plumbing-only mode.

Usage: python tools/bench_eval_protocol_tpu.py [--pieces 64] [--frames 2800]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "launch_scripts"))
sys.path.insert(0, str(REPO / "tests"))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pieces", type=int, default=64)
    parser.add_argument("--frames", type=int, default=2800)
    parser.add_argument("--random-weights", action="store_true",
                        help="skip the fixture training steps; F will be noise")
    parser.add_argument("--fixture-steps", type=int, default=150,
                        help="optimizer steps for the trained fixture; must "
                        "be enough for beat peaks to cross the REAL "
                        "postprocessor's 0-logit threshold (30 is not: "
                        "peaks stay below 0 and F reads 0.0)")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    from beat_this_tpu.profiler import maybe_enable_compilation_cache

    maybe_enable_compilation_cache(
        default_dir=os.path.expanduser("~/.cache/beat_this_tpu/xla-cache")
    )

    import tempfile

    import jax
    import torch

    from test_dataset import make_corpus

    from beat_this_tpu.inference import (
        ChunkedPredictor,
        LoadedModel,
        load_checkpoint,
        load_model,
        predict_postprocess_batched,
    )
    from beat_this_tpu.io.torch_ckpt import pytree_to_torch_state_dict
    from beat_this_tpu.metrics import Metrics
    from beat_this_tpu.model import BeatThisConfig, init_beat_this
    from beat_this_tpu.postprocessing import Postprocessor
    from compute_paper_metrics import datamodule_setup

    print("backend:", jax.devices()[0].platform, flush=True)
    tmp = Path(tempfile.mkdtemp(prefix="evalproto-"))
    root = tmp / "data"
    root.mkdir()
    make_corpus(root, n_pieces=args.pieces, frames=args.frames,
                dataset="gtzan", augmentations={},
                click_scale=0.0 if args.random_weights else 6.0)

    config = BeatThisConfig()  # flagship
    if args.random_weights:
        params, state = init_beat_this(0, config)
    else:
        sys.path.insert(0, str(REPO / "tools"))
        from check_all_tpu import _flagship_trained

        config, params, state, curve = _flagship_trained(
            steps=args.fixture_steps
        )
        print(f"trained fixture: loss {curve[0]:.3f} -> {curve[-1]:.3f} "
              f"over {len(curve)} steps", flush=True)
    sd = pytree_to_torch_state_dict(params, state)
    ckpt_path = tmp / "flagship.ckpt"
    torch.save(
        {
            "state_dict": {
                "model." + k: torch.as_tensor(np.ascontiguousarray(v))
                for k, v in sd.items()
            },
            "hyper_parameters": {},
            "datamodule_hyper_parameters": {
                "batch_size": 8, "test_dataset": "gtzan",
            },
            "pytorch-lightning_version": "2.0.0",
        },
        ckpt_path,
    )

    checkpoint = load_checkpoint(str(ckpt_path))
    loaded = load_model(str(ckpt_path))
    import jax.numpy as jnp

    predictor = ChunkedPredictor(loaded, compute_dtype=jnp.bfloat16)
    postprocessor = Postprocessor(type="minimal", fps=50)
    metrics = Metrics(eval_trim_beats=5)

    def one_pass():
        datamodule = datamodule_setup(checkpoint, 2, "test", root)
        n, f_sum, audio_s = 0, 0.0, 0.0
        for piece, beat, downbeat in predict_postprocess_batched(
            predictor, postprocessor, datamodule.predict_pieces()
        ):
            f_sum += float(
                metrics(piece["truth_orig_beat"], beat, step="test")[
                    "F-measure"
                ]
            )
            audio_s += len(piece["spect"]) / 50.0
            n += 1
        return n, f_sum / max(n, 1), audio_s

    t0 = time.perf_counter()
    n, f_mean, audio_s = one_pass()  # cold: per-bucket compiles
    cold = time.perf_counter() - t0
    print(f"cold pass: {n} pieces in {cold:.1f}s", flush=True)
    t0 = time.perf_counter()
    n, f_mean, audio_s = one_pass()
    warm = time.perf_counter() - t0
    record = {
        "platform": jax.devices()[0].platform,
        "pieces": n,
        "audio_seconds": round(audio_s, 1),
        "warm_protocol_s": round(warm, 2),
        "pieces_per_s": round(n / warm, 2),
        "audio_x_realtime": round(audio_s / warm, 1),
        "cold_protocol_s": round(cold, 2),
        ("mean_f_beat_randomweights" if args.random_weights
         else "mean_f_beat_trained"): round(f_mean, 4),
    }
    if not args.random_weights:
        record["fixture_steps"] = args.fixture_steps
    print(json.dumps(record), flush=True)
    if args.out:
        Path(args.out).write_text(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
