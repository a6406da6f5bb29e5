#!/usr/bin/env python3
"""Throughput of the on-device batched DBN decoder on the TPU.

The reference's DBN postprocessor is madmom's Cython Viterbi on the host,
decoding one piece at a time over the 55-215 bpm bar-pointer spaces
(4,347 states for 3/4 + 5,796 for 4/4 at 50 fps) — widely the slowest
stage of its pipeline. Ours runs the whole batch as one
lax.scan Viterbi (forward AND backtrack on device, pieces grouped by
padded length). This records audio-seconds decoded per second.

Usage: python tools/bench_dbn_tpu.py [--pieces 32] [--frames 3000]
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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pieces", type=int, default=32)
    parser.add_argument("--frames", type=int, default=3000)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    from beat_this_tpu.postprocessing.dbn import DbnDecoder
    from beat_this_tpu.profiler import maybe_enable_compilation_cache

    maybe_enable_compilation_cache(
        default_dir=os.path.expanduser("~/.cache/beat_this_tpu/xla-cache")
    )
    import jax

    print("backend:", jax.devices()[0].platform, flush=True)

    rng = np.random.RandomState(0)
    pieces, truth_times = [], []
    for i in range(args.pieces):
        t = args.frames + 64 * (i % 4)  # a few length buckets, like GTZAN
        act = np.full((t, 2), 0.02) + rng.uniform(0, 0.01, (t, 2))
        period = 20 + (i % 5) * 2  # 120-150 bpm range
        count = 0
        frames_i = []
        for frame in range(5 + (i % 7), t, period):
            act[frame] = [0.02, 0.75] if count % 4 == 0 else [0.85, 0.02]
            frames_i.append(frame)
            count += 1
        pieces.append(act)
        truth_times.append(np.asarray(frames_i) / 50.0)
    audio_s = sum(len(p) for p in pieces) / 50.0

    decoder = DbnDecoder()  # production parameters (3 and 4 beats per bar)
    t0 = time.perf_counter()
    outs = decoder.decode_many(pieces)
    cold = time.perf_counter() - t0
    print(f"cold (with compiles): {cold:.1f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = decoder.decode_many(pieces)
        times.append(time.perf_counter() - t0)
    warm = min(times)
    n_beats = int(np.mean([len(o) for o in outs]))
    # correctness alongside the timing: beat F-measure of the decoded
    # beats against the click construction (protocol trim at 5 s), so the
    # DBNBENCH artifact is not timing random plumbing (VERDICT r4 #4)
    from beat_this_tpu.metrics import Metrics

    metrics = Metrics(eval_trim_beats=5)
    f_scores = [
        metrics(truth, out[:, 0], step="val")["F-measure"]
        for truth, out in zip(truth_times, outs)
    ]
    record = {
        "platform": jax.devices()[0].platform,
        "pieces": args.pieces,
        "audio_seconds": round(audio_s, 1),
        "warm_decode_s": round(warm, 2),
        "audio_x_realtime": round(audio_s / warm, 1),
        "s_per_piece": round(warm / args.pieces, 4),
        "mean_beats_per_piece": n_beats,
        "mean_f_beat_clicks": round(float(np.mean(f_scores)), 4),
        "min_f_beat_clicks": round(float(np.min(f_scores)), 4),
        "cold_decode_s": round(cold, 2),
    }
    print(json.dumps(record), flush=True)
    if args.out:
        Path(args.out).write_text(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
