#!/usr/bin/env python3
"""Bench the SMALL model family (reference `small0/1/2`: transformer_dim
128, ~2M params — README.md:88, paper Table 2 "smaller model") on the TPU:
eval throughput through the same batched chunked path as bench.py, plus
the training step at the reference's bs 8 x accum 8 configuration. The
flagship bench (bench.py) is the driver-tracked headline; this records
that the second released model family hits TPU speed too.

Usage: python tools/bench_small_tpu.py [--out SMALL_BENCH.json]
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

import bench  # noqa: E402  (the repo-root bench: reuse its FLOP model)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from beat_this_tpu.model import (
        BeatThisConfig,
        apply_beat_this,
        init_beat_this,
    )
    from beat_this_tpu.profiler import maybe_enable_compilation_cache

    maybe_enable_compilation_cache(
        default_dir=os.path.expanduser("~/.cache/beat_this_tpu/xla-cache")
    )
    print("backend:", jax.devices()[0].platform, flush=True)

    config = BeatThisConfig(transformer_dim=128)  # the released small family
    params, state = init_beat_this(0, config)
    n_params = sum(
        int(np.prod(v.shape)) for v in jax.tree_util.tree_leaves(params)
    )

    chunk, border, batch, scan_len, fps = 1500, 6, 8, 40, 50.0

    @jax.jit
    def forward_many(params, state, xs):
        def step(_, x):
            out, _ = apply_beat_this(
                params, state, x, config, compute_dtype=jnp.bfloat16
            )
            return None, (out["beat"][:, 0], out["downbeat"][:, 0])

        _, outs = jax.lax.scan(step, None, xs)
        return outs

    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(scan_len, batch, chunk, 128), jnp.float32)
    jax.device_get(forward_many(params, state, xs))  # compile
    jax.device_get(forward_many(params, state, xs))  # warm
    iters, samples = 3, 3
    times = []
    for _ in range(samples):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = forward_many(params, state, xs)
        jax.device_get(out)
        times.append(time.perf_counter() - t0)
    elapsed = min(times)
    audio_seconds = iters * scan_len * batch * (chunk - 2 * border) / fps
    eval_x = audio_seconds / elapsed

    try:
        train_s, train_median = bench.bench_train_step(config)
    except Exception as exc:  # keep the eval number even if training fails
        print(f"train bench failed: {type(exc).__name__}: {exc}"[:200],
              file=sys.stderr)
        train_s = train_median = None

    record = {
        "model": "small (transformer_dim=128)",
        "params": n_params,
        "eval_x_realtime": round(eval_x, 1),
        "eval_x_realtime_median": round(
            audio_seconds / float(np.median(times)), 1
        ),
        "train_step_s": round(train_s, 3) if train_s else None,
        "train_step_s_median": (
            round(train_median, 3) if train_median else None
        ),
        "mfu_pct": round(
            100.0
            * iters
            * scan_len
            * batch
            * bench.model_flops(config, chunk)
            / elapsed
            / 197e12,
            2,
        ),
    }
    print(json.dumps(record), flush=True)
    if args.out:
        Path(args.out).write_text(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
