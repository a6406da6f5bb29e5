#!/usr/bin/env python3
"""Benchmark: audio-seconds of beat tracking processed per second per chip.

Runs the flagship (final0-sized: transformer_dim=512, 6 layers, ~20M params)
model in bfloat16 through the batched chunked-inference path on the default
JAX backend (the TPU when available) and prints ONE JSON line:

    {"metric": "audio_sec_per_sec_per_chip", "value": N, "unit": "x_realtime",
     "vs_baseline": N / 2000}

Baseline: the rebuild target of >= 2000x real-time per v5e chip
(BASELINE.json). The reference implementation itself publishes no numbers;
its per-chunk batch-1 GPU loop is the design being replaced.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from beat_this_tpu.model import BeatThisConfig, apply_beat_this, init_beat_this

    config = BeatThisConfig()  # full-size
    params, state = init_beat_this(0, config)

    chunk = 1500
    border = 6
    batch = 16  # chunks per device batch
    scan_len = 20  # batches per executable: amortizes dispatch latency
    fps = 50.0

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

    # compile + warmup (device_get forces a full host round trip: through
    # the axon relay, block_until_ready does not actually block)
    jax.device_get(forward_many(params, state, xs))
    jax.device_get(forward_many(params, state, xs))

    # steady-state timing
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward_many(params, state, xs)
    jax.device_get(out)
    elapsed = time.perf_counter() - t0

    # each chunk contributes chunk - 2*border unique frames in the
    # overlapped inference scheme
    audio_seconds = iters * scan_len * batch * (chunk - 2 * border) / fps
    value = audio_seconds / elapsed
    print(
        json.dumps(
            {
                "metric": "audio_sec_per_sec_per_chip",
                "value": round(value, 1),
                "unit": "x_realtime",
                "vs_baseline": round(value / 2000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
