#!/usr/bin/env python3
"""Sweep the fused-freq eval kernel's row-block size on the real TPU.

The eval grid currently uses a fixed _BLOCK_ROWS=1024 for every frontend
block, which at C=32 means 750 tiny grid programs per batch-16 step.
This sweeps block sizes per (C, F) shape to find whether per-program
overhead is a real cost (hypothesis: scale rows inversely with C).

Usage: python tools/bench_fused_freq_rows.py [--blocks 1024,2048,4096,8192]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--blocks", default="1024,2048,4096,8192")
    parser.add_argument("--score-rows", default=None,
                        help="sweep _SCORE_ROWS_EVAL instead of _BLOCK_ROWS")
    parser.add_argument("--scan-len", type=int, default=8)
    parser.add_argument("--batch", type=int, default=16)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from beat_this_tpu.ops import fused_freq as ff_mod
    from beat_this_tpu.ops.rotary import rope_tables

    print("backend:", jax.devices()[0].platform)
    sweep_score = args.score_rows is not None
    blocks = [
        int(b)
        for b in (args.score_rows if sweep_score else args.blocks).split(",")
    ]
    scan_len = args.scan_len
    batch = args.batch
    t = 1500
    rng = np.random.RandomState(0)

    # the three frontend shapes at inference batch `batch`
    shapes = [(32, 32), (64, 16), (128, 8)]  # (C, F)
    for c, f in shapes:
        heads = c // 32
        items = batch * t
        cos, sin = rope_tables(f, 32)
        attn_params = {
            "norm_gamma": jnp.asarray(rng.randn(c), jnp.float32),
            "qkv_w": jnp.asarray(rng.randn(c, 3 * c) * 0.05, jnp.float32),
            "gates_w": jnp.asarray(rng.randn(c, heads) * 0.05, jnp.float32),
            "gates_b": jnp.asarray(rng.randn(heads), jnp.float32),
            "out_w": jnp.asarray(rng.randn(c, c) * 0.05, jnp.float32),
        }
        ff_params = {
            "norm_gamma": jnp.asarray(rng.randn(c), jnp.float32),
            "w1": jnp.asarray(rng.randn(c, 4 * c) * 0.05, jnp.float32),
            "b1": jnp.asarray(rng.randn(4 * c), jnp.float32),
            "w2": jnp.asarray(rng.randn(4 * c, c) * 0.05, jnp.float32),
            "b2": jnp.asarray(rng.randn(c), jnp.float32),
        }
        xs = jnp.asarray(
            rng.randn(scan_len, items, f, c) * 0.5, jnp.bfloat16
        )

        for block in blocks:
            if sweep_score:
                ff_mod._SCORE_ROWS_EVAL = block
            else:
                ff_mod._BLOCK_ROWS = block
            jax.clear_caches()

            @jax.jit
            def run(xs, attn_params=attn_params, ff_params=ff_params):
                def step(_, x):
                    out = ff_mod.fused_freq_roformer(
                        x, attn_params, ff_params, cos, sin
                    )
                    # tiny per-step result: keep the device->host transfer
                    # off the measured path (full outputs are ~400 MB)
                    return None, out[0, 0, :2].astype(jnp.float32)

                _, outs = jax.lax.scan(step, None, xs)
                return outs

            try:
                jax.device_get(run(xs))  # compile
                jax.device_get(run(xs))  # warm
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    out = run(xs)
                    jax.device_get(out)
                    best = min(best, time.perf_counter() - t0)
                per_chunk = best / (scan_len * batch) * 1e3
                kind = "score" if sweep_score else "block"
                print(
                    f"C={c:4d} F={f:3d} {kind}={block:5d}: "
                    f"{best * 1e3:8.1f} ms/scan  {per_chunk:6.3f} ms/chunk"
                )
            except Exception as e:  # noqa: BLE001
                print(f"C={c:4d} F={f:3d} block={block:5d}: FAIL {type(e).__name__}: {str(e)[:120]}")
    ff_mod._BLOCK_ROWS = 1024


if __name__ == "__main__":
    main()
