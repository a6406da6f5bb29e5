#!/usr/bin/env python3
"""Stage/variant bench for the time-axis roformer blocks on the real TPU.

For each time-block shape in the eval model (frontend C=32/64/128 at
batch*freq items, main transformer C=512 at batch items), measures:

  copy   — bare HBM round trip of the activations (the fusion floor)
  xla    — composable path: attention_block (flash kernel) + ff_residual
  fused  — ops/fused_time.py whole-block kernel

Each timing scans over distinct inputs inside one jitted executable (the
axon relay CSEs same-input scan bodies and hides per-dispatch latency
otherwise — see CLAUDE.md).

Run: python tools/bench_time_stages.py [--batch 16] [--scan 10]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--scan", type=int, default=10)
    ap.add_argument("--n", type=int, default=1500)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from beat_this_tpu.model.layers import attention_block, ff_residual
    from beat_this_tpu.ops.fused_time import fused_time_roformer
    from beat_this_tpu.ops.rotary import rope_tables

    print(f"backend: {jax.devices()[0].platform}, n={args.n}, "
          f"scan={args.scan}, batch={args.batch}")

    rng = np.random.RandomState(0)
    shapes = [
        ("front C=32 ", args.batch * 32, 32, 1),
        ("front C=64 ", args.batch * 16, 64, 2),
        ("front C=128", args.batch * 8, 128, 4),
        ("main  C=512", args.batch, 512, 16),
    ]
    rope = rope_tables(args.n, 32)

    def timed(fn, xs):
        # reduce the body output to one scalar per scan step: device_get
        # pulls the output through the axon relay, and a full
        # (scan, items, n, c) result (with TPU lane padding inflating
        # narrow-C layouts 4x) turns the measurement into a network-transfer
        # benchmark; a sum (unlike a slice) keeps XLA from dead-code-
        # eliminating part of the composable variant's computation
        jitted = jax.jit(lambda xs: jax.lax.scan(
            lambda _, x: (0, jnp.sum(fn(x), dtype=jnp.float32)), 0, xs)[1])
        out = jitted(xs)
        jax.device_get(out)  # compile + warm (block_until_ready is a no-op
        # through the relay)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            jax.device_get(jitted(xs))
        dt = (time.perf_counter() - t0) / reps
        return dt * 1000 / args.scan

    for name, items, c, heads in shapes:
        attn = {
            "norm_gamma": jnp.asarray(rng.randn(c) * 0.1 + 1, jnp.float32),
            "qkv_w": jnp.asarray(rng.randn(c, 3 * c) / np.sqrt(c), jnp.float32),
            "gates_w": jnp.asarray(rng.randn(c, heads) / np.sqrt(c), jnp.float32),
            "gates_b": jnp.asarray(rng.randn(heads) * 0.3, jnp.float32),
            "out_w": jnp.asarray(rng.randn(c, c) / np.sqrt(c), jnp.float32),
        }
        ff = {
            "norm_gamma": jnp.asarray(rng.randn(c) * 0.1 + 1, jnp.float32),
            "w1": jnp.asarray(rng.randn(c, 4 * c) / np.sqrt(c), jnp.float32),
            "b1": jnp.asarray(rng.randn(4 * c) * 0.1, jnp.float32),
            "w2": jnp.asarray(rng.randn(4 * c, c) / np.sqrt(4 * c), jnp.float32),
            "b2": jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
        }
        xs = jnp.asarray(
            rng.randn(args.scan, items, args.n, c), jnp.bfloat16
        )

        variants = {
            "copy": lambda x: x + 1.0,
            "xla": lambda x: ff_residual(
                ff, x + attention_block(attn, x, rope, heads)
            ),
            "fused": lambda x: fused_time_roformer(
                x, attn, ff, rope[0], rope[1], heads
            ),
        }
        for vname, fn in variants.items():
            try:
                ms = timed(fn, xs)
                print(f"{name} {vname:5s}: {ms:8.2f} ms/batch")
            except Exception as e:  # noqa: BLE001
                print(f"{name} {vname:5s}: FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
