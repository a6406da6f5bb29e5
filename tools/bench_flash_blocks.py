#!/usr/bin/env python3
"""Sweep flash-attention block sizes on the real TPU for the model's two
attention shapes: frontend time attention (bh=512, n=1500, d=32) and main
transformer (bh=256, n=1500, d=32) at inference batch 16.

Also times the packed small-attention kernel and the XLA fallback for
reference.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(run, xs, iters=3):
    import jax

    jax.device_get(run(xs))
    jax.device_get(run(xs))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(xs)
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scan-len", type=int, default=10)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from beat_this_tpu.model.layers import sdpa
    from beat_this_tpu.ops.flash_attention import flash_attention
    from beat_this_tpu.ops.rotary import rope_tables

    print("backend:", jax.devices()[0].platform)
    scan_len = args.scan_len
    rng = np.random.RandomState(0)

    for bh, n, d, tag in [(512, 1500, 32, "frontend-T"), (256, 1500, 32, "main")]:
        cos, sin = rope_tables(n, d)
        xs = jnp.asarray(
            rng.randn(scan_len, 3, bh, n, d), jnp.bfloat16
        )
        flops = scan_len * bh * 2 * 2 * n * n * d  # QK^T + PV

        def make(block_q, block_k):
            @jax.jit
            def run(xs):
                def step(_, qkv):
                    o = flash_attention(
                        qkv[0], qkv[1], qkv[2],
                        block_q=block_q, block_k=block_k,
                        rope_cos=cos, rope_sin=sin,
                    )
                    return None, o[:, 0, 0]

                _, outs = jax.lax.scan(step, None, xs)
                return outs

            return run

        print(f"\n-- {tag}: bh={bh} n={n} d={d} --")
        for bq, bk in [(512, 512), (768, 512), (1536, 512), (1536, 768),
                       (1536, 1536), (512, 1536), (768, 768)]:
            try:
                dt = timed(make(bq, bk), xs)
                print(f"bq={bq:5d} bk={bk:5d}  {dt*1e3:8.2f} ms  "
                      f"{flops/dt/1e12:6.1f} TF/s")
            except Exception as exc:
                print(f"bq={bq:5d} bk={bk:5d}  FAILED {type(exc).__name__}")

        @jax.jit
        def run_xla(xs):
            def step(_, qkv):
                from beat_this_tpu.ops.rotary import apply_rope

                q = apply_rope(qkv[0].reshape(bh, 1, n, d), cos, sin)
                k = apply_rope(qkv[1].reshape(bh, 1, n, d), cos, sin)
                o = sdpa(q, k, qkv[2].reshape(bh, 1, n, d))
                return None, o[:, 0, 0, 0]

            _, outs = jax.lax.scan(step, None, xs)
            return outs

        dt = timed(run_xla, xs)
        print(f"xla sdpa          {dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
