#!/usr/bin/env python3
"""Sweep the fused-freq TRAINING kernels' row-block size on the real TPU.

Training rows are items*F = batch*1500*F (up to 384k at the block-1
microbatch), so the pinned 512-row fwd/bwd blocks mean ~2.6k grid programs
per microbatch across the three frontend blocks — the train profiler
attributes ~20 ms/microbatch to the freq blocks, far above their compute
roofline, pointing at per-program overhead. This sweeps the shared
fwd/bwd training block size (the two passes must agree: dropout masks are
salted by program id) per (C, F) shape.

Usage: python tools/bench_fused_freq_train_rows.py [--blocks 512,1024,2048,4096]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--blocks", default="512,1024,2048,4096")
    parser.add_argument("--scan-len", type=int, default=5)
    parser.add_argument("--batch", type=int, default=8)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from beat_this_tpu.ops import fused_freq as ff_mod
    from beat_this_tpu.ops.rotary import rope_tables
    from beat_this_tpu.profiler import maybe_enable_compilation_cache

    maybe_enable_compilation_cache(
        default_dir=os.path.expanduser("~/.cache/beat_this_tpu/xla-cache")
    )
    print("backend:", jax.devices()[0].platform)
    blocks = [int(b) for b in args.blocks.split(",")]
    scan_len = args.scan_len
    batch = args.batch
    t = 1500
    rng = np.random.RandomState(0)

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
            ff_mod._BLOCK_ROWS_BWD = block
            ff_mod._BLOCK_ROWS_TRAIN = block
            jax.clear_caches()

            @jax.jit
            def run(xs, attn_params=attn_params, ff_params=ff_params):
                def loss(ap, fp, x):
                    out = ff_mod.fused_freq_roformer(
                        x, ap, fp, cos, sin,
                        dropout_rate=0.1, seed=jnp.asarray([7], jnp.int32),
                    )
                    return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

                def step(_, x):
                    _, grads = jax.value_and_grad(loss, argnums=(0, 1))(
                        attn_params, ff_params, x
                    )
                    # tiny per-step result keeps the transfer off the
                    # measured path; sum touches every grad leaf
                    tot = sum(
                        jnp.sum(g) for tree in grads
                        for g in jax.tree_util.tree_leaves(tree)
                    )
                    return None, tot

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
                per_mb = best / scan_len * 1e3
                print(
                    f"C={c:4d} F={f:3d} block={block:5d}: "
                    f"{best * 1e3:8.1f} ms/scan  {per_mb:6.2f} ms/microbatch",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(
                    f"C={c:4d} F={f:3d} block={block:5d}: FAIL "
                    f"{type(e).__name__}: {str(e)[:120]}",
                    flush=True,
                )
    ff_mod._BLOCK_ROWS_BWD = 512
    ff_mod._BLOCK_ROWS_TRAIN = 512


if __name__ == "__main__":
    main()
