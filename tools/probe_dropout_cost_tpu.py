#!/usr/bin/env python3
"""How much of the fused-time TRAINING cost is dropout PRNG + masking?

Times fwd+bwd of the fused time-attention branch (ops/fused_time via
layers.time_attention_train) at dropout rate 0 vs the production rates, on
the main-transformer geometry and one frontend geometry. The delta bounds
what any cheaper mask-generation scheme could save.

Run: python tools/probe_dropout_cost_tpu.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from beat_this_tpu.model.layers import ff_residual, time_attention_train
    from beat_this_tpu.ops.rotary import rope_tables
    from beat_this_tpu.profiler import maybe_enable_compilation_cache

    maybe_enable_compilation_cache(
        default_dir=os.path.expanduser("~/.cache/beat_this_tpu/xla-cache")
    )
    n, scan_len = 1500, 5
    rope = rope_tables(n, 32)
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    print(f"backend: {jax.devices()[0].platform}")

    for label, items, c, heads in (
        ("main  C=512", 8, 512, 16),
        ("front C=32 ", 256, 32, 1),
    ):
        attn = {
            "norm_gamma": jnp.asarray(rng.randn(c) * 0.1 + 1, jnp.float32),
            "qkv_w": jnp.asarray(rng.randn(c, 3 * c) / np.sqrt(c), jnp.float32),
            "gates_w": jnp.asarray(rng.randn(c, heads) / np.sqrt(c), jnp.float32),
            "gates_b": jnp.asarray(rng.randn(heads) * 0.3, jnp.float32),
            "out_w": jnp.asarray(rng.randn(c, c) / np.sqrt(c), jnp.float32),
        }
        xs = jnp.asarray(rng.randn(scan_len, items, n, c), jnp.bfloat16)

        for rate in (0.0, 0.2):

            def loss(attn, x):
                y = time_attention_train(
                    attn, x, rope, heads, dropout_rate=rate, rng=key
                )
                return jnp.mean(y.astype(jnp.float32) ** 2)

            grad_fn = jax.value_and_grad(loss)

            @jax.jit
            def run(attn, xs):
                def step(_, x):
                    val, g = grad_fn(attn, x)
                    gsum = sum(
                        jnp.sum(l.astype(jnp.float32))
                        for l in jax.tree_util.tree_leaves(g)
                    )
                    return None, val + gsum

                return jax.lax.scan(step, None, xs)[1]

            try:
                jax.device_get(run(attn, xs))
                jax.device_get(run(attn, xs))
                t0 = time.perf_counter()
                for _ in range(3):
                    out = run(attn, xs)
                jax.device_get(out)
                dt = (time.perf_counter() - t0) / 3 / scan_len
                print(f"{label} rate={rate}: {dt*1e3:7.2f} ms/batch fwd+bwd",
                      flush=True)
            except Exception as exc:  # noqa: BLE001
                print(f"{label} rate={rate}: FAIL {type(exc).__name__}: "
                      f"{str(exc)[:120]}", flush=True)


if __name__ == "__main__":
    main()
