#!/usr/bin/env python3
"""Quick Mosaic compile + parity probe for ops/fused_time.py on the real
TPU, at the exact geometry that matters in production: the main
transformer's heads=16 / C=512 multi-group case (groups=4), which CPU
interpret mode cannot validate (no tiling rules) and which round 3's first
fused_time revision failed with a sublane-tiling error on the gate-bias
block. Run: python tools/probe_fused_time_tpu.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from beat_this_tpu.profiler import maybe_enable_compilation_cache

    maybe_enable_compilation_cache(
        default_dir=os.path.expanduser("~/.cache/beat_this_tpu/xla-cache")
    )

    from beat_this_tpu.model.layers import attention_block, feed_forward
    from beat_this_tpu.ops.fused_time import fused_time_roformer
    from beat_this_tpu.ops.rotary import rope_tables

    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.RandomState(0)
    heads, n, items = 16, 1500, 2
    c = heads * 32
    m = 4 * c
    attn = {
        "norm_gamma": jnp.asarray(rng.randn(c) * 0.1 + 1, jnp.float32),
        "qkv_w": jnp.asarray(rng.randn(c, 3 * c) / np.sqrt(c), jnp.float32),
        "gates_w": jnp.asarray(rng.randn(c, heads) / np.sqrt(c), jnp.float32),
        "gates_b": jnp.asarray(rng.randn(heads) * 0.3, jnp.float32),
        "out_w": jnp.asarray(rng.randn(c, c) / np.sqrt(c), jnp.float32),
    }
    ff = {
        "norm_gamma": jnp.asarray(rng.randn(c) * 0.1 + 1, jnp.float32),
        "w1": jnp.asarray(rng.randn(c, m) / np.sqrt(c), jnp.float32),
        "b1": jnp.asarray(rng.randn(m) * 0.1, jnp.float32),
        "w2": jnp.asarray(rng.randn(m, c) / np.sqrt(m), jnp.float32),
        "b2": jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
    }
    x = jnp.asarray(rng.randn(items, n, c), jnp.bfloat16)
    rope = rope_tables(n, 32)

    @jax.jit
    def composable(x):
        y = x + attention_block(attn, x, rope, heads)
        return y + feed_forward(ff, y)

    t0 = time.time()
    got = jax.device_get(
        fused_time_roformer(x, attn, ff, rope[0], rope[1], heads)
    ).astype(np.float32)
    print(f"fused compile+run: {time.time() - t0:.1f}s", flush=True)
    want = np.asarray(jax.device_get(composable(x))).astype(np.float32)
    scale = float(np.max(np.abs(want)))
    dev = float(np.max(np.abs(got - want))) / scale
    print(f"rel_dev={dev:.6f} scale={scale:.3f}")
    ok = dev < 0.02
    print("OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
