#!/usr/bin/env python3
"""Standalone Mosaic compile probe for the fused_time TRAINING kernels on
the real TPU, at every geometry the model routes to them (frontend
heads=1/2/4 and, since the round-4 (items, head_groups) re-grid, the main
transformer's heads=16), forward and grad. Round 3's all-heads-per-program
version failed remote compile at heads=16 (scoped-VMEM OOM, 126.86 MB vs
the v5e's 110 MB ceiling); this probe is the cheap (~20-60 s/kernel)
standalone gate to run after any kernel change BEFORE paying a ~25 min
cold full-model compile. Run: python tools/probe_fused_time_train_tpu.py
"""

import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(heads, n=1500, items=2, grad=True, rate=0.1):
    import jax
    import jax.numpy as jnp

    from beat_this_tpu.ops.fused_time import fused_time_attention_train
    from beat_this_tpu.ops.rotary import rope_tables

    rng = np.random.RandomState(0)
    c = heads * 32
    attn = {
        "norm_gamma": jnp.asarray(rng.randn(c) * 0.1 + 1, jnp.float32),
        "qkv_w": jnp.asarray(rng.randn(c, 3 * c) / np.sqrt(c), jnp.float32),
        "gates_w": jnp.asarray(rng.randn(c, heads) / np.sqrt(c), jnp.float32),
        "gates_b": jnp.asarray(rng.randn(heads) * 0.3, jnp.float32),
        "out_w": jnp.asarray(rng.randn(c, c) / np.sqrt(c), jnp.float32),
    }
    x = jnp.asarray(rng.randn(items, n, c), jnp.bfloat16)
    rope = rope_tables(n, 32)

    def branch(x, attn):
        return fused_time_attention_train(
            x, attn, rope[0], rope[1], heads, dropout_rate=rate, seed=7
        )

    if grad:
        def loss(x, attn):
            return jnp.sum(branch(x, attn).astype(jnp.float32) ** 2)

        fn = jax.jit(jax.grad(loss, argnums=(0, 1)))
    else:
        fn = jax.jit(branch)
    t0 = time.time()
    out = jax.device_get(fn(x, attn))
    dt = time.time() - t0
    flat = jax.tree_util.tree_leaves(out)
    finite = all(np.all(np.isfinite(np.asarray(a, np.float32))) for a in flat)
    return dt, finite


def main():
    import jax

    from beat_this_tpu.profiler import maybe_enable_compilation_cache

    maybe_enable_compilation_cache(
        default_dir=os.path.expanduser("~/.cache/beat_this_tpu/xla-cache")
    )
    print("platform:", jax.devices()[0].platform, flush=True)
    for heads in (1, 2, 4, 16):
        for grad in (False, True):
            tag = f"heads={heads} grad={grad}"
            try:
                dt, finite = probe(heads, grad=grad)
                print(f"{tag}: ok compile+run {dt:.1f}s finite={finite}",
                      flush=True)
            except Exception as exc:
                msg = f"{type(exc).__name__}: {exc}"
                print(f"{tag}: FAIL {msg[:2000]}", flush=True)
                traceback.print_exc(limit=3)
    return 0


if __name__ == "__main__":
    sys.exit(main())
