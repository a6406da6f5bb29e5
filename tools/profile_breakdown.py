#!/usr/bin/env python3
"""Where does inference time go? Component-level timing on the real TPU.

Times the full model and ablated variants (frontend only, transformer only,
XLA attention instead of Pallas, different batch sizes) using the
scan-over-distinct-inputs pattern from bench.py (the axon relay makes
per-dispatch latency ~0.35 s and CSE folds same-input scan bodies, so each
scan step must consume a distinct slice).

Usage: python tools/profile_breakdown.py [--batches 8,16,32,64]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, params, state, xs, *, iters=3):
    import jax

    jax.device_get(fn(params, state, xs))  # compile
    jax.device_get(fn(params, state, xs))  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, state, xs)
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", default="16,32,64")
    parser.add_argument("--scan-len", type=int, default=10)
    parser.add_argument("--chunk", type=int, default=1500)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from beat_this_tpu.model import BeatThisConfig, apply_beat_this, init_beat_this
    from beat_this_tpu.model.beat_this import _merged_bn
    from beat_this_tpu.model.layers import (
        attention_block,
        batch_norm_apply,
        conv2d_tf,
        ff_residual,
        rms_norm,
    )
    from beat_this_tpu.ops.rotary import rope_tables

    config = BeatThisConfig()
    params, state = init_beat_this(0, config)
    chunk = args.chunk
    scan_len = args.scan_len
    print(f"backend: {jax.devices()[0].platform}, chunk={chunk}, scan={scan_len}")

    def make_scan(body):
        @jax.jit
        def run(params, state, xs):
            def step(_, x):
                return None, body(params, state, x)

            _, outs = jax.lax.scan(step, None, xs)
            return outs

        return run

    def full(params, state, x):
        out, _ = apply_beat_this(params, state, x, config, compute_dtype=jnp.bfloat16)
        return out["beat"][:, 0]

    def frontend_only(params, state, x):
        # stem + 3 frontend blocks + projection (no main transformer, no head)
        b, t, f = x.shape
        h, _ = batch_norm_apply(
            _merged_bn(params["stem"]["bn1d"], state["stem"]["bn1d"]), x, axis=-1
        )
        h = h.astype(jnp.bfloat16)[..., None]
        h = conv2d_tf(params["stem"]["conv"]["w"], h, stride_freq=4, pad_time=1)
        h, _ = batch_norm_apply(
            _merged_bn(params["stem"]["bn2d"], state["stem"]["bn2d"]), h, axis=-1
        )
        h = jax.nn.gelu(h, approximate=False)
        rope_time = rope_tables(t, config.head_dim)
        for i, block in enumerate(params["blocks"]):
            dim = h.shape[-1]
            heads = dim // config.head_dim
            n_freq = h.shape[2]
            p = block["partial"]
            rope_freq = rope_tables(n_freq, config.head_dim)
            hf = h.reshape(b * t, n_freq, dim)
            hf = hf + attention_block(p["attnF"], hf, rope_freq, heads)
            hf = ff_residual(p["ffF"], hf)
            ht = hf.reshape(b, t, n_freq, dim).transpose(0, 2, 1, 3)
            ht = ht.reshape(b * n_freq, t, dim)
            ht = ht + attention_block(p["attnT"], ht, rope_time, heads)
            ht = ff_residual(p["ffT"], ht)
            h = ht.reshape(b, n_freq, t, dim).transpose(0, 2, 1, 3)
            h = conv2d_tf(block["conv"]["w"], h, stride_freq=2, pad_time=1)
            h, _ = batch_norm_apply(
                _merged_bn(block["bn"], state["blocks"][i]["bn"]), h, axis=-1
            )
            h = jax.nn.gelu(h, approximate=False)
        h = jnp.swapaxes(h, 2, 3).reshape(b, t, -1)
        h = h @ params["linear"]["w"].astype(h.dtype) + params["linear"]["b"].astype(
            h.dtype
        )
        return h[:, 0, 0]

    def frontend_freq_only(params, state, x):
        # stem + freq-attention+FF of each block + convs (no time attention)
        b, t, f = x.shape
        h, _ = batch_norm_apply(
            _merged_bn(params["stem"]["bn1d"], state["stem"]["bn1d"]), x, axis=-1
        )
        h = h.astype(jnp.bfloat16)[..., None]
        h = conv2d_tf(params["stem"]["conv"]["w"], h, stride_freq=4, pad_time=1)
        h, _ = batch_norm_apply(
            _merged_bn(params["stem"]["bn2d"], state["stem"]["bn2d"]), h, axis=-1
        )
        h = jax.nn.gelu(h, approximate=False)
        for i, block in enumerate(params["blocks"]):
            dim = h.shape[-1]
            heads = dim // config.head_dim
            n_freq = h.shape[2]
            p = block["partial"]
            rope_freq = rope_tables(n_freq, config.head_dim)
            hf = h.reshape(b * t, n_freq, dim)
            hf = hf + attention_block(p["attnF"], hf, rope_freq, heads)
            hf = ff_residual(p["ffF"], hf)
            h = hf.reshape(b, t, n_freq, dim)
            h = conv2d_tf(block["conv"]["w"], h, stride_freq=2, pad_time=1)
            h, _ = batch_norm_apply(
                _merged_bn(block["bn"], state["blocks"][i]["bn"]), h, axis=-1
            )
            h = jax.nn.gelu(h, approximate=False)
        return h[:, 0, 0, 0]

    def transformer_only(params, state, x):
        # main transformer on a (b, t, 512) input built by cheap projection
        b, t, f = x.shape
        h = x.astype(jnp.bfloat16) @ jnp.ones(
            (f, config.transformer_dim), jnp.bfloat16
        )
        rope_time = rope_tables(t, config.head_dim)
        heads = config.transformer_dim // config.head_dim
        for layer in params["transformer"]["layers"]:
            h = h + attention_block(layer["attn"], h, rope_time, heads)
            h = ff_residual(layer["ff"], h)
        h = rms_norm(h, params["transformer"]["norm_gamma"])
        return h[:, 0, 0]

    def convs_only(params, state, x):
        # stem + 3 convs + BN + GELU + projection (no transformers at all)
        b, t, f = x.shape
        h, _ = batch_norm_apply(
            _merged_bn(params["stem"]["bn1d"], state["stem"]["bn1d"]), x, axis=-1
        )
        h = h.astype(jnp.bfloat16)[..., None]
        h = conv2d_tf(params["stem"]["conv"]["w"], h, stride_freq=4, pad_time=1)
        h, _ = batch_norm_apply(
            _merged_bn(params["stem"]["bn2d"], state["stem"]["bn2d"]), h, axis=-1
        )
        h = jax.nn.gelu(h, approximate=False)
        for i, block in enumerate(params["blocks"]):
            h = conv2d_tf(block["conv"]["w"], h, stride_freq=2, pad_time=1)
            h, _ = batch_norm_apply(
                _merged_bn(block["bn"], state["blocks"][i]["bn"]), h, axis=-1
            )
            h = jax.nn.gelu(h, approximate=False)
        h = jnp.swapaxes(h, 2, 3).reshape(b, t, -1)
        h = h @ params["linear"]["w"].astype(h.dtype) + params["linear"][
            "b"
        ].astype(h.dtype)
        return h[:, 0, 0]

    def transformer_ff_only(params, state, x):
        # 6 x fused_ff at dim 512 (no attention)
        b, t, f = x.shape
        h = x.astype(jnp.bfloat16) @ jnp.ones(
            (f, config.transformer_dim), jnp.bfloat16
        )
        for layer in params["transformer"]["layers"]:
            h = ff_residual(layer["ff"], h)
        return h[:, 0, 0]

    bodies = {
        "full": full,
        "frontend": frontend_only,
        "frontend_freq_only": frontend_freq_only,
        "convs_only": convs_only,
        "transformer6": transformer_only,
        "transformer_ff_only": transformer_ff_only,
    }

    rng = np.random.RandomState(0)
    for batch in [int(b) for b in args.batches.split(",")]:
        xs = jnp.asarray(
            rng.randn(scan_len, batch, chunk, 128), jnp.float32
        )
        audio_s = scan_len * batch * (chunk - 12) / 50.0
        print(f"\n-- batch {batch} --")
        for name, body in bodies.items():
            dt = timed(make_scan(body), params, state, xs)
            per_chunk_ms = dt / (scan_len * batch) * 1e3
            print(
                f"{name:20s} {dt*1e3:8.1f} ms/scan  {per_chunk_ms:6.3f} ms/chunk"
                f"  {audio_s/dt:8.0f}x rt"
            )


if __name__ == "__main__":
    main()
