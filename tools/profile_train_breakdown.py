#!/usr/bin/env python3
"""Where does training time go? Component-level fwd+bwd timing on the TPU.

Times value_and_grad of the full model and of ablated towers (frontend only,
frequency-attention only, main transformer only, convs only) on one
microbatch (8 crops of 1500 frames, bfloat16), using the
scan-over-distinct-inputs pattern from bench.py.

Usage: python tools/profile_train_breakdown.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from beat_this_tpu.model import BeatThisConfig, apply_beat_this, init_beat_this
    from beat_this_tpu.model.beat_this import _merged_bn
    from beat_this_tpu.model.layers import (
        batch_norm_apply,
        conv2d_tf,
        ff_residual,
        freq_roformer,
        rms_norm,
        time_attention_train,
    )
    from beat_this_tpu.ops.rotary import rope_tables

    config = BeatThisConfig()
    params, state = init_beat_this(0, config)
    batch, t, scan_len = 8, 1500, 5
    print(f"backend: {jax.devices()[0].platform}, batch={batch}, t={t}")
    key = jax.random.PRNGKey(0)

    def full(params, x):
        out, _ = apply_beat_this(
            params, state, x, config, train=True, rng=key,
            compute_dtype=jnp.bfloat16,
        )
        return jnp.mean(out["beat"] ** 2) + jnp.mean(out["downbeat"] ** 2)

    def stem(params, x):
        h, _ = batch_norm_apply(
            _merged_bn(params["stem"]["bn1d"], state["stem"]["bn1d"]),
            x, axis=-1, train=True,
        )
        h = h.astype(jnp.bfloat16)[..., None]
        h = conv2d_tf(params["stem"]["conv"]["w"], h, stride_freq=4, pad_time=1)
        h, _ = batch_norm_apply(
            _merged_bn(params["stem"]["bn2d"], state["stem"]["bn2d"]),
            h, axis=-1, train=True,
        )
        return jax.nn.gelu(h, approximate=False)

    def frontend(params, x, with_time=True, with_freq=True):
        b = x.shape[0]
        h = stem(params, x)
        rope_time = rope_tables(t, config.head_dim)
        for i, block in enumerate(params["blocks"]):
            dim = h.shape[-1]
            heads = dim // config.head_dim
            n_freq = h.shape[2]
            p = block["partial"]
            rope_freq = rope_tables(n_freq, config.head_dim)
            hf = h.reshape(b * t, n_freq, dim)
            if with_freq:
                # the routed production kernel (fused_freq custom VJP on
                # TPU), so the ablation measures the REAL training path
                hf = freq_roformer(
                    p["attnF"], p["ffF"], hf, rope_freq, heads,
                    dropout_rate=0.1, rng=key,
                )
            ht = hf.reshape(b, t, n_freq, dim).transpose(0, 2, 1, 3)
            ht = ht.reshape(b * n_freq, t, dim)
            if with_time:
                ht = time_attention_train(
                    p["attnT"], ht, rope_time, heads,
                    dropout_rate=0.1, rng=key,
                )
                ht = ff_residual(p["ffT"], ht, dropout_rate=0.1, rng=key)
            h = ht.reshape(b, n_freq, t, dim).transpose(0, 2, 1, 3)
            h = conv2d_tf(block["conv"]["w"], h, stride_freq=2, pad_time=1)
            h, _ = batch_norm_apply(
                _merged_bn(block["bn"], state["blocks"][i]["bn"]),
                h, axis=-1, train=True,
            )
            h = jax.nn.gelu(h, approximate=False)
        return h

    def loss_of(body):
        def loss(params, x):
            return jnp.mean(body(params, x).astype(jnp.float32) ** 2)

        return loss

    def transformer_only(params, x):
        b = x.shape[0]
        h = x.astype(jnp.bfloat16) @ jnp.ones((128, config.transformer_dim),
                                              jnp.bfloat16)
        rope_time = rope_tables(t, config.head_dim)
        heads = config.transformer_dim // config.head_dim
        for layer in params["transformer"]["layers"]:
            h = time_attention_train(
                layer["attn"], h, rope_time, heads, dropout_rate=0.2, rng=key
            )
            h = ff_residual(layer["ff"], h, dropout_rate=0.2, rng=key)
        return rms_norm(h, params["transformer"]["norm_gamma"])

    bodies = {
        "full": full,
        "frontend(T+F)": loss_of(frontend),
        "frontend(F only)": loss_of(
            lambda p, x: frontend(p, x, with_time=False)
        ),
        "frontend(convs)": loss_of(
            lambda p, x: frontend(p, x, with_time=False, with_freq=False)
        ),
        "transformer6": loss_of(transformer_only),
    }

    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(scan_len, batch, t, 128), jnp.float32)
    for name, body in bodies.items():
        grad_fn = jax.value_and_grad(body)

        @jax.jit
        def run(params, xs):
            def step(_, x):
                val, g = grad_fn(params, x)
                # consume every gradient leaf — an unused backward pass is
                # dead-code-eliminated by XLA and the timing silently
                # becomes forward-only
                gsum = sum(
                    jnp.sum(l.astype(jnp.float32))
                    for l in jax.tree_util.tree_leaves(g)
                )
                return None, val + gsum

            _, vals = jax.lax.scan(step, None, xs)
            return vals

        try:
            jax.device_get(run(params, xs))
            jax.device_get(run(params, xs))
            t0 = time.perf_counter()
            for _ in range(3):
                out = run(params, xs)
            jax.device_get(out)
            dt = (time.perf_counter() - t0) / 3 / scan_len
            print(f"{name:18s} {dt*1e3:8.1f} ms/microbatch (fwd+bwd)", flush=True)
        except Exception as exc:
            print(f"{name:18s} FAILED {type(exc).__name__}: {str(exc)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
