#!/usr/bin/env python3
"""Ablate the fused-freq kernel's stages on the real TPU to find where the
~0.5 ms/chunk per frontend block goes: attention loop, FF dots, rmsnorm/VPU,
or plain memory streaming.

Variants (all same grid/blocking as the real kernel):
  copy     x -> out                              (pure stream)
  rms      rmsnorm only
  qkv      rms + qkv projection dot
  attn     rms + qkv + packed attention (+ gates, out proj)
  ff       rms + FF only (no attention)
  full     the real kernel
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scan-len", type=int, default=8)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--block", type=int, default=None,
                        help="override _BLOCK_ROWS")
    parser.add_argument("--stages", default="copy,rms,qkv,ff,attn,full")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from beat_this_tpu.ops import fused_freq as m
    from beat_this_tpu.ops.rotary import rope_tables
    from beat_this_tpu.ops.small_attention import _same_item_mask

    print("backend:", jax.devices()[0].platform)
    scan_len, batch, t = args.scan_len, args.batch, 1500
    rng = np.random.RandomState(0)

    def make_kernel(stage, f, heads, rate=0.0):
        def kernel(seed_ref, x_ref, ga_ref, wqkv_ref, wg_ref, bg_ref,
                   wout_ref, gf_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   cos_ref, sin_ref, o_ref):
            x = x_ref[...]
            rows, c = x.shape
            dtype = x.dtype
            if stage == "copy":
                o_ref[...] = x
                return
            g = m._rms(x.astype(jnp.float32), ga_ref[...]).astype(dtype)
            if stage == "rms":
                o_ref[...] = g
                return
            qkv = m._qkv_of(g, wqkv_ref)
            if stage == "qkv":
                o_ref[...] = qkv[:, :c]
                return
            if stage in ("attn", "full"):
                same = _same_item_mask(f)
                o = m._attention(
                    qkv, c, heads, f, cos_ref[...], sin_ref[...], same,
                    seed_ref, rate, dtype,
                )
                sig32 = m._gates_sig(g, wg_ref, bg_ref)
                attn = jax.lax.dot_general(
                    o * m._gate_full(sig32, rows, c, heads, dtype),
                    wout_ref[...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                x2_32 = x.astype(jnp.float32) + attn
            else:  # "ff": skip attention entirely
                x2_32 = x.astype(jnp.float32)
            if stage == "attn":
                o_ref[...] = x2_32.astype(dtype)
                return
            g2 = m._rms(x2_32, gf_ref[...])
            h1 = jax.lax.dot_general(
                g2.astype(dtype), w1_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b1_ref[...]
            h1 = m._gelu_exact(h1)
            y = jax.lax.dot_general(
                h1.astype(dtype), w2_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b2_ref[...]
            o_ref[...] = (x2_32 + y).astype(o_ref.dtype)

        return kernel

    from beat_this_tpu.ops.flash_attention import _seed_spec, _specs

    for c, f in [(32, 32), (64, 16), (128, 8)]:
        heads = c // 32
        items = batch * t
        rows = items * f
        block = args.block or m._BLOCK_ROWS
        padded = -(-rows // block) * block
        cos, sin = rope_tables(f, 32)
        cosf, sinf = m._rope_full_tables(cos, sin, f)
        wd = jnp.bfloat16
        ga = jnp.asarray(rng.randn(1, c), jnp.float32)
        wqkv = jnp.asarray(rng.randn(c, 3 * c) * 0.05, wd)
        wg = jnp.asarray(
            np.pad(rng.randn(c, heads) * 0.05, ((0, 0), (0, 128 - heads))), wd
        )
        bg = jnp.asarray(np.pad(rng.randn(1, heads), ((0, 0), (0, 128 - heads))), jnp.float32)
        wout = jnp.asarray(rng.randn(c, c) * 0.05, wd)
        gf = jnp.asarray(rng.randn(1, c), jnp.float32)
        w1 = jnp.asarray(rng.randn(c, 4 * c) * 0.05, wd)
        b1 = jnp.asarray(rng.randn(1, 4 * c), jnp.float32)
        w2 = jnp.asarray(rng.randn(4 * c, c) * 0.05, wd)
        b2 = jnp.asarray(rng.randn(1, c), jnp.float32)
        seed = jnp.zeros((1,), jnp.int32)
        xs = jnp.asarray(rng.randn(scan_len, padded, c) * 0.5, jnp.bfloat16)

        kwargs = _specs(False)
        row_spec = pl.BlockSpec((block, c), lambda i: (i, 0), **kwargs)

        def const_spec(shape):
            return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), **kwargs)

        for stage in args.stages.split(","):
            call = pl.pallas_call(
                make_kernel(stage, f, heads),
                grid=(padded // block,),
                in_specs=[
                    _seed_spec(False), row_spec, const_spec((1, c)),
                    const_spec((c, 3 * c)), const_spec((c, 128)),
                    const_spec((1, 128)), const_spec((c, c)),
                    const_spec((1, c)), const_spec((c, 4 * c)),
                    const_spec((1, 4 * c)), const_spec((4 * c, c)),
                    const_spec((1, c)), const_spec((128, 32)),
                    const_spec((128, 32)),
                ],
                out_specs=row_spec,
                out_shape=jax.ShapeDtypeStruct((padded, c), jnp.bfloat16),
            )

            @jax.jit
            def run(xs, call=call):
                def step(_, x2):
                    out = call(seed, x2, ga, wqkv, wg, bg, wout, gf, w1, b1,
                               w2, b2, cosf, sinf)
                    return None, out[0, :2].astype(jnp.float32)

                _, outs = jax.lax.scan(step, None, xs)
                return outs

            try:
                jax.device_get(run(xs))
                jax.device_get(run(xs))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    out = run(xs)
                    jax.device_get(out)
                    best = min(best, time.perf_counter() - t0)
                per_chunk = best / (scan_len * batch) * 1e3
                print(f"C={c:4d} {stage:5s}: {best * 1e3:8.1f} ms/scan  "
                      f"{per_chunk:6.3f} ms/chunk")
            except Exception as e:  # noqa: BLE001
                print(f"C={c:4d} {stage:5s}: FAIL {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
