#!/usr/bin/env python3
"""Isolate what the flash kernel's time goes to on the real TPU: full kernel
vs no-softmax (matmuls only) vs no-rope vs softmax-only variants, at the
frontend time-attention shape (bh=512, n=1536, d=32, bf16)."""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:
    pltpu = None

from beat_this_tpu.ops.flash_attention import LOG2E, rope_rotate


def make_kernel(mode, block_k):
    def kernel(q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref):
        q_raw = q_ref[0]
        block_q, d = q_raw.shape
        qsl = pl.ds(pl.program_id(1) * block_q, block_q)
        scale = d**-0.5
        if mode == "norope":
            q = q_raw
        else:
            q = (
                rope_rotate(
                    q_raw.astype(jnp.float32),
                    cos_ref[0, qsl, :], sin_ref[0, qsl, :],
                )
                * (scale * LOG2E)
            ).astype(q_raw.dtype)
        num_kb = k_ref.shape[1] // block_k
        m = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
        l = jnp.zeros((block_q, 1), jnp.float32)
        acc = jnp.zeros((block_q, d), jnp.float32)
        for kb in range(num_kb):
            sl = pl.ds(kb * block_k, block_k)
            if mode == "norope":
                k = k_ref[0, sl, :]
            else:
                k = rope_rotate(
                    k_ref[0, sl, :].astype(jnp.float32),
                    cos_ref[0, sl, :], sin_ref[0, sl, :],
                ).astype(k_ref.dtype)
            v = v_ref[0, sl, :]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if mode in ("full", "norope"):
                m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
                p = jnp.exp2(s - m_new)
                corr = jnp.exp2(m - m_new)
                l = l * corr + jnp.sum(p, axis=1, keepdims=True)
                acc = acc * corr + jax.lax.dot_general(
                    p.astype(v.dtype), v,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                m = m_new
            elif mode == "noexp":
                # skip exp/max: fake probabilities = raw scores (wrong math,
                # same matmul + cast structure)
                p = s
                l = l + jnp.sum(p, axis=1, keepdims=True)
                acc = acc + jax.lax.dot_general(
                    p.astype(v.dtype), v,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            elif mode == "mxu_only":
                # scores straight into PV without any elementwise pass
                acc = acc + jax.lax.dot_general(
                    s.astype(v.dtype), v,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                l = l + 1.0
        o_ref[0] = (acc / l).astype(o_ref.dtype)

    return kernel


def run_mode(mode, bh, n, d, block_q, block_k, scan_len=10, iters=3):
    kwargs = {"memory_space": pltpu.VMEM} if pltpu else {}
    cos = jnp.ones((1, n, d), jnp.float32)
    sin = jnp.zeros((1, n, d), jnp.float32)
    tab = pl.BlockSpec((1, n, d), lambda b, i: (0, 0, 0), **kwargs)

    def call(q, k, v):
        return pl.pallas_call(
            make_kernel(mode, block_k),
            grid=(bh, n // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), **kwargs),
                pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0), **kwargs),
                pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0), **kwargs),
                tab, tab,
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                                   **kwargs),
            out_shape=jax.ShapeDtypeStruct((bh, n, d), jnp.bfloat16),
        )(q, k, v, cos, sin)

    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(scan_len, 3, bh, n, d), jnp.bfloat16)

    @jax.jit
    def run(xs):
        def step(_, qkv):
            return None, call(qkv[0], qkv[1], qkv[2])[:, 0, 0]

        _, outs = jax.lax.scan(step, None, xs)
        return outs

    jax.device_get(run(xs))
    jax.device_get(run(xs))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(xs)
    jax.device_get(out)
    dt = (time.perf_counter() - t0) / iters
    flops = scan_len * bh * 4 * n * n * d
    print(f"{mode:10s} bq={block_q:5d} bk={block_k:5d}  {dt*1e3:8.2f} ms  "
          f"{flops/dt/1e12:6.1f} TF/s")


def main():
    print("backend:", jax.devices()[0].platform)
    bh, n, d = 512, 1536, 32
    for mode in ["full", "norope", "noexp", "mxu_only"]:
        run_mode(mode, bh, n, d, 1536, 768)
    # block-shape sweep: can Mosaic schedule the K=32 dots better with
    # different tile geometry?
    for bq, bk in [(1536, 1536), (1536, 512), (768, 1536), (512, 1536),
                   (512, 512), (768, 768)]:
        run_mode("mxu_only", bh, n, d, bq, bk)
    run_mode("full", bh, n, d, 1536, 1536)
    run_mode("full", bh, n, d, 512, 512)


if __name__ == "__main__":
    main()
