#!/usr/bin/env python3
"""Measure the VPU softmax passes inside the fused time-attention kernels.

VERDICT r4 #1: the ~1.0 s training step and the 18.5%-MFU eval are claimed
to sit on a "structural floor" of VPU softmax work (row max + exp2 + row
sum over (n, n) float32 score tiles). This bench converts that claim into
numbers two ways:

1. **In-situ pass costs**: a bench kernel mirroring ops/fused_time.py's
   per-head loop (score dot -> mask -> max -> exp2 -> [sum] -> pv dot) at
   the model's real geometries, with ablation variants that drop one pass
   at a time. Variant deltas = the marginal cost of each softmax pass in
   the real VMEM/pipelining context.

2. **Standalone pass kernels**: minimal Pallas kernels running JUST exp2 /
   just a row max / just a row sum over the same number of (n, n) float32
   elements. NOTE (measured): these stream their inputs from HBM, so they
   bound the passes' cost-if-unfused, not a VPU ceiling — and they come
   out ~300x slower per element than the fused in-situ passes, which is
   itself the finding (see the floor-analysis comment at the bottom).

Variants (eval-shaped, per head):
  full      score dot + mask + row max + exp2 + pv-with-ones-column dot
  nomax     exp2(s) without subtracting the row max  (delta = max cost)
  noexp     p = s - m, no transcendental             (delta = exp2 cost)
  nosmax    p = s cast only                          (delta = whole softmax)
  b16exp    max over f32 s, exp2 computed in bfloat16 (half VPU traffic?)
  kfold     mask folded into the contraction (ones col on q, mask col on
            k, K=33) — the fused_time r5 recipe; delta vs full = the
            (n, n) mask-add pass
  b16s      score dot emits BFLOAT16 tiles (f32 MXU accumulation, rounded
            once): halves every score-sized VMEM byte (write + max read +
            exp2 read). The r5 candidate if VMEM traffic, not the VPU,
            is what actually bounds these kernels.
  b16sfold  b16s + kfold combined (the full r5 eval recipe candidate)

Train-shaped extras (separate row sum, as _attn_fwd_head needs l pre-drop):
  tfull     full + f32 row-sum on the VPU (the current training recipe)
  tmxusum   full + row sum as an (n, n) x (n, 128) ones matvec on the MXU
  tb16sum   full + row sum over the bf16 p with f32 accumulation

Run on the real TPU: python tools/bench_softmax_variants.py [--scan 8]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", type=int, default=16)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from beat_this_tpu.ops.flash_attention import vmem_params

    print(f"backend: {jax.devices()[0].platform}")

    n_pad = 1536

    # ---------------- attention-shaped variant kernels -----------------
    def attn_kernel(q_ref, k_ref, v_ref, mask_ref, maskcol_ref, o_ref, *,
                    gh, variant):
        q = q_ref[0]  # (n_pad, gh*32) bf16, pre-scaled
        k = k_ref[0]
        v = v_ref[0]
        ones_col = jnp.ones((n_pad, 1), jnp.bfloat16)
        folded = variant in ("kfold", "b16s", "b16sfold")
        outs = []
        for j in range(gh):
            hsl = slice(j * 32, (j + 1) * 32)
            q_h, k_h = q[:, hsl], k[:, hsl]
            if folded:  # mask rides the contraction (K=33)
                q_h = jnp.concatenate([q_h, ones_col], axis=1)
                k_h = jnp.concatenate(
                    [k_h, maskcol_ref[...].astype(jnp.bfloat16)], axis=1
                )
            sdtype = (
                jnp.bfloat16 if variant in ("b16s", "b16sfold")
                else jnp.float32
            )
            s = jax.lax.dot_general(
                q_h, k_h,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=sdtype,
            )
            if not folded:
                s = s + mask_ref[...]
            if variant in ("b16s", "b16sfold"):
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp2(
                    s.astype(jnp.float32) - m.astype(jnp.float32)
                ).astype(jnp.bfloat16)
            elif variant == "kfold":
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp2(s - m).astype(jnp.bfloat16)
            elif variant == "nosmax":
                p = s.astype(jnp.bfloat16)
            elif variant == "nomax":
                p = jnp.exp2(s).astype(jnp.bfloat16)
            elif variant == "noexp":
                m = jnp.max(s, axis=1, keepdims=True)
                p = (s - m).astype(jnp.bfloat16)
            elif variant == "b16exp":
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp2((s - m).astype(jnp.bfloat16))
            else:  # full and the t* train variants
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp2(s - m)
                if variant == "tfull":
                    l = jnp.sum(p, axis=1, keepdims=True)
                elif variant == "tb16sum":
                    l = jnp.sum(
                        p.astype(jnp.bfloat16), axis=1, keepdims=True,
                        dtype=jnp.float32,
                    )
                p = p.astype(jnp.bfloat16)
                if variant == "tmxusum":
                    lcol = jax.lax.dot_general(
                        p, ones_col,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    l = lcol[:, :1]
            o_full = jax.lax.dot_general(
                p, jnp.concatenate([v[:, hsl], ones_col], axis=1),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o = o_full[:, :32]
            if variant in ("tfull", "tmxusum", "tb16sum"):
                o = o / l  # the separate pre-dropout row sum
            else:
                o = o / o_full[:, 32:]
            outs.append(o.astype(jnp.bfloat16))
        o_ref[0] = outs[0] if gh == 1 else jnp.concatenate(outs, axis=1)

    def build_attn(items, gh, variant):
        ghd = gh * 32
        kw = {"memory_space": pltpu.VMEM}
        f = pl.pallas_call(
            functools.partial(attn_kernel, gh=gh, variant=variant),
            grid=(items,),
            in_specs=[
                pl.BlockSpec((1, n_pad, ghd), lambda i: (i, 0, 0), **kw),
                pl.BlockSpec((1, n_pad, ghd), lambda i: (i, 0, 0), **kw),
                pl.BlockSpec((1, n_pad, ghd), lambda i: (i, 0, 0), **kw),
                pl.BlockSpec((1, n_pad), lambda i: (0, 0), **kw),
                pl.BlockSpec((n_pad, 1), lambda i: (0, 0), **kw),
            ],
            out_specs=pl.BlockSpec((1, n_pad, ghd), lambda i: (i, 0, 0), **kw),
            out_shape=jax.ShapeDtypeStruct((items, n_pad, ghd), jnp.bfloat16),
            **vmem_params(100, False),
        )
        return f

    # ---------------- standalone VPU pass kernels -----------------------
    # grid over row blocks of a (rows, n_pad) f32 array; each program does
    # ONE pass of the op over its VMEM-resident block
    RB = 512

    def build_vpu(rows, op, out_cols):
        kw = {"memory_space": pltpu.VMEM}

        def kern(x_ref, o_ref):
            x = x_ref[...]
            if op == "exp2":
                o_ref[...] = jnp.exp2(x)[:, :out_cols]
            elif op == "rowmax":
                o_ref[...] = jnp.max(x, axis=1, keepdims=True)[:, :1] * jnp.ones(
                    (RB, out_cols), jnp.float32
                )
            elif op == "rowsum":
                o_ref[...] = jnp.sum(x, axis=1, keepdims=True)[:, :1] * jnp.ones(
                    (RB, out_cols), jnp.float32
                )

        return pl.pallas_call(
            kern,
            grid=(rows // RB,),
            in_specs=[pl.BlockSpec((RB, n_pad), lambda i: (i, 0), **kw)],
            out_specs=pl.BlockSpec((RB, out_cols), lambda i: (i, 0), **kw),
            out_shape=jax.ShapeDtypeStruct((rows, out_cols), jnp.float32),
            **vmem_params(100, False),
        )

    def timed(jitted, xs_list):
        out = jitted(*xs_list)
        jax.device_get(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            jax.device_get(jitted(*xs_list))
        return (time.perf_counter() - t0) / args.reps / args.scan * 1000

    rng = np.random.RandomState(0)

    # real geometries: main transformer (C=512: 8 items x 4 groups of 4
    # heads == 32 gh=4 programs per layer-batch) and frontend C=32
    geoms = [
        ("main-layer (32 prog x 4 heads)", 32, 4),
        ("front C=32 (512 prog x 1 head)", 512, 1),
    ]
    results = {}
    for name, items, gh in geoms:
        ghd = gh * 32
        q = jnp.asarray(rng.randn(args.scan, items, n_pad, ghd) * 0.3,
                        jnp.bfloat16)
        k = jnp.asarray(rng.randn(args.scan, items, n_pad, ghd) * 0.3,
                        jnp.bfloat16)
        v = jnp.asarray(rng.randn(args.scan, items, n_pad, ghd) * 0.3,
                        jnp.bfloat16)
        mask = jnp.zeros((1, n_pad), jnp.float32).at[:, 1500:].set(-1e5)
        maskcol = jnp.zeros((n_pad, 1), jnp.float32).at[1500:, :].set(-98304.0)
        variants = ["nosmax", "nomax", "noexp", "b16exp", "full",
                    "kfold", "b16s", "b16sfold",
                    "tfull", "tmxusum", "tb16sum"]
        print(f"\n=== {name}: {items} programs, {gh} heads each ===")
        for var in variants:
            f = build_attn(items, gh, var)
            jitted = jax.jit(lambda q, k, v: jax.lax.scan(
                lambda _, xs: (0, jnp.sum(f(xs[0], xs[1], xs[2], mask, maskcol),
                                          dtype=jnp.float32)),
                0, (q, k, v))[1])
            try:
                ms = timed(jitted, [q, k, v])
                results[(name, var)] = ms
                print(f"  {var:8s}: {ms:8.3f} ms")
            except Exception as e:  # noqa: BLE001
                print(f"  {var:8s}: FAIL {type(e).__name__}: {str(e)[:100]}")

        nel = items * gh * n_pad * n_pad / 1e6
        base = results.get((name, "nosmax"))
        full = results.get((name, "full"))
        if base and full:
            print(f"  softmax in-situ: {full - base:.3f} ms "
                  f"({nel:.0f}M score els -> "
                  f"{nel / max(full - base, 1e-9):.0f} Mel/ms)")

    # standalone VPU ceilings over the SAME element count as one main-layer
    # batch (32 programs x 4 heads x 1536^2 = 302M elements)
    # (rows, n_pad) sized to fit HBM across the scan copies: 24 * n_pad
    # rows x 4 scan steps x 4 B = 906 MB; throughput extrapolates linearly
    sascan = 4
    rows = 24 * n_pad
    x = jnp.asarray(rng.rand(sascan, rows, n_pad) * 2 - 1, jnp.float32)
    print(f"\n=== standalone VPU passes over ({rows}, {n_pad}) f32 ===")
    standalone = {}
    sa_nel = rows * n_pad / 1e6  # Melements per scan step
    for op in ["exp2", "rowmax", "rowsum"]:
        f = build_vpu(rows, op, 128)
        jitted = jax.jit(lambda x: jax.lax.scan(
            lambda _, xx: (0, jnp.sum(f(xx), dtype=jnp.float32)), 0, x)[1])
        try:
            # timed() divides by args.scan; rescale to this leg's scan count
            ms = timed(jitted, [x]) * args.scan / sascan
            standalone[op] = sa_nel / ms  # Mel/ms throughput
            print(f"  {op:7s}: {ms:8.3f} ms ({sa_nel / ms:.0f} Mel/ms)")
        except Exception as e:  # noqa: BLE001
            print(f"  {op:7s}: FAIL {type(e).__name__}: {str(e)[:100]}")

    # Floor analysis. Two findings replace round 4's "irreducible VPU
    # softmax" narrative (measured on the v5e, 2026-08, see DESIGN.md):
    #
    # 1. The whole softmax is a few PERCENT of kernel time: ablating max +
    #    exp2 entirely (nosmax) recovers ~4% at main-layer geometry and ~5%
    #    at frontend geometry. Per-pass deltas (full-nomax etc.) sit at or
    #    below run-to-run noise — some come out negative — so only the
    #    whole-softmax share is quoted.
    # 2. The standalone legs above stream their score-sized arrays from
    #    HBM and run ~300x SLOWER per element than the same passes fused
    #    in-kernel on VMEM-resident tiles. That inversion is the point:
    #    the in-situ passes ride the MXU dots' pipeline bubbles for nearly
    #    free, so the kernels are bound by the dots (head_dim 32 fills 1/4
    #    of the MXU's contraction depth) plus score-tile VMEM traffic —
    #    not by VPU arithmetic. (The b16s/b16sfold variants that would
    #    halve score-tile bytes fail Mosaic's verifier; compiler-blocked.)
    print("\n=== floor analysis ===")
    for name, items, gh in geoms:
        base = results.get((name, "nosmax"))
        full = results.get((name, "full"))
        tfull = results.get((name, "tfull"))
        if base and full:
            print(f"  {name}: whole softmax = {full - base:.3f} ms of "
                  f"{full:.3f} ms ({100 * (full - base) / full:.1f}% of the "
                  f"eval kernel)")
        if base and tfull:
            print(f"  {name}: softmax+sum    = {tfull - base:.3f} ms of "
                  f"{tfull:.3f} ms ({100 * (tfull - base) / tfull:.1f}% of "
                  f"the train kernel)")
    if standalone:
        insitu = {}
        for name, items, gh in geoms:
            base, full = results.get((name, "nosmax")), results.get((name, "full"))
            if base and full and full > base:
                insitu[name] = (items * gh * n_pad * n_pad / 1e6) / (full - base)
        for name, tput in insitu.items():
            ratio = tput / max(standalone.get("exp2", 1e-9), 1e-9)
            print(f"  in-situ passes at {name}: {tput:.0f} Mel/ms = "
                  f"{ratio:.0f}x the HBM-streaming standalone kernel -> "
                  f"VPU arithmetic is not the binding constraint")


if __name__ == "__main__":
    main()
