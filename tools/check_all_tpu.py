#!/usr/bin/env python3
"""The TPU kernel gate: every Mosaic-only parity check in one run, with a
pass/fail JSON artifact.

The CPU test suite runs the Pallas kernels in interpret mode, but the
`pltpu.prng_*` in-kernel dropout paths and the fwd/bwd mask-geometry
contract (ops/flash_attention.py `_train_block_cap`, ops/fused_freq.py
`_dropmask`) have no interpret rule — a regression there ships silently with
green CI. This tool runs on the real TPU and records an artifact
(TPUCHECK_r*.json) per round:

  1. eval-kernel logit parity vs pure XLA (full-size model), plus the same
     comparison at the postprocessed-BEAT level (the unit of the 0.001-F
     north star): both paths' logits through the full minimal
     postprocessing, F-measure between the two beat sets >= 0.999
  2. train-mode gradient parity vs pure XLA at dropout 0
  3. train-mode gradients finite at default dropout rates
  4. in-kernel dropout statistics (drop fraction and 1/keep scaling)
  5. directional finite-difference gradient checks WITH dropout active for
     flash attention, packed small attention, and the fused frequency
     roformer — the same seed regenerates the same mask in the primal,
     VJP-forward, and backward passes, so central differences agree with the
     analytic directional derivative only if the mask geometry is identical
     in all three.

Run: python tools/check_all_tpu.py --out TPUCHECK.json
"""

import argparse
import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check_eval_logit_parity():
    import jax
    import jax.numpy as jnp

    from beat_this_tpu.model import BeatThisConfig, init_beat_this, apply_beat_this
    from beat_this_tpu.model import layers

    config = BeatThisConfig()  # full size
    params, state = init_beat_this(0, config)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1500, 128), jnp.float32)

    def logits(use_kernels):
        layers._flash_enabled.cache_clear()
        os.environ.pop("BEAT_THIS_NO_FLASH", None)
        if not use_kernels:
            os.environ["BEAT_THIS_NO_FLASH"] = "1"
        out, _ = jax.jit(
            lambda p, s, x: apply_beat_this(p, s, x, config,
                                            compute_dtype=jnp.bfloat16)
        )(params, state, x)
        res = jax.device_get((out["beat"], out["downbeat"]))
        layers._flash_enabled.cache_clear()
        os.environ.pop("BEAT_THIS_NO_FLASH", None)
        return np.asarray(res[0]), np.asarray(res[1])

    (ab, ad), (bb, bd) = logits(True), logits(False)
    rel_beat = float(np.abs(ab - bb).max() / np.abs(bb).max())
    rel_down = float(np.abs(ad - bd).max() / np.abs(bd).max())
    rel = max(rel_beat, rel_down)
    # bound tightened 3e-2 -> 2.5e-2 (VERDICT r4 #8; measured 1.9e-2 r4)
    assert rel < 2.5e-2, f"eval logit deviation {rel:.3e}"
    return {"rel_dev": rel, "rel_dev_beat": rel_beat,
            "rel_dev_downbeat": rel_down}


def _gate_suite():
    """16 synthetic pieces spanning the DBN's 55-215 bpm range with varied
    burst strength, background noise, adjacent double peaks and jitter
    (VERDICT r4 #3). Returns (spect (16, 1500, 128) float32, specs)."""
    # (period_frames, burst, noise, style); 14 frames = 214 bpm, 54 = 56
    specs = [
        (14, 6.0, 1.0, "plain"), (17, 6.0, 1.0, "plain"),
        (20, 6.0, 1.0, "plain"), (25, 6.0, 1.0, "plain"),
        (30, 6.0, 1.0, "plain"), (36, 6.0, 1.0, "plain"),
        (44, 6.0, 1.0, "plain"), (54, 6.0, 1.0, "plain"),
        (25, 4.0, 1.0, "weak"), (25, 6.0, 1.5, "noisy"),
        (20, 5.0, 1.2, "weak-noisy"), (25, 6.0, 1.0, "double"),
        (30, 6.0, 1.0, "double"), (25, 6.0, 1.0, "jitter"),
        (44, 4.5, 1.3, "sparse-weak"), (14, 6.0, 1.2, "dense-noisy"),
    ]
    rng = np.random.RandomState(3)
    t = 1500
    spect = np.empty((len(specs), t, 128), np.float32)
    for i, (period, burst, noise, style) in enumerate(specs):
        spect[i] = rng.randn(t, 128) * noise
        frames = np.arange(3 + (i * 5) % period, t, period)
        if style == "jitter":
            frames = np.clip(frames + rng.randint(-1, 2, len(frames)), 0, t - 1)
        spect[i, frames, :] += burst
        # every 4th burst carries the fixture's bass-band downbeat
        # signature (see _flagship_trained) so the downbeat head has real
        # evidence and the DBN's bar-phase decision is decisive — without
        # it the phase is a knife-edge tie that bf16 deviations flip
        # (seen live: beat F 1.0 on all 16 pieces, downbeat F 0.0 at 56
        # bpm from a pure phase rotation)
        spect[i, frames[::4], :32] += burst * 0.7
        if style == "double":  # adjacent peak pairs stress deduplication
            spect[i, np.minimum(frames + 1, t - 1), :] += burst * 0.9
    return spect, specs


def _gate_logits(config, params, state, x, use_kernels, dtype):
    """Full-model logits in (2, 1500, 128) slices so the bf16 paths reuse
    the executable the rest of the gate already compiled."""
    import jax
    import jax.numpy as jnp

    from beat_this_tpu.model import apply_beat_this, layers

    layers._flash_enabled.cache_clear()
    os.environ.pop("BEAT_THIS_NO_FLASH", None)
    if not use_kernels:
        os.environ["BEAT_THIS_NO_FLASH"] = "1"
    try:
        fn = jax.jit(
            lambda p, s, x: apply_beat_this(p, s, x, config,
                                            compute_dtype=dtype)
        )
        beats, downs = [], []
        for i in range(0, len(x), 2):
            out, _ = fn(params, state, jnp.asarray(x[i : i + 2]))
            res = jax.device_get((out["beat"], out["downbeat"]))
            beats.append(np.asarray(res[0], np.float32))
            downs.append(np.asarray(res[1], np.float32))
    finally:
        layers._flash_enabled.cache_clear()
        os.environ.pop("BEAT_THIS_NO_FLASH", None)
    return np.concatenate(beats), np.concatenate(downs)


def _gate_boundary(ref_logits, lo, hi):
    """Decision boundary for one piece/channel: the midpoint of the widest
    gap among the REFERENCE path's sorted logits, restricted to boundaries
    that keep between `lo` and `hi` frames above. A trained fixture
    separates peak mass from background by a wide margin, so the boundary
    lands in that empty gap — where a threshold flip requires a real path
    deviation, exactly as at a converged checkpoint's natural 0 threshold.
    The rank window is what makes this robust on pieces far from the
    fixture's training tempo, whose smooth logit tails would otherwise put
    the widest gap ABOVE the peak mass (a single outlier frame over the
    threshold — seen live at 214 bpm). Computed from the reference path
    only so the compared path cannot influence the shared boundary."""
    v = np.sort(np.asarray(ref_logits, np.float64).ravel())
    lo = max(2, int(lo))
    hi = min(len(v) - 1, max(int(hi), lo + 1))
    # k frames sit above a boundary placed between v[-(k+1)] and v[-k]
    tail = v[len(v) - hi - 1 : len(v) - lo + 1]
    gaps = np.diff(tail)
    j = int(np.argmax(gaps))
    return -0.5 * (tail[j] + tail[j + 1])


def check_beat_level_kernel_parity():
    """Kernel-vs-XLA parity measured in the unit the north star is
    denominated in: postprocessed beat TIMES. The logit-level bound
    (check_eval_logit_parity) cannot say whether bf16 kernel deviations
    flip peaks near the decision threshold, so this runs full-size-model
    logits through the entire postprocessing on both paths and scores the
    kernel path's beats against the XLA path's with the same F-measure the
    evaluation protocol uses (BASELINE.md's 0.001 target). Three legs
    (VERDICT r4 #3):

      minimal  16-piece suite (55-215 bpm, weak/noisy/double/jittered
               peaks) through the minimal postprocessor, worst F
      dbn      the same logits through the DbnDecoder (sigmoid
               activations, batched Viterbi), worst F
      bf16/f32 the KERNEL path at bfloat16 vs float32 compute on the same
               pieces — the beat-level sensitivity of precision itself,
               the predictor of real-checkpoint deviation

    The model is _flagship_trained() (30 real optimizer steps), so logits
    have the peaky structure of a trained checkpoint; after 30 steps the
    peaks sit below a converged model's 0 threshold, so each piece/channel
    is shifted by a boundary derived from the XLA path's own peak/
    background gap (see _gate_boundary)."""
    import jax.numpy as jnp

    from beat_this_tpu.metrics import f_measure
    from beat_this_tpu.postprocessing import Postprocessor

    config, params, state, _ = _flagship_trained()
    spect, specs = _gate_suite()

    beat_k, down_k = _gate_logits(config, params, state, spect, True,
                                  jnp.bfloat16)
    beat_x, down_x = _gate_logits(config, params, state, spect, False,
                                  jnp.bfloat16)
    beat_f32, down_f32 = _gate_logits(config, params, state, spect, True,
                                      jnp.float32)

    post_min = Postprocessor("minimal", fps=50)
    post_dbn = Postprocessor("dbn", fps=50)
    out = {"n_pieces": len(specs)}
    worst_min, worst_dbn, worst_prec = 1.0, 1.0, 1.0

    # per-piece shared boundaries from the XLA path (minimal + dbn legs)
    # and from the f32 kernel path (precision leg)
    for i, (period, burst, noise, style) in enumerate(specs):
        n_expect = 1500 // period
        sb = _gate_boundary(beat_x[i], n_expect // 2, n_expect * 3)
        sd = _gate_boundary(down_x[i], 2, n_expect * 3)
        bk, dk = post_min(beat_k[i] + sb, down_k[i] + sd)
        bx, dx = post_min(beat_x[i] + sb, down_x[i] + sd)
        assert len(bx) >= min(10, n_expect // 4), (
            f"degenerate fixture piece {i} ({style}): {len(bx)} XLA peaks"
        )
        f_beat = f_measure(np.asarray(bx), np.asarray(bk))
        f_down = f_measure(np.asarray(dx), np.asarray(dk)) if len(dx) else 1.0
        worst_min = min(worst_min, f_beat, f_down)
        out[f"piece{i:02d}_f_min"] = round(min(f_beat, f_down), 4)

        # precision leg: kernel bf16 vs kernel f32, f32-derived boundary
        sb32 = _gate_boundary(beat_f32[i], n_expect // 2, n_expect * 3)
        sd32 = _gate_boundary(down_f32[i], 2, n_expect * 3)
        b16, d16 = post_min(beat_k[i] + sb32, down_k[i] + sd32)
        b32, d32 = post_min(beat_f32[i] + sb32, down_f32[i] + sd32)
        fp_beat = f_measure(np.asarray(b32), np.asarray(b16))
        fp_down = (f_measure(np.asarray(d32), np.asarray(d16))
                   if len(d32) else 1.0)
        worst_prec = min(worst_prec, fp_beat, fp_down)

    # dbn leg: batched decode of all pieces on both paths (shared per-piece
    # XLA boundaries)
    sb_all = np.asarray([
        _gate_boundary(beat_x[i], (1500 // p) // 2, (1500 // p) * 3)
        for i, (p, _, _, _) in enumerate(specs)
    ])
    sd_all = np.asarray([
        _gate_boundary(down_x[i], 2, (1500 // p) * 3)
        for i, (p, _, _, _) in enumerate(specs)
    ])
    dbn_k = post_dbn(beat_k + sb_all[:, None], down_k + sd_all[:, None])
    dbn_x = post_dbn(beat_x + sb_all[:, None], down_x + sd_all[:, None])
    for i in range(len(specs)):
        bx, bk = np.asarray(dbn_x[0][i]), np.asarray(dbn_k[0][i])
        dx, dk = np.asarray(dbn_x[1][i]), np.asarray(dbn_k[1][i])
        f_beat = f_measure(bx, bk) if len(bx) else 1.0
        f_down = f_measure(dx, dk) if len(dx) else 1.0
        worst_dbn = min(worst_dbn, f_beat, f_down)
        out[f"piece{i:02d}_f_dbn"] = round(min(f_beat, f_down), 4)

    out["worst_f"] = worst_min  # kept: the r4 artifact key
    out["worst_f_minimal"] = worst_min
    out["worst_f_dbn"] = worst_dbn
    out["worst_f_bf16_vs_f32"] = worst_prec
    assert worst_min >= 0.999, f"minimal-path agreement {worst_min:.4f}"
    assert worst_dbn >= 0.999, f"dbn-path agreement {worst_dbn:.4f}"
    assert worst_prec >= 0.98, f"bf16-vs-f32 agreement {worst_prec:.4f}"
    return out


def _train_grads(config, params, state, x, key, use_kernels):
    import jax
    import jax.numpy as jnp

    from beat_this_tpu.model import apply_beat_this
    from beat_this_tpu.model import layers

    layers._flash_enabled.cache_clear()
    os.environ.pop("BEAT_THIS_NO_FLASH", None)
    if not use_kernels:
        os.environ["BEAT_THIS_NO_FLASH"] = "1"

    def loss(p):
        out, _ = apply_beat_this(
            p, state, x, config, train=True, rng=key,
            compute_dtype=jnp.bfloat16,
        )
        return jnp.mean(out["beat"] ** 2) + jnp.mean(out["downbeat"] ** 2)

    val, g = jax.jit(jax.value_and_grad(loss))(params)
    val = float(jax.device_get(val))
    g = jax.device_get(g)
    layers._flash_enabled.cache_clear()
    os.environ.pop("BEAT_THIS_NO_FLASH", None)
    return val, g


def check_train_grad_parity_no_dropout():
    import jax
    import jax.numpy as jnp

    from beat_this_tpu.model import BeatThisConfig, init_beat_this

    config = BeatThisConfig(
        n_layers=2, dropout_frontend=0.0, dropout_transformer=0.0
    )
    params, state = init_beat_this(0, config)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1500, 128), jnp.float32)
    key = jax.random.PRNGKey(7)
    v1, g1 = _train_grads(config, params, state, x, key, True)
    v2, g2 = _train_grads(config, params, state, x, key, False)
    rel = abs(v1 - v2) / max(abs(v2), 1e-9)
    assert rel < 2e-2, f"loss mismatch {rel:.3e}"
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    glob = max(float(np.abs(np.asarray(b, np.float64)).max()) for b in flat2)
    worst = max(
        float(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)).max())
        for a, b in zip(flat1, flat2)
    )
    assert worst < 2e-2 * glob, f"grad dev {worst:.3e} vs scale {glob:.3e}"
    return {"loss_rel": rel, "grad_dev": worst, "grad_scale": glob}


def check_train_dropout_finite():
    import jax
    import jax.numpy as jnp

    from beat_this_tpu.model import BeatThisConfig, init_beat_this

    config = BeatThisConfig(n_layers=2)  # default dropout rates
    params, state = init_beat_this(0, config)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1500, 128), jnp.float32)
    v, g = _train_grads(config, params, state, x, jax.random.PRNGKey(3), True)
    assert np.isfinite(v)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    return {"loss": v}


def check_dropout_statistics():
    """The in-kernel PRNG must drop ~rate of the attention mass and scale
    survivors by 1/keep: with v = all-ones, every attention output element is
    (sum of kept probs) / keep, whose mean over many rows converges to 1 with
    a per-element std of roughly sqrt(rate / (keep * n_keys)) for the flat
    softmax this input produces (~0.018 at rate 0.2, n 768)."""
    import jax.numpy as jnp

    from beat_this_tpu.ops.flash_attention import flash_attention

    rng = np.random.RandomState(1)
    n, d, rate = 768, 32, 0.2
    q = jnp.asarray(rng.randn(4, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(4, n, d), jnp.float32)
    v = jnp.ones((4, n, d), jnp.float32)
    outs = [
        np.asarray(
            flash_attention(q, k, v, dropout_rate=rate, seed=seed)
        )
        for seed in (11, 222)
    ]
    assert not np.allclose(outs[0], outs[1]), "seeds produce identical masks"
    for out in outs:
        mean = float(out.mean())
        assert abs(mean - 1.0) < 0.02, f"dropout mean scaling off: {mean}"
        std = float(out.std())
        assert 0.005 < std < 0.1, (
            f"dropout variance {std} outside the expected band "
            "(0 => mask inactive; large => scaling broken)"
        )
    return {"mean": float(outs[0].mean()), "std": float(outs[0].std())}


def _directional_gradcheck(loss_fn, x0):
    """Central-difference directional derivative vs analytic grad, along the
    ANALYTIC GRADIENT direction.

    A random direction does not work here: its directional derivative is a
    near-cancelling sum (~||g||/sqrt(dim)) while the finite-difference error
    scales with the loss magnitude and curvature, so the relative error is
    meaningless (measured O(1) even for bit-correct kernels). Along g/||g||
    the derivative is ||g|| (maximal) and the same error sources land at the
    few-percent level. loss_fn must be deterministic (fixed dropout seed).
    """
    import jax

    g = np.asarray(
        jax.device_get(jax.jit(jax.grad(loss_fn))(x0)), np.float64
    )
    u = (g / np.linalg.norm(g)).astype(np.float32)
    x0np = np.asarray(x0)
    eps = 0.05 * float(np.sqrt(np.mean(x0np * x0np)))
    f = jax.jit(loss_fn)
    lp = float(jax.device_get(f(x0 + eps * u)))
    lm = float(jax.device_get(f(x0 - eps * u)))
    fd = (lp - lm) / (2 * eps)
    an = float(np.sum(g * u))  # == ||g||
    rel = abs(fd - an) / max(abs(an), 1e-9)
    return rel, fd, an


def check_flash_dropout_gradcheck():
    import jax.numpy as jnp

    from beat_this_tpu.ops.flash_attention import flash_attention

    rng = np.random.RandomState(2)
    n, d = 640, 32
    k = jnp.asarray(rng.randn(2, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(2, n, d), jnp.float32)
    cot = jnp.asarray(rng.randn(2, n, d), jnp.float32)
    q0 = jnp.asarray(rng.randn(2, n, d), jnp.float32)

    def loss(q):
        return jnp.vdot(
            flash_attention(q, k, v, dropout_rate=0.2, seed=17), cot
        )

    rel, fd, an = _directional_gradcheck(loss, q0)
    assert rel < 8e-2, f"flash dropout fwd/bwd mask mismatch: rel {rel:.3e}"
    return {"rel": rel, "fd": fd, "analytic": an}


def check_small_attention_dropout_gradcheck():
    import jax.numpy as jnp

    from beat_this_tpu.ops.small_attention import small_attention

    rng = np.random.RandomState(3)
    n, d = 16, 32  # frequency-axis shape: many tiny problems
    k = jnp.asarray(rng.randn(256, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(256, n, d), jnp.float32)
    cot = jnp.asarray(rng.randn(256, n, d), jnp.float32)
    q0 = jnp.asarray(rng.randn(256, n, d), jnp.float32)

    def loss(q):
        return jnp.vdot(
            small_attention(q, k, v, dropout_rate=0.2, seed=23), cot
        )

    rel, fd, an = _directional_gradcheck(loss, q0)
    assert rel < 8e-2, f"small_attention dropout mask mismatch: rel {rel:.3e}"
    return {"rel": rel, "fd": fd, "analytic": an}


def check_fused_ff_dropout_gradcheck():
    import jax.numpy as jnp

    from beat_this_tpu.ops.fused_ff import fused_ff_train

    rng = np.random.RandomState(6)
    c, m = 512, 2048
    gamma = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
    w1 = jnp.asarray(0.05 * rng.randn(c, m), jnp.float32)
    b1 = jnp.asarray(0.05 * rng.randn(m), jnp.float32)
    w2 = jnp.asarray(0.05 * rng.randn(m, c), jnp.float32)
    b2 = jnp.asarray(0.05 * rng.randn(c), jnp.float32)
    x0 = jnp.asarray(rng.randn(640, c), jnp.float32)
    cot = jnp.asarray(rng.randn(640, c), jnp.float32)

    def loss(x):
        out = fused_ff_train(
            x, gamma, w1, b1, w2, b2, dropout_rate=0.2, seed=31
        )
        return jnp.vdot(out, cot)

    rel, fd, an = _directional_gradcheck(loss, x0)
    assert rel < 8e-2, f"fused_ff dropout VJP mismatch: rel {rel:.3e}"
    return {"rel": rel, "fd": fd, "analytic": an}


def check_fused_freq_dropout_gradcheck():
    import jax
    import jax.numpy as jnp

    from beat_this_tpu.model import BeatThisConfig, init_beat_this
    from beat_this_tpu.model.layers import freq_roformer
    from beat_this_tpu.ops.rotary import rope_tables

    config = BeatThisConfig()
    params, _ = init_beat_this(0, config)
    blk = params["blocks"][1]["partial"]  # second stage: F=16, C=64, 2 heads
    attn_p, ff_p = blk["attnF"], blk["ffF"]
    f, c = 16, 64
    rope = rope_tables(f, 32)
    x0 = jnp.asarray(np.random.RandomState(4).randn(512, f, c), jnp.float32)
    cot = jnp.asarray(np.random.RandomState(5).randn(512, f, c), jnp.float32)
    key = jax.random.PRNGKey(29)

    def loss(x):
        out = freq_roformer(
            attn_p, ff_p, x, rope, heads=c // 32,
            dropout_rate=0.1, rng=key,
        )
        return jnp.vdot(out, cot)

    rel, fd, an = _directional_gradcheck(loss, x0)
    assert rel < 8e-2, f"fused_freq dropout VJP mismatch: rel {rel:.3e}"
    return {"rel": rel, "fd": fd, "analytic": an}


def check_fused_time_parity():
    """Isolated Mosaic parity for the fused whole-block time-roformer
    kernel (ops/fused_time.py) at the model's real eval geometries,
    including the multi-group accumulation path (heads=16)."""
    import jax
    import jax.numpy as jnp

    from beat_this_tpu.model.layers import attention_block, feed_forward
    from beat_this_tpu.ops.fused_time import fused_time_roformer
    from beat_this_tpu.ops.rotary import rope_tables

    rng = np.random.RandomState(11)
    worst = {}
    for heads, items in [(1, 4), (4, 2), (16, 2)]:
        c = heads * 32
        n = 1500
        attn = {
            "norm_gamma": jnp.asarray(rng.randn(c) * 0.1 + 1, jnp.float32),
            "qkv_w": jnp.asarray(rng.randn(c, 3 * c) / np.sqrt(c), jnp.float32),
            "gates_w": jnp.asarray(rng.randn(c, heads) / np.sqrt(c), jnp.float32),
            "gates_b": jnp.asarray(rng.randn(heads) * 0.3, jnp.float32),
            "out_w": jnp.asarray(rng.randn(c, c) / np.sqrt(c), jnp.float32),
        }
        ff = {
            "norm_gamma": jnp.asarray(rng.randn(c) * 0.1 + 1, jnp.float32),
            "w1": jnp.asarray(rng.randn(c, 4 * c) / np.sqrt(c), jnp.float32),
            "b1": jnp.asarray(rng.randn(4 * c) * 0.1, jnp.float32),
            "w2": jnp.asarray(rng.randn(4 * c, c) / np.sqrt(4 * c), jnp.float32),
            "b2": jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
        }
        x = jnp.asarray(rng.randn(items, n, c), jnp.bfloat16)
        rope = rope_tables(n, 32)

        def oracle(x):
            y = x + attention_block(attn, x, rope, heads)
            return y + feed_forward(ff, y)

        # force the oracle through plain XLA (no flash / fused kernels)
        from beat_this_tpu.model import layers

        layers._flash_enabled.cache_clear()
        os.environ["BEAT_THIS_NO_FLASH"] = "1"
        try:
            want = np.asarray(jax.device_get(jax.jit(oracle)(x)), np.float32)
        finally:
            os.environ.pop("BEAT_THIS_NO_FLASH", None)
            layers._flash_enabled.cache_clear()
        got = np.asarray(jax.device_get(jax.jit(
            lambda x: fused_time_roformer(x, attn, ff, rope[0], rope[1],
                                          heads))(x)), np.float32)
        rel = float(np.abs(got - want).max() / np.abs(want).max())
        assert rel < 3e-2, f"heads={heads}: rel dev {rel:.3e}"
        worst[f"rel_h{heads}"] = rel
    return worst


_FLAGSHIP = {}


def _flagship_trained(steps: int = 30):
    """`steps` REAL optimizer steps of the flagship geometry (512-dim /
    6-layer / 16-head, the bench batch: 8 microbatches x 8 crops x 1500
    frames, bf16, real shift-tolerant loss) on the TPU with every Pallas
    training VJP active. The batch is a fixed click-structured spectrogram
    corpus (bursts every 25 frames = 120 bpm, downbeat every 4th) and the
    dropout key is held fixed, so the per-step loss (computed BEFORE each
    update) decreases deterministically. Mirrors bench.bench_train_step's
    TrainConfig and shapes exactly so the executable comes warm from the
    persistent XLA cache. Cached per step count: the default-30 weights
    serve as the realistic fixture for the beat-level parity gate (peaks
    deliberately still below the converged 0 threshold); longer runs (the
    eval-protocol bench uses them) push beat peaks over 0 so the REAL
    unmodified postprocessor fires. Returns (config, params, bn_state,
    curve)."""
    if steps in _FLAGSHIP:
        return _FLAGSHIP[steps]
    import jax
    import jax.numpy as jnp

    from beat_this_tpu.model import BeatThisConfig, init_beat_this
    from beat_this_tpu.train.task import (
        TrainConfig,
        dropout_key,
        init_train_state,
        make_train_step,
    )

    config = BeatThisConfig()  # full size
    # max(100, steps) keeps the default-30 fixture's trajectory (and the
    # committed TPUCHECK curves) bit-identical while giving longer runs a
    # cosine schedule that does not collapse to ~0 LR at step 100
    tc = TrainConfig(
        max_steps=max(100, steps), accum_steps=8, compute_dtype="bfloat16"
    )
    params, bn_state = init_beat_this(0, config)
    ts = init_train_state(params, bn_state, tc)
    micro, t = 8, 1500
    rng = np.random.RandomState(5)
    spect = rng.randn(tc.accum_steps, micro, t, 128).astype(np.float32)
    truth_beat = np.zeros((tc.accum_steps, micro, t), np.float32)
    truth_down = np.zeros((tc.accum_steps, micro, t), np.float32)
    phase = rng.randint(0, 25, size=(tc.accum_steps, micro))
    for a in range(tc.accum_steps):
        for m in range(micro):
            beats = np.arange(phase[a, m], t, 25)
            spect[a, m, beats, :] += 6.0
            # downbeats are marked by a LOCAL spectral feature (bass-band
            # emphasis, a kick's signature) rather than being identical to
            # the other bursts — otherwise the downbeat head can only learn
            # p=0.25 on every burst and downstream bar-phase decisions
            # (the DBN leg of the beat-level gate) are coin flips
            spect[a, m, beats[::4], :32] += 4.0
            truth_beat[a, m, beats] = 1.0
            truth_down[a, m, beats[::4]] = 1.0
    batch = {
        "spect": jnp.asarray(spect),
        "truth_beat": jnp.asarray(truth_beat),
        "truth_downbeat": jnp.asarray(truth_down),
        "padding_mask": jnp.ones((tc.accum_steps, micro, t), jnp.float32),
        "downbeat_mask": jnp.ones((tc.accum_steps, micro), jnp.float32),
    }
    step = jax.jit(make_train_step(config, tc))
    key = dropout_key(0)
    curve = []
    for _ in range(steps):
        ts, parts = step(ts, batch, key)
        curve.append(float(jax.device_get(parts["total"])))
    _FLAGSHIP[steps] = (
        config,
        jax.device_get(ts.params),
        jax.device_get(ts.bn_state),
        curve,
    )
    return _FLAGSHIP[steps]


def check_flagship_train_steps():
    """Loss descent of the 30 flagship-geometry optimizer steps — the
    16-head attention backward only ever ran in isolated gradchecks before
    round 4. Asserts every step finite and loss_last < loss_first, and
    records the whole curve. Reference behavior: train.py:118-132
    convergence."""
    _, _, _, curve = _flagship_trained()
    assert all(np.isfinite(curve)), f"non-finite loss in {curve}"
    assert curve[-1] < curve[0], f"loss did not decrease: {curve}"
    return {
        "steps": len(curve),
        "loss_first": curve[0],
        "loss_last": curve[-1],
        "curve": [round(v, 5) for v in curve],
    }


def check_fused_time_dropout_gradcheck():
    """Directional gradcheck of the fused time-attention TRAINING kernel
    (ops/fused_time.fused_time_attention_train) with in-kernel dropout
    active, at EVERY head count the model routes to it — frontend 1/2/4
    and, since the round-4 (items, head_groups) re-grid lifted the scoped-
    VMEM cap, the main transformer's heads=16. The seed must regenerate
    identical masks across the primal, VJP-forward, and backward kernels."""
    import jax.numpy as jnp

    from beat_this_tpu.ops.fused_time import fused_time_attention_train
    from beat_this_tpu.ops.rotary import rope_tables

    out = {}
    for heads, items in [(1, 4), (2, 4), (4, 4), (16, 1)]:
        c = heads * 32
        n = 1500
        rng = np.random.RandomState(40 + heads)
        attn = {
            "norm_gamma": jnp.asarray(rng.rand(c) + 0.5, jnp.float32),
            "qkv_w": jnp.asarray(rng.randn(c, 3 * c) / np.sqrt(c), jnp.float32),
            "gates_w": jnp.asarray(rng.randn(c, heads) / np.sqrt(c), jnp.float32),
            "gates_b": jnp.asarray(rng.randn(heads) * 0.3, jnp.float32),
            "out_w": jnp.asarray(rng.randn(c, c) / np.sqrt(c), jnp.float32),
        }
        rope = rope_tables(n, 32)
        x0 = jnp.asarray(rng.randn(items, n, c), jnp.float32)
        cot = jnp.asarray(rng.randn(items, n, c), jnp.float32)

        def loss(x):
            out = fused_time_attention_train(
                x, attn, rope[0], rope[1], heads, dropout_rate=0.1, seed=23
            )
            return jnp.vdot(out, cot)

        rel, fd, an = _directional_gradcheck(loss, x0)
        assert rel < 8e-2, f"fused_time h={heads} dropout VJP: rel {rel:.3e}"
        out[f"rel_h{heads}"] = rel
    return out


CHECKS = [
    ("fused_time_parity", check_fused_time_parity),
    ("fused_time_dropout_gradcheck", check_fused_time_dropout_gradcheck),
    ("eval_logit_parity", check_eval_logit_parity),
    ("flagship_train_steps", check_flagship_train_steps),
    ("beat_level_kernel_parity", check_beat_level_kernel_parity),
    ("train_grad_parity_no_dropout", check_train_grad_parity_no_dropout),
    ("train_dropout_finite", check_train_dropout_finite),
    ("dropout_statistics", check_dropout_statistics),
    ("flash_dropout_gradcheck", check_flash_dropout_gradcheck),
    ("small_attention_dropout_gradcheck", check_small_attention_dropout_gradcheck),
    ("fused_ff_dropout_gradcheck", check_fused_ff_dropout_gradcheck),
    ("fused_freq_dropout_gradcheck", check_fused_freq_dropout_gradcheck),
]


def main(args):
    import jax

    from beat_this_tpu.profiler import maybe_enable_compilation_cache

    maybe_enable_compilation_cache(
        default_dir=os.path.expanduser("~/.cache/beat_this_tpu/xla-cache")
    )
    platform = jax.devices()[0].platform
    report = {"platform": platform, "checks": {}}
    if platform == "cpu":
        print("WARNING: running on CPU — Mosaic paths unavailable; "
              "this gate is only meaningful on TPU")
    checks = CHECKS
    if args.only:
        wanted = set(args.only)
        unknown = wanted - {n for n, _ in CHECKS}
        if unknown:
            raise SystemExit(f"unknown check(s): {sorted(unknown)}")
        checks = [(n, f) for n, f in CHECKS if n in wanted]
    ok = True
    for name, fn in checks:
        t0 = time.time()
        try:
            details = fn()
            status = {"ok": True, **{k: round(v, 6) if isinstance(v, float)
                                     else v for k, v in details.items()}}
        except Exception as exc:  # noqa: BLE001
            ok = False
            status = {"ok": False, "error": f"{type(exc).__name__}: {exc}",
                      "trace": traceback.format_exc(limit=3)}
        status["elapsed_s"] = round(time.time() - t0, 1)
        report["checks"][name] = status
        print(f"{name}: {'OK' if status['ok'] else 'FAIL'} "
              f"({status['elapsed_s']}s)"
              + ("" if status["ok"] else f" — {status['error']}"))
    report["ok"] = ok
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    print(("ALL OK" if ok else "FAILURES") + f" -> {args.out}")
    return 0 if ok else 1


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--out", default="TPUCHECK.json")
    parser.add_argument(
        "--only", nargs="*", default=None, metavar="CHECK",
        help="run only the named checks (default: all); useful when "
        "iterating on one kernel — the committed round artifact must "
        "still come from a full run",
    )
    sys.exit(main(parser.parse_args()))
