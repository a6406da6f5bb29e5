#!/usr/bin/env python3
"""The TPU kernel gate: every Mosaic-only parity check in one run, with a
pass/fail JSON artifact.

The CPU test suite runs the Pallas kernels in interpret mode, but the
`pltpu.prng_*` in-kernel dropout paths and the fwd/bwd mask-geometry
contract (ops/flash_attention.py `_train_block_cap`, ops/fused_freq.py
`_dropmask`) have no interpret rule — a regression there ships silently with
green CI. This tool runs on the real TPU and records an artifact
(TPUCHECK_r*.json) per round:

  1. eval-kernel logit parity vs pure XLA (full-size model)
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
        res = np.asarray(jax.device_get(out["beat"]))
        layers._flash_enabled.cache_clear()
        os.environ.pop("BEAT_THIS_NO_FLASH", None)
        return res

    a, b = logits(True), logits(False)
    rel = float(np.abs(a - b).max() / np.abs(b).max())
    assert rel < 3e-2, f"eval logit deviation {rel:.3e}"
    return {"rel_dev": rel}


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
