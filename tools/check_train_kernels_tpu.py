#!/usr/bin/env python3
"""TPU-only check: training-mode forward/backward with the Pallas kernels
(flash attention, packed small attention incl. in-kernel dropout) against the
pure-XLA path. Dropout 0 must match closely; dropout > 0 must be finite.

Run on the real TPU: python tools/check_train_kernels_tpu.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def grads(config, params, state, x, rng, use_kernels):
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
            p, state, x, config, train=True, rng=rng,
            compute_dtype=jnp.bfloat16,
        )
        return jnp.mean(out["beat"] ** 2) + jnp.mean(out["downbeat"] ** 2)

    val, g = jax.jit(jax.value_and_grad(loss))(params)
    val = float(jax.device_get(val))
    g = jax.device_get(g)
    layers._flash_enabled.cache_clear()
    os.environ.pop("BEAT_THIS_NO_FLASH", None)
    return val, g


def main():
    import jax
    import jax.numpy as jnp

    from beat_this_tpu.model import BeatThisConfig, init_beat_this

    print("backend:", jax.devices()[0].platform)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 1500, 128), jnp.float32)
    key = jax.random.PRNGKey(7)

    # 1) deterministic comparison: dropout 0 in train mode
    config = BeatThisConfig(
        n_layers=2, dropout_frontend=0.0, dropout_transformer=0.0
    )
    params, state = init_beat_this(0, config)
    v1, g1 = grads(config, params, state, x, key, use_kernels=True)
    v2, g2 = grads(config, params, state, x, key, use_kernels=False)
    rel = abs(v1 - v2) / max(abs(v2), 1e-9)
    print(f"loss kernels={v1:.6f} xla={v2:.6f} rel={rel:.2e}")
    assert rel < 2e-2, "loss mismatch"
    flat1, _ = jax.tree_util.tree_flatten(g1)
    flat2, _ = jax.tree_util.tree_flatten(g2)
    # Per-leaf max-relative error is meaningless for near-cancelled sums
    # (e.g. FF bias grads sum ~1e6 cotangents to ~1e-4), so normalize by the
    # global gradient scale: any kernel bug shows up as an O(1) fraction of
    # it, bf16 rounding as <1e-2.
    glob = max(
        float(np.abs(np.asarray(b, np.float64)).max()) for b in flat2
    )
    worst = max(
        float(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)).max())
        for a, b in zip(flat1, flat2)
    )
    print(f"worst abs grad deviation {worst:.3e} vs global |g|max {glob:.3e}")
    assert worst < 2e-2 * glob, "grad mismatch beyond bf16 tolerance"

    # 2) stochastic path: default dropout rates, kernels on — finite grads
    config = BeatThisConfig(n_layers=2)
    params, state = init_beat_this(0, config)
    v3, g3 = grads(config, params, state, x, key, use_kernels=True)
    assert np.isfinite(v3)
    for leaf in jax.tree_util.tree_leaves(g3):
        assert np.isfinite(np.asarray(leaf)).all()
    print(f"dropout path: loss={v3:.6f}, all grads finite")
    print("OK")


if __name__ == "__main__":
    main()
