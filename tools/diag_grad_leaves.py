#!/usr/bin/env python3
"""Per-leaf gradient deviation: Pallas kernels vs XLA, on the real TPU."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_train_kernels_tpu import grads  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from beat_this_tpu.model import BeatThisConfig, init_beat_this

    print("backend:", jax.devices()[0].platform)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 1500, 128), jnp.float32)
    key = jax.random.PRNGKey(7)
    config = BeatThisConfig(
        n_layers=2, dropout_frontend=0.0, dropout_transformer=0.0
    )
    params, state = init_beat_this(0, config)
    v1, g1 = grads(config, params, state, x, key, use_kernels=True)
    v2, g2 = grads(config, params, state, x, key, use_kernels=False)
    print(f"loss kernels={v1:.6f} xla={v2:.6f}")
    flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(g2)[0]
    rows = []
    for (path, a), (_, b) in zip(flat1, flat2):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.abs(b).max() + 1e-6
        rel = float(np.abs(a - b).max() / denom)
        rows.append((rel, jax.tree_util.keystr(path), float(np.abs(b).max())))
    rows.sort(reverse=True)
    for rel, name, mag in rows[:25]:
        print(f"{rel:9.3e}  |g|max={mag:9.3e}  {name}")


if __name__ == "__main__":
    main()
