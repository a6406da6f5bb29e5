#!/usr/bin/env python3
"""TPU-only check: eval-mode logits with the Pallas kernels (flash attention,
packed small attention, fused FF) against the pure-XLA path, full-size model.

Run on the real TPU: python tools/check_eval_kernels_tpu.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def logits(config, params, state, x, use_kernels):
    import jax
    import jax.numpy as jnp

    from beat_this_tpu.model import apply_beat_this
    from beat_this_tpu.model import layers

    layers._flash_enabled.cache_clear()
    os.environ.pop("BEAT_THIS_NO_FLASH", None)
    if not use_kernels:
        os.environ["BEAT_THIS_NO_FLASH"] = "1"

    @jax.jit
    def fwd(p, s, x):
        out, _ = apply_beat_this(p, s, x, config, compute_dtype=jnp.bfloat16)
        return out["beat"], out["downbeat"]

    beat, downbeat = jax.device_get(fwd(params, state, x))
    layers._flash_enabled.cache_clear()
    os.environ.pop("BEAT_THIS_NO_FLASH", None)
    return np.asarray(beat), np.asarray(downbeat)


def main():
    import jax
    import jax.numpy as jnp

    from beat_this_tpu.model import BeatThisConfig, init_beat_this

    print("backend:", jax.devices()[0].platform)
    config = BeatThisConfig()  # full-size
    params, state = init_beat_this(0, config)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 1500, 128), jnp.float32)
    b1, d1 = logits(config, params, state, x, use_kernels=True)
    b2, d2 = logits(config, params, state, x, use_kernels=False)
    for name, a, b in [("beat", b1, b2), ("downbeat", d1, d2)]:
        scale = np.abs(b).max()
        dev = np.abs(a - b).max()
        print(f"{name}: |ref|max={scale:.3f} max|diff|={dev:.4f} "
              f"rel={dev/scale:.3e}")
        assert dev / scale < 3e-2, f"{name} deviates beyond bf16 tolerance"
    print("OK")


if __name__ == "__main__":
    main()
