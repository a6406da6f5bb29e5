"""Tests for auxiliary tools: the activation parity comparator and the
profiler/throughput helpers."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "launch_scripts"))


def test_compare_activations(tmp_path, capsys):
    import compare_activations as ca

    ref = tmp_path / "ref"
    test = tmp_path / "test"
    ref.mkdir(), test.mkdir()
    a = np.random.RandomState(0).randn(2, 100)
    np.save(ref / "song.npy", a)
    np.save(test / "song.npy", a + 1e-4)
    assert ca.compare(ref, test, tolerance=1e-2) == 0
    assert "all activations within tolerance" in capsys.readouterr().out
    # out of tolerance
    np.save(test / "song.npy", a + 0.5)
    assert ca.compare(ref, test, tolerance=1e-2) == 1
    # missing file
    (test / "song.npy").unlink()
    assert ca.compare(ref, test, tolerance=1e-2) == 1
    # empty reference dir
    assert ca.compare(tmp_path / "nope", test, tolerance=1e-2) == 2


def test_throughput_counter():
    from beat_this_tpu.profiler import Throughput

    t = Throughput()
    t.add(30.0)
    t.add(30.0)
    assert t.audio_seconds == 60.0
    assert t.x_realtime > 0
    assert "60.0 s audio" in t.summary()


def test_maybe_trace_noop(monkeypatch):
    from beat_this_tpu.profiler import maybe_trace

    monkeypatch.delenv("BEAT_THIS_TRACE_DIR", raising=False)
    with maybe_trace():  # no-op without the env var
        pass


def test_bench_model_flops_matches_xla_cost_analysis(monkeypatch):
    """bench.model_flops (the MFU denominator) counts matmul/conv FLOPs
    analytically; XLA's own cost analysis of the pure-XLA eval forward
    must bracket it from above (it additionally counts elementwise/norm
    work) but by no more than ~50%."""
    import jax
    import jax.numpy as jnp
    import pytest

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench
    from beat_this_tpu.model import (
        BeatThisConfig,
        apply_beat_this,
        init_beat_this,
    )

    monkeypatch.setenv("BEAT_THIS_NO_FLASH", "1")
    from beat_this_tpu.model import layers

    layers._flash_enabled.cache_clear()
    try:
        config = BeatThisConfig(transformer_dim=128, n_layers=2)
        params, state = init_beat_this(0, config)
        t = 512
        x = jnp.zeros((1, t, 128), jnp.float32)
        lowered = jax.jit(
            lambda p, s, x: apply_beat_this(p, s, x, config)[0]["beat"]
        ).lower(params, state, x)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        if not analysis or "flops" not in analysis:
            pytest.skip("backend provides no cost analysis")
        xla = float(analysis["flops"])
        ours = float(bench.model_flops(config, t))
        assert ours <= xla <= 1.5 * ours, (ours, xla)
        # the attention subset used for the adjusted-roofline report must be
        # a strict part of the total
        assert 0 < float(bench.model_attn_flops(config, t)) < ours
    finally:
        layers._flash_enabled.cache_clear()
