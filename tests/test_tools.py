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
