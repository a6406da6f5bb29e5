"""Native C++ resampler kernel vs the numpy reference path."""

import math
import subprocess
from pathlib import Path

import numpy as np
import pytest

from beat_this_tpu.ops import resample as rs

NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    if not (NATIVE_DIR / "libbtnative.so").exists():
        subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True)
    # reset the cached handle in case an earlier test found no library
    rs._native_lib = None
    yield
    rs._native_lib = None


@pytest.mark.parametrize("rates", [(44100, 22050), (48000, 22050), (22050, 44100)])
def test_native_matches_numpy(rates):
    in_rate, out_rate = rates
    rng = np.random.RandomState(0)
    x = rng.randn(in_rate // 2).astype(np.float64)  # 0.5 s
    g = math.gcd(in_rate, out_rate)
    L, M = out_rate // g, in_rate // g
    h = rs._design_filter(L, M)
    expected = rs._resample_poly_numpy(x, h, L, M)

    lib = rs._load_native()
    assert lib, "native library must be available after build"
    got = rs.resample(x, in_rate, out_rate)
    assert len(got) == len(expected)
    np.testing.assert_allclose(got, expected, atol=1e-12)


def test_resample_uses_native_when_built():
    assert rs._load_native(), "libbtnative.so should load"
    y = rs.resample(np.random.RandomState(1).randn(44100), 44100, 22050)
    assert len(y) == 22050
