"""Resampler quality tests (vs scipy.signal.resample_poly oracle) and
phase-vocoder pitch/tempo checks."""

import numpy as np
import pytest

scipy_signal = pytest.importorskip("scipy.signal")

from beat_this_tpu.ops.resample import resample
from beat_this_tpu.ops.stretch import pitch_shift, time_stretch


def sine(freq, sr, seconds=1.0, amp=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return amp * np.sin(2 * np.pi * freq * t)


def dominant_freq(x, sr):
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return np.fft.rfftfreq(len(x), 1 / sr)[np.argmax(spec)]


def test_output_length_matches_soxr_convention():
    x = np.zeros(44100)
    assert len(resample(x, 44100, 22050)) == 22050
    assert len(resample(np.zeros(44101), 44100, 22050)) == 22051  # ceil
    assert len(resample(np.zeros(48000), 48000, 22050)) == 22050


def test_tone_preserved_441_to_22k():
    x = sine(1000, 44100, 2.0)
    y = resample(x, 44100, 22050)
    assert abs(dominant_freq(y[2205:-2205], 22050) - 1000) < 2
    # amplitude preserved
    assert abs(np.abs(y[2205:-2205]).max() - 0.5) < 0.01


def test_aliasing_suppressed():
    # 15 kHz tone is above the 11.025 kHz target Nyquist: must vanish
    x = sine(15000, 44100, 1.0)
    y = resample(x, 44100, 22050)
    assert np.abs(y[2205:-2205]).max() < 1e-4


def test_irrational_ratio_matches_scipy_oracle():
    x = sine(440, 48000, 1.0) + 0.2 * sine(3000, 48000, 1.0)
    ours = resample(x, 48000, 22050)
    # scipy with the same filter design idea (kaiser window)
    theirs = scipy_signal.resample_poly(x, 147, 320, window=("kaiser", 14.77))
    n = min(len(ours), len(theirs))
    # ignore edges, compare interior
    sl = slice(1000, n - 1000)
    err = np.max(np.abs(ours[sl] - theirs[sl]))
    assert err < 5e-3


def test_time_stretch_changes_length_not_pitch():
    x = sine(440, 22050, 2.0)
    y = time_stretch(x, 1.25)  # 25% faster
    assert abs(len(y) - len(x) / 1.25) <= 2
    assert abs(dominant_freq(y[2000:-2000], 22050) - 440) < 3


def test_pitch_shift_changes_pitch_not_length():
    x = sine(440, 22050, 2.0)
    y = pitch_shift(x, 22050, 12)  # one octave up
    assert len(y) == len(x)
    assert abs(dominant_freq(y[2000:-2000], 22050) - 880) < 8
    y2 = pitch_shift(x, 22050, -12)
    assert abs(dominant_freq(y2[2000:-2000], 22050) - 220) < 4
