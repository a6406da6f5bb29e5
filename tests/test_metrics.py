"""Invariant tests for the dependency-free beat metrics."""

import numpy as np

from beat_this_tpu.metrics import (
    Metrics,
    cemgil,
    continuity,
    f_measure,
    trim_beats,
)


def beats(start, interval, n):
    return start + interval * np.arange(n)


def test_trim_beats():
    np.testing.assert_array_equal(
        trim_beats(np.array([1.0, 4.9, 5.0, 7.0])), [5.0, 7.0]
    )


def test_f_measure_perfect_and_empty():
    ref = beats(5, 0.5, 40)
    assert f_measure(ref, ref.copy()) == 1.0
    assert f_measure(ref, np.array([])) == 0.0
    assert f_measure(np.array([]), ref) == 0.0


def test_f_measure_tolerance_window():
    ref = beats(5, 0.5, 40)
    assert f_measure(ref, ref + 0.069) == 1.0
    assert f_measure(ref, ref + 0.0701) == 0.0


def test_f_measure_partial():
    ref = beats(0, 1.0, 10)
    est = ref[:5]  # half the beats
    f = f_measure(ref, est)
    # precision 1, recall 0.5 -> F = 2/3
    np.testing.assert_allclose(f, 2 / 3)


def test_f_measure_counts_matching_not_greedy():
    # one estimate cannot match two references
    ref = np.array([1.0, 1.05])
    est = np.array([1.02])
    f = f_measure(ref, est)
    # precision 1, recall 0.5
    np.testing.assert_allclose(f, 2 / 3)


def test_cemgil_perfect_and_offset():
    ref = beats(5, 0.5, 40)
    score, cmax = cemgil(ref, ref.copy())
    np.testing.assert_allclose(score, 1.0)
    assert cmax == 1.0
    score_shifted, _ = cemgil(ref, ref + 0.04)
    np.testing.assert_allclose(score_shifted, np.exp(-0.5), rtol=1e-6)


def test_cemgil_max_double_tempo():
    ref = beats(5, 1.0, 20)
    est = beats(5, 0.5, 39)  # double tempo estimate
    score, cmax = cemgil(ref, est)
    assert cmax > score  # double-tempo variation matches better
    assert cmax > 0.9


def test_continuity_perfect():
    ref = beats(5, 0.5, 40)
    cmlc, cmlt, amlc, amlt = continuity(ref, ref.copy())
    assert cmlc == cmlt == amlc == amlt == 1.0


def test_continuity_half_tempo_in_aml_only():
    ref = beats(5, 0.5, 40)
    est = ref[::2]  # half tempo, on-beat
    cmlc, cmlt, amlc, amlt = continuity(ref, est)
    assert cmlt < 0.6
    # the half-tempo variation matches the estimate exactly and is normalized
    # by its own annotation count (mir_eval convention) -> perfect AML
    np.testing.assert_allclose(amlt, 1.0)


def test_continuity_break_in_middle():
    ref = beats(5, 0.5, 41)
    est = ref.copy()
    est[20] += 0.2  # break continuity at one point
    cmlc, cmlt, amlc, amlt = continuity(ref, est)
    assert cmlt > 0.9  # total barely affected
    np.testing.assert_allclose(cmlc, 20 / 41, atol=0.01)  # longest streak halved


def test_continuity_offbeat_aml():
    ref = beats(5, 0.5, 40)
    est = ref + 0.25  # exactly off-beat
    cmlc, cmlt, amlc, amlt = continuity(ref, est)
    assert cmlt < 0.1
    assert amlt > 0.9  # off-beat variation catches it


def test_metrics_class_val_and_test():
    ref = beats(6, 0.5, 30)
    m = Metrics(eval_trim_beats=5)
    val = m(ref, ref.copy(), step="val")
    assert set(val) == {"F-measure", "Cemgil"}
    test = m(ref, ref.copy(), step="test")
    assert set(test) == {"F-measure", "Cemgil", "CMLt", "AMLt"}
    assert test["F-measure"] == 1.0
    assert test["CMLt"] == 1.0
