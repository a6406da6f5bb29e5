"""Hand-derived golden values for the beat metrics.

`tests/test_metrics.py` checks invariants and edge cases; these tests pin the
metrics to exact values computed BY HAND from the published definitions that
mir_eval implements (Davies, Degara & Plumbley, TR-09-06; mir_eval.beat —
used by the reference at beat_this/model/pl_module.py:320-339):

  * F-measure: maximum bipartite matching with |ref - est| <= 0.07 s.
  * Cemgil: sum over reference beats of exp(-d^2 / (2 * 0.04^2)) for the
    nearest estimate, over the mean of the two counts; the "max" variant
    takes the best across the five metrical variations (original, off-beat,
    double, half-odd, half-even).
  * Continuity (CMLc/CMLt/AMLc/AMLt): an estimate succeeds if its distance
    to its (unused) nearest annotation is < 0.175 of the local annotation
    interval AND its own inter-beat interval is within 0.175 of that
    annotation interval; CMLc = longest success run / max(#ann, #est),
    CMLt = total successes / max(#ann, #est); AML* maximize over the five
    variations.

Every expected number below is derived in the accompanying comment, not by
running any implementation.
"""

import numpy as np
import pytest

from beat_this_tpu.metrics import (
    Metrics,
    cemgil,
    continuity,
    f_measure,
    trim_beats,
)

REF = np.array([5.0, 6.0, 7.0, 8.0, 9.0, 10.0])


def test_trim_beats_golden():
    beats = np.array([0.0, 4.999, 5.0, 6.3])
    np.testing.assert_array_equal(trim_beats(beats), [5.0, 6.3])


# ---------------------------------------------------------------------------
# F-measure
# ---------------------------------------------------------------------------


def test_f_measure_perfect_within_window():
    # 8.05 is 0.05 from 8.0, inside the 0.07 window -> 6/6 matched, F = 1
    est = np.array([5.0, 6.0, 7.0, 8.05, 9.0, 10.0])
    assert f_measure(REF, est) == 1.0


def test_f_measure_one_estimate_two_candidates():
    # est 5.06 can match either 5.0 (d=0.06) or 5.1 (d=0.04); a matching can
    # use it once: P = 1/1, R = 1/2, F = 2*(1*0.5)/1.5 = 2/3
    assert f_measure(np.array([5.0, 5.1]), np.array([5.06])) == pytest.approx(
        2.0 / 3.0
    )


def test_f_measure_requires_maximum_not_greedy_matching():
    # 5.05 is nearest to BOTH refs (d=0.05 each); 5.16 only reaches 5.1
    # (d=0.06). A greedy nearest-first pairing could match 5.05 -> 5.1 and
    # strand 5.16; the maximum matching pairs 5.05 -> 5.0, 5.16 -> 5.1 -> F=1
    assert f_measure(np.array([5.0, 5.1]), np.array([5.05, 5.16])) == 1.0


def test_f_measure_window_is_inclusive():
    # |d| == 0.07 exactly still matches (<= threshold)
    assert f_measure(np.array([5.0]), np.array([5.07])) == 1.0
    assert f_measure(np.array([5.0]), np.array([5.0700001])) == 0.0


def test_f_measure_empty_is_zero():
    assert f_measure(np.array([]), np.array([5.0])) == 0.0
    assert f_measure(np.array([5.0]), np.array([])) == 0.0


# ---------------------------------------------------------------------------
# Cemgil
# ---------------------------------------------------------------------------


def test_cemgil_golden_value():
    # five exact hits contribute exp(0) = 1 each; the 0.05 s miss contributes
    # exp(-0.05^2 / (2 * 0.04^2)) = exp(-0.78125); normalizer = (6 + 6)/2 = 6
    est = np.array([5.0, 6.0, 7.0, 8.05, 9.0, 10.0])
    expected = (5.0 + np.exp(-0.78125)) / 6.0
    score, score_max = cemgil(REF, est)
    assert score == pytest.approx(expected, abs=1e-12)
    # every other variation scores worse here, so the max is the original
    assert score_max == pytest.approx(expected, abs=1e-12)


def test_cemgil_max_rewards_double_tempo():
    # estimates at double tempo: the original variation scores
    # 6 exact hits / ((11 + 6)/2) = 12/17; the double-tempo variation
    # [5, 5.5, ..., 10] matches all 11 estimates exactly -> 11/11 = 1
    est = np.arange(5.0, 10.01, 0.5)
    score, score_max = cemgil(REF, est)
    assert score == pytest.approx(12.0 / 17.0, abs=1e-12)
    assert score_max == 1.0


def test_cemgil_empty_is_zero():
    assert cemgil(np.array([]), np.array([5.0])) == (0.0, 0.0)
    assert cemgil(np.array([5.0]), np.array([])) == (0.0, 0.0)


# ---------------------------------------------------------------------------
# continuity
# ---------------------------------------------------------------------------


def test_continuity_exact_is_one():
    assert continuity(REF, REF.copy()) == (1.0, 1.0, 1.0, 1.0)


def test_continuity_offbeat_golden():
    # half-beat-shifted estimates: against the original annotations every
    # phase error is 0.5 -> CML = 0. Against the off-beat variation
    # [5.5, 6.5, 7.5, 8.5, 9.5], estimates 5.5..9.5 match exactly and 10.5
    # has no annotation left (nearest 9.5 is 1.0 s away, phase 1.0) ->
    # 5 successes in a row, n_annotations = max(5, 6) = 6 -> AML = 5/6
    est = REF + 0.5
    cmlc, cmlt, amlc, amlt = continuity(REF, est)
    assert cmlc == 0.0 and cmlt == 0.0
    assert amlc == pytest.approx(5.0 / 6.0)
    assert amlt == pytest.approx(5.0 / 6.0)


def test_continuity_double_tempo_golden():
    # estimates at double tempo: against the original annotations every
    # inter-beat interval is half the annotation interval (period error 0.5)
    # -> CML = 0. The double variation matches all 11 estimates exactly ->
    # AML = 11/11 = 1
    est = np.arange(5.0, 10.01, 0.5)
    cmlc, cmlt, amlc, amlt = continuity(REF, est)
    assert cmlc == 0.0 and cmlt == 0.0
    assert amlc == 1.0 and amlt == 1.0


def test_continuity_broken_streak_golden():
    # est = [5, 6, 7.3, 8, 9, 10] against REF, derived by hand:
    #   m=0 (5.0): exact, intervals 1 vs 1           -> success
    #   m=1 (6.0): exact, intervals 1 vs 1           -> success
    #   m=2 (7.3): phase 0.3/1 >= 0.175              -> failure
    #   m=3 (8.0): phase 0, but est interval 0.7 -> period 0.3 -> failure
    #   m=4 (9.0): exact, intervals 1 vs 1           -> success
    #   m=5 (10.0): exact                            -> success
    # runs [2, 2]: CMLc = 2/6, CMLt = 4/6; every metrical variation of REF
    # scores 0 here (each fails phase or period), so AML equals CML.
    est = np.array([5.0, 6.0, 7.3, 8.0, 9.0, 10.0])
    cmlc, cmlt, amlc, amlt = continuity(REF, est)
    assert cmlc == pytest.approx(2.0 / 6.0)
    assert cmlt == pytest.approx(4.0 / 6.0)
    assert amlc == pytest.approx(2.0 / 6.0)
    assert amlt == pytest.approx(4.0 / 6.0)


def test_continuity_first_estimate_uses_forward_intervals():
    # the first estimate is judged on FORWARD intervals: est[1]-est[0] = 0.1
    # against annotation interval 1 -> period error 0.9 -> failure, and its
    # annotation stays unused; the second estimate (5.1) then claims it with
    # phase 0.1 and period |1 - 0.9| = 0.1 -> success, as do the rest.
    # successes [0, 1, 1, 1, 1, 1, 1], n_annotations = max(6, 7) = 7
    est = np.array([5.0, 5.1, 6.0, 7.0, 8.0, 9.0, 10.0])
    cmlc, cmlt, _, _ = continuity(REF, est)
    assert cmlc == pytest.approx(6.0 / 7.0)
    assert cmlt == pytest.approx(6.0 / 7.0)


def test_continuity_annotation_reuse_is_a_failure():
    # two estimates near the same annotation: the later one finds its
    # nearest annotation already used -> failure even though it is close.
    # est = [5.0, 6.0, 6.1, 7.0, 8.0, 9.0, 10.0] (7 estimates):
    #   m=0 (5.0): exact, forward intervals 1 vs 1     -> success (uses 5.0)
    #   m=1 (6.0): exact, intervals 1 vs 1             -> success (uses 6.0)
    #   m=2 (6.1): nearest 6.0 already used            -> failure
    #   m=3 (7.0): phase 0, est interval 0.9 -> period 0.1 -> success
    #   m=4..6: exact, intervals 1 vs 1                -> success
    # runs [2, 4], n_annotations = max(6, 7) = 7 -> CMLc = 4/7, CMLt = 6/7
    est = np.array([5.0, 6.0, 6.1, 7.0, 8.0, 9.0, 10.0])
    cmlc, cmlt, _, _ = continuity(REF, est)
    assert cmlc == pytest.approx(4.0 / 7.0)
    assert cmlt == pytest.approx(6.0 / 7.0)


def test_continuity_empty_or_single_is_zero():
    assert continuity(REF, np.array([])) == (0.0, 0.0, 0.0, 0.0)
    assert continuity(np.array([]), REF) == (0.0, 0.0, 0.0, 0.0)
    assert continuity(REF, np.array([6.0])) == (0.0, 0.0, 0.0, 0.0)


# ---------------------------------------------------------------------------
# Metrics wrapper (trim + reference's metric selection)
# ---------------------------------------------------------------------------


def test_metrics_val_applies_trim_and_averages_cemgil():
    metrics = Metrics(eval_trim_beats=5.0)
    truth = np.concatenate([[1.0, 3.0], REF])  # early beats must be trimmed
    est = np.concatenate([[2.0], REF])
    out = metrics(truth, est, "val")
    assert out["F-measure"] == 1.0
    # cemgil == cemgil_max == 1 after trimming -> mean is 1
    assert out["Cemgil"] == 1.0


def test_metrics_test_reports_continuity_totals():
    metrics = Metrics(eval_trim_beats=5.0)
    est = np.array([5.0, 6.0, 7.3, 8.0, 9.0, 10.0])
    out = metrics(REF, est, "test")
    assert out["CMLt"] == pytest.approx(4.0 / 6.0)
    assert out["AMLt"] == pytest.approx(4.0 / 6.0)
    assert set(out) == {"F-measure", "Cemgil", "CMLt", "AMLt"}
